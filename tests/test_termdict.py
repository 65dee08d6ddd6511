"""TermDictionary: lazy row-group-pruned mode ≡ eager in-RAM mode."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomaly_detection_ray.index.termdict import TermDictionary


@pytest.fixture(scope="module")
def dict_file(tmp_path_factory):
    rng = np.random.default_rng(5)
    vocab = sorted({
        "".join(rng.choice(list("abcdef"), size=rng.integers(3, 9)))
        for _ in range(6000)
    })
    path = str(tmp_path_factory.mktemp("dict") / "stats.parquet")
    pq.write_table(
        pa.table({
            "term": pa.array(vocab),
            "df": pa.array(np.arange(1, len(vocab) + 1, dtype=np.int64)),
            "cttf": pa.array(np.arange(1, len(vocab) + 1, dtype=np.int64) * 2),
        }),
        path, row_group_size=256,   # many groups → real pruning
    )
    return path, vocab


def test_lazy_matches_eager(dict_file):
    path, vocab = dict_file
    eager = TermDictionary(path)                       # fits the budget
    lazy = TermDictionary(path, budget_bytes=0)        # forced lazy
    assert eager.eager and not lazy.eager
    assert len(eager) == len(lazy) == len(vocab)
    # point lookups: every 37th term + misses that fall between terms
    for t in vocab[::37]:
        assert lazy.df(t) == eager.df(t) == vocab.index(t) + 1
    for miss in ("", "zzz", vocab[10] + "q", "aaa"):
        assert lazy.df(miss) == eager.df(miss)
    # prefix ranges: every 1- and 2-char prefix
    prefixes = [c for c in "abcdefg"] + [a + b for a in "abc" for b in "def"]
    for p in prefixes:
        want = [t for t in vocab if t.startswith(p)]
        got_e = [t for sl in eager.iter_slices(p) for t in sl.to_pylist()]
        got_l = [t for sl in lazy.iter_slices(p) for t in sl.to_pylist()]
        assert got_e == want, p
        assert got_l == want, p
    # full scan (empty prefix) streams the whole vocabulary in order
    assert [t for sl in lazy.iter_slices("") for t in sl.to_pylist()] == vocab
    # the LRU held at most cache_groups groups
    assert len(lazy._cache) <= lazy._cache_groups


def test_lazy_cache_bounded(dict_file):
    path, vocab = dict_file
    lazy = TermDictionary(path, budget_bytes=0, cache_groups=2)
    for t in vocab[::101]:
        lazy.df(t)
    list(lazy.iter_slices(""))
    assert len(lazy._cache) <= 2


def test_truncated_stats_bounds_never_miss(dict_file):
    """Parquet statistics truncation can round a group's max UP (and a
    min DOWN), leaving the boundary arrays locally out of order — the
    prune bisect must still never skip an intersecting group. Simulate
    the truncation the writer could apply and check every lookup/scan
    still matches eager (over-read only, no misses)."""
    from anomaly_detection_ray.index.termdict import _monotone_bounds

    # unit: cummax restores monotonicity, bounds only widen
    mins = ["aa", "a", "ca", "bz"]          # locally out of order
    maxs = ["cz", "bb", "dd", "cz"]
    m2, x2 = _monotone_bounds(mins, maxs)
    assert m2 == sorted(m2) and x2 == sorted(x2)
    assert all(x >= orig for x, orig in zip(x2, maxs))  # maxs only go up (over-read)

    path, vocab = dict_file
    eager = TermDictionary(path)
    lazy = TermDictionary(path, budget_bytes=0)
    # perturb the REAL bounds the way truncation would: round every other
    # group's max up past its neighbour, truncate every third min down
    mins = list(lazy._mins)
    maxs = list(lazy._maxs)
    for i in range(0, len(maxs) - 1, 2):
        maxs[i] = maxs[i + 1] + "zz"       # rounded-up max overtakes the next group
    for i in range(2, len(mins), 3):
        mins[i] = mins[i][:1]              # truncated-down min falls behind
    lazy._mins, lazy._maxs = _monotone_bounds(mins, maxs)
    for t in vocab[::23] + ["", "zzz", vocab[5] + "q"]:
        assert lazy.df(t) == eager.df(t), t
    for p in ("a", "bc", "f", "de"):
        want = [t for t in vocab if t.startswith(p)]
        assert [t for sl in lazy.iter_slices(p) for t in sl.to_pylist()] == want, p


def test_engine_lazy_dictionary_parity(ray_session, tiny_corpus, tmp_path_factory):
    """QueryEngine with a forced-lazy dictionary returns identical results
    for every dictionary-driven surface (df/prefix/wildcard/regexp/fuzzy
    and BM25, whose idf reads df)."""
    from anomaly_detection_ray.index.build import build_index
    from anomaly_detection_ray.index.query import QueryEngine

    import os

    out = str(tmp_path_factory.mktemp("lazydict"))
    build_index(tiny_corpus["paths"], out, slices=1, num_partitions=4,
                batch_size=64, mode="code")
    # the tiny corpus fits one row group — re-chunk the dictionary so the
    # lazy mode actually prunes (content identical, just many groups)
    sp = os.path.join(out, "stats.parquet")
    pq.write_table(pq.read_table(sp), sp, row_group_size=64)
    a = QueryEngine(out)
    b = QueryEngine(out, dict_budget_bytes=0)
    assert a._dict.eager and not b._dict.eager
    for t in ("merge", "sort", "zzabsent0"):
        assert a.df(t) == b.df(t)
    assert a.prefix_terms("me") == b.prefix_terms("me")
    assert a.prefix_terms("s", max_expansions=5) == b.prefix_terms("s", max_expansions=5)
    assert a.wildcard_terms("me*e") == b.wildcard_terms("me*e")
    assert a.regexp_terms("m[ae]rge") == b.regexp_terms("m[ae]rge")
    assert a.fuzzy_terms("merge", fuzziness=1) == b.fuzzy_terms("merge", fuzziness=1)
    assert a.fuzzy_terms("mergz", fuzziness="AUTO", max_expansions=10) == \
        b.fuzzy_terms("mergz", fuzziness="AUTO", max_expansions=10)
    assert a.bm25_topk("merge sort", k=10) == b.bm25_topk("merge sort", k=10)
    assert list(a.wildcard_docs("mer*")) == list(b.wildcard_docs("mer*"))
