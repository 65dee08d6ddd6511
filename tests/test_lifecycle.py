"""Tombstone deletes + compaction vs fresh-build / stale-stats oracles.

Delete semantics under test (Lucene's delete-before-merge model):
- a delete never changes a live doc's BM25 score (stats stay stale);
- the post-delete top-k equals the pre-delete ranking with tombstoned
  docs removed;
- compaction (forceMerge(1)) purges tombstones and recomputes exact
  stats: scores become identical to a from-scratch build over the
  live docs.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from anomaly_detection_ray.functions.analyzer import Analyzer
from anomaly_detection_ray.index.build import build_index, extend_index
from anomaly_detection_ray.index.lifecycle import (
    compact_index,
    delete_by_query,
    delete_docs,
    load_deleted,
)
from anomaly_detection_ray.index.oracle import BruteForceIndex
from anomaly_detection_ray.index.query import QueryEngine

QUERIES = ["merge sort", "parse import", "window filter data", "import"]
PHRASES = ["merge sort", "import parse"]


def _hits_minus(hits, deleted, k):
    return [(d, s) for d, s in hits if d not in deleted][:k]


@pytest.fixture(scope="module")
def deleted_index(ray_session, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lifecycle_idx"))
    build_index(
        tiny_corpus["paths"], out, slices=2, num_partitions=4, batch_size=64,
        mode="code", store_positions=True,
    )
    pre = QueryEngine(out)
    pre_topk = {q: pre.bm25_topk(q, k=200, prune=False) for q in QUERIES}
    pre_phrase = {p: list(pre.phrase(p)) for p in PHRASES}
    # tombstone the top hits of the first query plus a doc-id comb —
    # deletes that actually perturb rankings
    deleted = {d for d, _ in pre_topk[QUERIES[0]][:3]} | set(range(0, 200, 7))
    delete_docs(out, sorted(deleted))
    return out, deleted, pre_topk, pre_phrase


def test_delete_filters_every_query_path(deleted_index, tiny_corpus):
    out, deleted, pre_topk, pre_phrase = deleted_index
    eng = QueryEngine(out)
    table = tiny_corpus["table"]
    oracle = BruteForceIndex(
        table["doc_id"].to_pylist(), table["content"].to_pylist(), Analyzer("code")
    )
    # postings exclude tombstones
    for term in ["import", "merge", "parse"]:
        exp = sorted(set(oracle.postings.get(term, ())) - deleted)
        assert list(eng.term_docs(term)) == exp, term
    # conjunctive
    for q in QUERIES:
        assert list(eng.conjunctive(q)) == sorted(set(oracle.conjunctive(q)) - deleted), q
    # phrase (positional sidecar filtered too)
    for p in PHRASES:
        assert list(eng.phrase(p)) == sorted(set(pre_phrase[p]) - deleted), p
    # DSL: match_all + meta filters run over the live docmap
    all_live = sorted(set(table["doc_id"].to_pylist()) - deleted)
    assert list(eng.execute_filter({"match_all": {}})) == all_live
    df = table.to_pandas()
    py = sorted(set(df[df["lang"] == "python"]["doc_id"]) - deleted)
    assert list(eng.execute_filter({"term": {"lang": "python"}})) == py


def test_delete_keeps_live_scores_stale_stats(deleted_index):
    """Top-k after delete == pre-delete ranking minus tombstones, scores
    bit-identical — the Lucene stale-stats invariant, on BOTH paths."""
    out, deleted, pre_topk, _ = deleted_index
    eng = QueryEngine(out)
    for q in QUERIES:
        expected = _hits_minus(pre_topk[q], deleted, 10)
        for prune in (False, True):
            got = eng.bm25_topk(q, k=10, prune=prune)
            assert [d for d, _ in got] == [d for d, _ in expected], (q, prune)
            for (_, gs), (_, es) in zip(got, expected):
                assert gs == pytest.approx(es, abs=1e-9)
        dist = eng.bm25_topk_distributed(q, k=10)
        assert [d for d, _ in dist] == [d for d, _ in expected], q


def test_index_stats_reflects_lifecycle(deleted_index):
    out, deleted, _, _ = deleted_index
    s = QueryEngine(out).index_stats()
    assert s["n_docs"] == 200  # stale until compaction, like Lucene
    assert s["n_deleted"] == len(deleted)
    assert s["n_slices"] == 2 and s["postings_bytes"] > 0
    assert s["store_positions"] is True and s["analyzer_mode"] == "code"


def test_facets_count_highlight_respect_tombstones(deleted_index, tiny_corpus):
    """Composed serving surfaces all evaluate the LIVE view."""
    out, deleted, _, _ = deleted_index
    eng = QueryEngine(out)
    df = tiny_corpus["table"].to_pandas()
    live = df[~df["doc_id"].isin(deleted)]
    assert eng.count(None) == len(live)
    rows = dict(eng.facets(None, "lang", k=100))
    assert rows == live["lang"].value_counts().to_dict()
    # highlighted hits never include tombstoned docs
    from anomaly_detection_ray.stages.highlight import snippets_for_hits

    hits = eng.bm25_topk(QUERIES[0], k=8)
    snips = snippets_for_hits(eng, tiny_corpus["paths"], QUERIES[0], hits)
    assert snips and not {r["doc_id"] for r in snips} & deleted


def test_delete_union_and_by_query(ray_session, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lifecycle_del2"))
    build_index(tiny_corpus["paths"], out, slices=1, num_partitions=4, mode="code")
    m1 = delete_docs(out, [1, 2, 3])
    m2 = delete_docs(out, [3, 4])  # union, idempotent overlap
    assert m2["deletes"]["n_deleted"] == 4
    assert list(load_deleted(out)) == [1, 2, 3, 4]
    # delete_by_query resolves against the LIVE view
    eng = QueryEngine(out)
    victims = set(eng.execute_filter({"term": {"lang": "go"}}).tolist())
    assert victims, "fixture should contain go docs"
    _, n = delete_by_query(out, {"term": {"lang": "go"}})
    assert n == len(victims)
    eng2 = QueryEngine(out)
    assert not set(eng2.execute_filter({"match_all": {}}).tolist()) & victims


def test_compact_equals_fresh_build_over_live_docs(
    deleted_index, tiny_corpus, tmp_path_factory
):
    out, deleted, _, _ = deleted_index
    manifest = compact_index(out)
    assert "deletes" not in manifest
    assert len(manifest["slices"]) == 1
    assert manifest["n_docs"] == 200 - len(deleted)

    # fresh build over only the live docs
    table = tiny_corpus["table"]
    live = table.filter(
        ~np.isin(table["doc_id"].to_numpy(), np.asarray(sorted(deleted)))
    )
    fresh_dir = str(tmp_path_factory.mktemp("fresh_live"))
    src = os.path.join(fresh_dir, "live.parquet")
    pq.write_table(live, src)
    fresh_idx = os.path.join(fresh_dir, "idx")
    fm = build_index(
        [src], fresh_idx, slices=1, num_partitions=4, mode="code",
        store_positions=True,
    )
    assert manifest["avgdl"] == pytest.approx(fm["avgdl"])
    assert manifest["n_terms"] == fm["n_terms"]

    ce, fe = QueryEngine(out), QueryEngine(fresh_idx)
    for term in ["import", "merge", "parse", "window"]:
        assert ce.df(term) == fe.df(term), term
        assert list(ce.term_docs(term)) == list(fe.term_docs(term)), term
    for q in QUERIES:
        exp = fe.bm25_topk(q, k=10, prune=False)
        for prune in (False, True):
            got = ce.bm25_topk(q, k=10, prune=prune)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, prune)
            for (_, gs), (_, es) in zip(got, exp):
                assert gs == pytest.approx(es, abs=1e-9)
    for p in PHRASES:
        assert list(ce.phrase(p)) == list(fe.phrase(p)), p
    # docmap rewritten to live docs only
    dm = ce.docmap().to_table()
    assert dm.num_rows == 200 - len(deleted)
    assert not set(dm["doc_id"].to_pylist()) & deleted

    # segment add AFTER compaction: fresh slice id, no dir collision
    import pyarrow as pa

    new_docs = pa.table(
        {
            "doc_id": pa.array([9001, 9002], pa.int64()),
            "content": pa.array(["zzuniqueterm alpha", "zzuniqueterm beta"]),
            "lang": pa.array(["python", "go"]),
        }
    )
    add_src = os.path.join(fresh_dir, "add.parquet")
    pq.write_table(new_docs, add_src)
    m2 = extend_index(out, [add_src])
    assert len(m2["slices"]) == 2
    assert m2["slices"][0]["dir"] != m2["slices"][1]["dir"]
    e2 = QueryEngine(out)
    assert list(e2.term_docs("zzuniqueterm")) == [9001, 9002]


def test_update_docs_scoped_tombstones(ray_session, tiny_corpus, tmp_path_factory):
    """update_docs = delete-in-old-segments + add-in-new-segment: the
    SAME doc_id serves its new content immediately; old copies stay dead
    through every query path; compaction converges to a fresh build."""
    import pyarrow as pa

    base = str(tmp_path_factory.mktemp("lifecycle_upd"))
    out = os.path.join(base, "idx")
    build_index(
        tiny_corpus["paths"], out, slices=2, num_partitions=4, batch_size=64,
        mode="code", store_positions=True,
    )
    table = tiny_corpus["table"]
    pre = QueryEngine(out)
    # pick two docs that currently match 'merge' — new content drops it
    victims = [int(d) for d in pre.term_docs("merge")[:2]]
    new_rows = pa.table(
        {
            "doc_id": pa.array(victims, pa.int64()),
            "content": pa.array(
                [f"zzfresh{d} replacement text body" for d in victims]
            ),
            "lang": pa.array(["python"] * len(victims)),
        }
    )
    upd_src = os.path.join(base, "upd.parquet")
    pq.write_table(new_rows, upd_src)
    from anomaly_detection_ray.index.lifecycle import update_docs

    m = update_docs(out, [upd_src])
    assert len(m["slices"]) == 3 and "deletes" in m

    eng = QueryEngine(out)
    # new content is served under the same ids
    for d in victims:
        assert list(eng.term_docs(f"zzfresh{d}")) == [d]
    # old copies are dead: 'merge' no longer matches the victims …
    assert not set(eng.term_docs("merge").tolist()) & set(victims)
    # … including through the block-skip conjunctive path: victims match
    # 'replacement' (new) but must NOT match 'merge replacement'
    assert not set(eng.conjunctive("merge replacement").tolist()) & set(victims)
    # match_all cardinality is unchanged (replace, not add)
    assert list(eng.execute_filter({"match_all": {}})) == sorted(
        table["doc_id"].to_pylist()
    )
    # phrase over the new content works; old-phrase hits on victims are gone
    assert sorted(eng.phrase("replacement text").tolist()) == sorted(victims)

    # idempotent rerun: same files → identical state
    update_docs(out, [upd_src])
    eng2 = QueryEngine(out)
    for d in victims:
        assert list(eng2.term_docs(f"zzfresh{d}")) == [d]
    assert list(eng2.execute_filter({"match_all": {}})) == sorted(
        table["doc_id"].to_pylist()
    )

    # compaction converges to a fresh build over the UPDATED corpus
    from anomaly_detection_ray.index.lifecycle import compact_index

    compact_index(out, gc=True)
    updated = table.to_pandas().set_index("doc_id")
    for d, txt in zip(victims, new_rows["content"].to_pylist()):
        updated.loc[d, "content"] = txt
    fresh_dir = os.path.join(base, "fresh")
    os.makedirs(fresh_dir)
    src = os.path.join(fresh_dir, "docs.parquet")
    pq.write_table(pa.Table.from_pandas(updated.reset_index()), src)
    fresh_idx = os.path.join(fresh_dir, "idx")
    build_index([src], fresh_idx, slices=1, num_partitions=4, mode="code",
                store_positions=True)
    ce, fe = QueryEngine(out), QueryEngine(fresh_idx)
    assert ce.n_docs == fe.n_docs and ce.avgdl == pytest.approx(fe.avgdl)
    for q in QUERIES + ["replacement text body"]:
        exp = fe.bm25_topk(q, k=10, prune=False)
        for prune in (False, True):
            got = ce.bm25_topk(q, k=10, prune=prune)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, prune)
            for (_, gs), (_, es) in zip(got, exp):
                assert gs == pytest.approx(es, abs=1e-9)

    # a plain delete AFTER an update kills the doc outright
    delete_docs(out, [victims[0]])
    e3 = QueryEngine(out)
    assert victims[0] not in set(e3.execute_filter({"match_all": {}}).tolist())
    assert list(e3.term_docs(f"zzfresh{victims[0]}")) == []


def test_delete_everything_then_compact(ray_session, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lifecycle_all"))
    build_index(tiny_corpus["paths"], out, slices=1, num_partitions=4, mode="code")
    # deleting unknown ids is a harmless no-op union
    delete_docs(out, [10**9, 10**9 + 1])
    eng = QueryEngine(out)
    assert eng.count(None) == 200
    delete_docs(out, range(0, 500))
    eng = QueryEngine(out)
    assert eng.count(None) == 0
    assert eng.bm25_topk("merge sort", k=10) == []
    assert list(eng.term_docs("import")) == []
    m = compact_index(out, gc=True)
    assert m["n_docs"] == 0 and m["n_terms"] == 0
    empty = QueryEngine(out)
    assert empty.bm25_topk("merge sort", k=10) == []
    assert empty.count(None) == 0


def test_partial_merge_tiered_policy(ray_session, tiny_corpus, tmp_path_factory):
    """maybe_merge folds only the smallest slices, keeps tombstones
    governing the untouched ones, and preserves every query result."""
    import pyarrow as pa

    from anomaly_detection_ray.index.lifecycle import maybe_merge, merge_slices

    base = str(tmp_path_factory.mktemp("lifecycle_tier"))
    out = os.path.join(base, "idx")
    # 4 slices: 3 from the corpus + 1 tiny segment add
    build_index(tiny_corpus["paths"], out, slices=3, num_partitions=4, mode="code")
    add = pa.table(
        {"doc_id": pa.array([901, 902], pa.int64()),
         "content": pa.array(["zztier alpha", "zztier beta"])}
    )
    add_src = os.path.join(base, "add.parquet")
    pq.write_table(add, add_src)
    extend_index(out, [add_src])
    # tombstone a few docs spread across slices
    delete_docs(out, [0, 80, 150, 901])
    before = QueryEngine(out)
    ref_top = {q: before.bm25_topk(q, k=10, prune=False) for q in QUERIES}
    ref_all = list(before.execute_filter({"match_all": {}}))
    ref_tier = list(before.term_docs("zztier"))

    # under the cap → no-op
    assert maybe_merge(out, max_slices=4) is None
    m = maybe_merge(out, max_slices=3, gc=True)
    assert m is not None and len(m["slices"]) == 3
    assert "deletes" in m  # partial merge keeps the tombstones
    after = QueryEngine(out)
    # membership invariants are exact: the live doc set is unchanged
    assert list(after.execute_filter({"match_all": {}})) == ref_all
    assert list(after.term_docs("zztier")) == ref_tier == [902]
    # BM25 stats legitimately SHIFT for merged docs (their tombstones
    # were purged from df/avgdl/n_docs — Lucene merges do the same), so
    # assert live-hit + both-paths-agree rather than score identity
    live = set(ref_all)
    for q in QUERIES:
        got = after.bm25_topk(q, k=10, prune=False)
        assert got and all(d in live for d, _ in got), q
        pruned = after.bm25_topk(q, k=10, prune=True)
        assert [d for d, _ in pruned] == [d for d, _ in got], q
    # a later FULL merge still converges and clears tombstones
    m2 = merge_slices(out, gc=True)
    assert "deletes" not in m2 and len(m2["slices"]) == 1
    final = QueryEngine(out)
    assert list(final.execute_filter({"match_all": {}})) == ref_all


def test_tail_ticks_bound_slice_count(ray_session, tmp_path_factory):
    """Continuous ticks with max_slices keep segment count bounded while
    every tick's docs stay searchable."""
    import pyarrow as pa

    from anomaly_detection_ray.index.build import tail_index_tick

    base = tmp_path_factory.mktemp("tier_ticks")
    inp = base / "in"
    inp.mkdir()
    idx = str(base / "idx")
    seen = str(base / "seen.json")
    for t in range(6):
        tbl = pa.table(
            {
                "doc_id": pa.array([t * 10 + j for j in range(3)], pa.int64()),
                "content": pa.array([f"tick{t} common doc{t * 10 + j}" for j in range(3)]),
            }
        )
        pq.write_table(tbl, str(inp / f"batch-{t:02d}.parquet"))
        m = tail_index_tick(str(inp), idx, seen, max_slices=3,
                            num_partitions=2, mode="code")
        assert len(m["slices"]) <= 3
    eng = QueryEngine(idx)
    assert eng.count(None) == 18
    assert list(eng.term_docs("common")) == sorted(
        t * 10 + j for t in range(6) for j in range(3)
    )
    for t in range(6):
        assert list(eng.term_docs(f"tick{t}")) == [t * 10 + j for j in range(3)], t


def test_compact_without_deletes_merges_slices(ray_session, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lifecycle_merge"))
    build_index(tiny_corpus["paths"], out, slices=3, num_partitions=4, mode="code")
    eng = QueryEngine(out)
    before = {q: eng.bm25_topk(q, k=10, prune=False) for q in QUERIES}
    m = compact_index(out, gc=True)
    assert len(m["slices"]) == 1
    assert m["n_docs"] == 200
    # old slice dirs removed by gc
    assert sorted(os.listdir(os.path.join(out, "segments"))) == [
        os.path.basename(m["slices"][0]["dir"])
    ]
    after = QueryEngine(out)
    for q in QUERIES:
        got = after.bm25_topk(q, k=10, prune=False)
        assert [d for d, _ in got] == [d for d, _ in before[q]]
        for (_, gs), (_, es) in zip(got, before[q]):
            assert gs == pytest.approx(es, abs=1e-9)
