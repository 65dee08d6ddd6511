"""Snippet extraction: golden strings + window-selection rules."""

import pyarrow as pa

from anomaly_detection_ray.stages.highlight import (
    Highlighter,
    best_window,
    make_snippet,
    snippets_for_hits,
    token_spans,
)


def test_token_spans_simple_and_code():
    assert token_spans("Alpha beta-42", "simple") == [
        ("alpha", 0, 5), ("beta", 6, 10), ("42", 11, 13)
    ]
    # code mode splits camelCase in place, spans inside the identifier
    spans = token_spans("x = mergeSort(arr)", "code")
    assert ("merge", 4, 9) in spans and ("sort", 9, 13) in spans


def test_best_window_rules():
    toks = "a b merge c d merge sort e".split()
    # distinct beats occurrences: window holding {merge, sort} wins over
    # two 'merge's without 'sort'
    s, e, n = best_window(toks, {"merge", "sort"}, 3)
    assert (s, e) == (4, 7) and n == 2
    # tie on distinct+occurrences → earliest window
    s, e, n = best_window(toks, {"merge"}, 2)
    assert (s, e) == (1, 3) and n == 1
    assert best_window([], {"x"}, 5) == (0, 0, 0)


def test_make_snippet_golden():
    text = "Alpha beta merge sort gamma"
    snip, n = make_snippet(text, {"merge", "sort"}, "simple", window=3)
    assert snip == "…beta <em>merge</em> <em>sort</em>…"
    assert n == 2
    # whole text fits the window → no ellipses, original casing kept
    snip, n = make_snippet(text, {"alpha"}, "simple", window=10)
    assert snip == "<em>Alpha</em> beta merge sort gamma"
    assert n == 1
    # inter-token punctuation preserved; camelCase hit wrapped in place
    snip, n = make_snippet("x = mergeSort(arr)", {"merge"}, "code", window=4)
    assert "<em>merge</em>Sort" in snip and n == 1
    assert make_snippet("", {"x"}, "simple") == ("", 0)
    # no query hit → earliest window, zero hits
    snip, n = make_snippet("one two three", {"absent"}, "simple", window=2)
    assert snip == "one two…" and n == 0


def test_highlighter_batch_stage():
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "content": pa.array(["merge the sort", "nothing here"])}
    )
    out = Highlighter("merge sort", text_col="content", mode="simple", window=3)(batch)
    assert out["snippet"].to_pylist() == [
        "<em>merge</em> the <em>sort</em>", "nothing here"
    ]
    assert out["n_hits"].to_pylist() == [2, 0]


def test_snippets_for_hits_end_to_end(ray_session, tiny_corpus, tmp_path_factory):
    from anomaly_detection_ray.index.build import build_index
    from anomaly_detection_ray.index.query import QueryEngine

    out = str(tmp_path_factory.mktemp("hl_idx"))
    build_index(tiny_corpus["paths"], out, slices=1, num_partitions=4, mode="code")
    eng = QueryEngine(out)
    q = "merge sort"
    hits = eng.bm25_topk(q, k=5)
    rows = snippets_for_hits(eng, tiny_corpus["paths"], q, hits)
    assert [r["doc_id"] for r in rows] == [d for d, _ in hits]
    assert [r["rank"] for r in rows] == list(range(1, len(hits) + 1))
    for r in rows:
        # every BM25 hit contains at least one query term → highlighted
        assert r["n_hits"] >= 1 and "<em>" in r["snippet"]
