"""Search-hit highlighting (snippet extraction).

The OpenSearch highlighter the reference's result UIs rely on, rebuilt
as a deterministic transform: for each hit, pick the best fixed-width
token window — max distinct query terms, then max total occurrences,
then earliest position — and emit the original text span with query
terms wrapped in ``<em>`` tags (Lucene's SimpleHTMLFormatter defaults).

Shapes:
- :class:`Highlighter` — a callable class for ``map_batches`` actor
  pools (analyzer compiled once per actor) when highlighting flows
  inside a Dataset pipeline;
- :func:`snippets_for_hits` — the serving path: top-k hits are a few
  rows, so the text is fetched with ONE predicate-pushdown parquet read
  of exactly those doc ids (never a scan; at 10^12 docs the read costs
  k row-group decodes).

Offsets come from span-preserving tokenization (``finditer`` of the
same regexes the index analyzer uses), so highlights align with the
ORIGINAL text, not a re-assembled token stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import _CODE_TOKEN, _SIMPLE_TOKEN

DEFAULT_WINDOW = 12
PRE_TAG, POST_TAG = "<em>", "</em>"


def token_spans(text: str, mode: str = "simple") -> list[tuple[str, int, int]]:
    """(token, char_start, char_end) in original-text coordinates.

    ``simple`` tokenizes the lowercased text; for the rare text whose
    lowercasing changes length (e.g. 'İ'), spans are computed on the
    lowered text and highlighting falls back to it — deterministic
    either way."""
    if mode == "code":
        return [
            (m.group().lower(), m.start(), m.end())
            for m in _CODE_TOKEN.finditer(text)
        ]
    low = text.lower()
    return [(m.group(), m.start(), m.end()) for m in _SIMPLE_TOKEN.finditer(low)]


def best_window(
    tokens: list[str], terms: set[str], window: int
) -> tuple[int, int, int]:
    """(start_idx, end_idx, n_hits) of the best ``window``-token span:
    max distinct query terms, then max occurrences, then earliest."""
    n = len(tokens)
    if n == 0:
        return 0, 0, 0
    w = min(window, n)
    term_list = sorted(terms)
    hit_any = np.zeros(n, dtype=np.int64)
    per_term = []
    for t in term_list:
        h = np.fromiter((tok == t for tok in tokens), dtype=np.int64, count=n)
        per_term.append(np.concatenate(([0], np.cumsum(h))))
        hit_any += h
    occ = np.concatenate(([0], np.cumsum(hit_any)))
    starts = np.arange(n - w + 1)
    ends = starts + w
    distinct = np.zeros(starts.size, dtype=np.int64)
    for cs in per_term:
        distinct += (cs[ends] - cs[starts]) > 0
    occs = occ[ends] - occ[starts]
    best = int(np.lexsort((starts, -occs, -distinct))[0])
    return int(starts[best]), int(ends[best]), int(occs[best])


def make_snippet(
    text: str,
    terms: set[str],
    mode: str = "simple",
    window: int = DEFAULT_WINDOW,
    pre: str = PRE_TAG,
    post: str = POST_TAG,
) -> tuple[str, int]:
    """(snippet, n_hits) for one document."""
    spans = token_spans(text, mode)
    if not spans:
        return "", 0
    src = text if mode == "code" else text.lower()
    if len(src) != len(text):
        text = src  # length-changing lowercase: highlight the lowered text
    toks = [t for t, _, _ in spans]
    s, e, n_hits = best_window(toks, terms, window)
    lo = spans[s][1]
    hi = spans[e - 1][2]
    out = []
    cur = lo
    for tok, ts, te in spans[s:e]:
        out.append(text[cur:ts])
        if tok in terms:
            out.append(pre + text[ts:te] + post)
        else:
            out.append(text[ts:te])
        cur = te
    out.append(text[cur:hi])
    snippet = "".join(out)
    if lo > 0:
        snippet = "…" + snippet
    if hi < len(text):
        snippet = snippet + "…"
    return snippet, n_hits


class Highlighter:
    """``map_batches`` stage: adds (snippet, n_hits) columns. Analyzer
    terms are fixed at construction (broadcast once per actor)."""

    def __init__(self, query: str, *, text_col: str = "content",
                 mode: str = "simple", window: int = DEFAULT_WINDOW):
        from ..functions.analyzer import Analyzer

        self.terms = set(Analyzer(mode).tokens(query))
        self.text_col = text_col
        self.mode = mode
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        snippets, hits = [], []
        for txt in batch[self.text_col].to_pylist():
            s, h = make_snippet(txt or "", self.terms, self.mode, self.window)
            snippets.append(s)
            hits.append(h)
        return batch.append_column("snippet", pa.array(snippets, pa.string())) \
                    .append_column("n_hits", pa.array(hits, pa.int64()))


def snippets_for_hits(
    engine,
    source_files: list[str],
    query: str,
    hits: list[tuple[int, float]],
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    window: int = DEFAULT_WINDOW,
) -> list[dict]:
    """Highlight the top-k hits of a BM25 query: one predicate-pushdown
    read of exactly the hit rows, then per-hit snippet extraction in
    rank order."""
    import pyarrow.dataset as pads

    if not hits:
        return []
    ids = [d for d, _ in hits]
    tbl = pads.dataset(source_files, format="parquet").to_table(
        columns=[id_col, text_col], filter=pads.field(id_col).isin(ids)
    )
    texts = dict(zip(tbl[id_col].to_pylist(), tbl[text_col].to_pylist()))
    terms = set(engine.analyzer.tokens(query))
    mode = engine.manifest.get("analyzer_mode", "code")
    out = []
    for rank, (d, score) in enumerate(hits, start=1):
        snippet, n_hits = make_snippet(
            texts.get(d, "") or "", terms, mode, window
        )
        out.append(
            {"doc_id": int(d), "rank": rank, "score": float(score),
             "snippet": snippet, "n_hits": n_hits}
        )
    return out
