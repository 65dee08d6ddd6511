"""BM25 top-k + Boolean query engine over built index segments.

Serves the query surface the reference plugin pushes down to
OpenSearch/Lucene (SURVEY.md §2.A): BM25 top-k (north rule), conjunctive
posting-list intersection (A2), term filters (A3), with global stats
(N, avgdl, df) from the manifest so scores are identical regardless of
how the corpus was sliced/partitioned (the DFS-stats model).

Two scoring paths, rank-identical with scores equal to 1e-9 (tested
against each other and the brute-force oracle; the exact path
accumulates term-major off the decoded-postings cache, so cross-path
scores can differ by one float association ulp):

- ``prune=False``: exact vectorized scoring — decode every posting of
  every query term, one ``np.add.at`` accumulation. The throughput
  baseline.
- ``prune=True``: block-max interval pruning. The doc axis is cut at
  all block boundaries into elementary intervals; each interval's upper
  bound is the sum of overlapping blocks' ``idf·tf_norm(max_tf,
  min_dl)``. Intervals are scored exactly in descending-UB order and
  scoring stops once the next UB is strictly below the current kth
  score — every skipped doc is provably ≤ θ (Ding & Suel's block-max
  idea at block granularity, vectorized instead of per-doc pointer
  chasing).

An engine instance holds the term-stats dictionary and a pyarrow
dataset over the postings files (loaded once — use as an actor-pool
member for serving). Chunk reads go through Parquet predicate pushdown
on the ``term`` column; rows are term-sorted so row-group stats prune.
"""

from __future__ import annotations

import json
import os
from glob import glob

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from ..functions.analyzer import Analyzer
from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import tf_norm
from .build import MANIFEST_NAME
from .segments import decode_block


def _arrow_bisect(arr, term: str, side: str = "left") -> int:
    """Binary search over a SORTED Arrow string array without
    materializing it into Python (O(log n) ``.as_py()`` probes — the
    dictionary stays in Arrow buffers, which is what survives a 10^9-term
    vocabulary; round-1 built a Python dict over every term)."""
    lo, hi = 0, len(arr)
    while lo < hi:
        mid = (lo + hi) // 2
        v = arr[mid].as_py()
        if v < term or (side == "right" and v == term):
            lo = mid + 1
        else:
            hi = mid
    return lo


_SUB_METRIC_ARROW = {
    "min": "min", "max": "max", "avg": "mean", "sum": "sum",
    "value_count": "count", "cardinality": "count_distinct",
}


def _calendar_boundaries(lo_ms: int, hi_ms: int, unit: str) -> np.ndarray:
    """Every calendar bucket start in [lo_ms, hi_ms] (both are already
    calendar floors) — the gap-fill enumeration for calendar
    date_histograms."""
    from ..stages.window import CALENDAR_UNITS

    u = CALENDAR_UNITS[unit]
    if u == "W":
        return np.arange(lo_ms, hi_ms + 1, 7 * 86_400_000, dtype=np.int64)
    step = {"M": 1, "Q": 3, "Y": 12}[u]
    m_lo = np.int64(lo_ms).astype("datetime64[ms]").astype("datetime64[M]").astype(np.int64)
    m_hi = np.int64(hi_ms).astype("datetime64[ms]").astype("datetime64[M]").astype(np.int64)
    months = np.arange(m_lo, m_hi + 1, step, dtype=np.int64)
    return months.astype("datetime64[M]").astype("datetime64[ms]").astype(np.int64)


def _parse_sort_keys(spec) -> list[tuple[str, bool]]:
    """OpenSearch sort spec → [(field, ascending)]: a string, a dict,
    or a list of either; dict values are "asc"/"desc" or {"order": …}."""
    if not spec:
        return []
    if isinstance(spec, (str, dict)):
        spec = [spec]
    keys = []
    for s in spec:
        if isinstance(s, str):
            keys.append((s, True))
        else:
            ((f, d),) = s.items()
            order = d.get("order", "asc") if isinstance(d, dict) else d
            keys.append((f, str(order).lower() != "desc"))
    return keys


def pd_isna(v) -> bool:
    import pandas as pd

    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _py_scalar(v):
    return v.item() if hasattr(v, "item") else v


def _terms_order_key(order: dict | None, plan: list[tuple[str, str, str]]):
    """Bucket sort key for the OpenSearch terms-agg ``order`` option:
    ``_count`` (default, desc) / ``_key`` / a metric sub-agg name / a
    dotted ``name.metric`` path into a stats sub-agg. Ties break on
    (key asc), like OpenSearch's total ordering."""
    if not order:
        return lambda b: (-b["doc_count"], b["key"])
    if len(order) != 1:
        raise ValueError("terms order must name exactly one sort target")
    ((target, direction),) = order.items()
    sign = 1 if str(direction).lower() == "asc" else -1
    if target == "_key":
        # _key ordering is total already; honor direction via reverse
        # sort on the key alone (keys are unique per bucket)
        if sign == 1:
            return lambda b: b["key"]
        return lambda b: _Reversed(b["key"])
    if target == "_count":
        return lambda b: (sign * b["doc_count"], b["key"])
    name, dot, stat = target.partition(".")
    names = {n for n, _, _ in plan}
    if name not in names:
        raise ValueError(f"terms order references unknown sub-aggregation {target!r}")
    op = next(o for n, o, _ in plan if n == name)
    if op == "stats":
        if not dot:
            raise ValueError(f"ordering on stats agg {name!r} needs a dotted path (e.g. {name}.avg)")
        get = lambda b: b[name][stat]  # noqa: E731
    else:
        if dot:
            raise ValueError(f"sub-aggregation {name!r} is single-valued; drop the .{stat}")
        get = lambda b: b[name]["value"]  # noqa: E731
    # null metric values (empty buckets) sort last either direction,
    # matching OpenSearch's missing-bucket treatment
    def key(b):
        v = get(b)
        return (v is None, (sign * v) if v is not None else 0.0, b["key"])

    return key


class _Reversed:
    """Inverts comparison for descending _key ordering of arbitrary
    (string or numeric) bucket keys."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def _sub_agg_plan(sub_aggs: dict) -> list[tuple[str, str, str]]:
    """Validate a nested-aggs dict into [(name, op, field)] — metric
    sub-aggregations only (OpenSearch allows bucket-in-bucket nesting;
    this engine supports the metric layer the reference actually
    composes, e.g. the per-feature aggs inside the entity composite)."""
    plan = []
    for name, spec in sub_aggs.items():
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(f"sub-aggregation {name!r} must be a single metric agg")
        op = next(iter(spec))
        if op != "stats" and op not in _SUB_METRIC_ARROW:
            raise ValueError(
                f"unsupported sub-aggregation {op!r} "
                f"(stats or {sorted(_SUB_METRIC_ARROW)})"
            )
        plan.append((name, op, spec[op]["field"]))
    return plan


def _topk_with_ties(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """Top-k by (score desc, doc_id asc) without fully sorting all docs."""
    n = scores.size
    if n == 0:
        return []
    if n > 4 * k:
        kth_val = -np.partition(-scores, k - 1)[k - 1]
        # keep everything ≥ kth score so doc-id tie-break at the boundary is exact
        sel = np.flatnonzero(scores >= kth_val)
        doc_ids, scores = doc_ids[sel], scores[sel]
    order = np.lexsort((doc_ids, -scores))[:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in order]


class QueryEngine:
    def __init__(self, index_dir: str, preload_bytes: int = 2 << 30,
                 postings_cache_bytes: int = 256 << 20,
                 dict_budget_bytes: int = 1 << 30):
        import pyarrow.parquet as pq
        from collections import OrderedDict

        with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        self.index_dir = index_dir
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"])
        self.analyzer = Analyzer(self.manifest.get("analyzer_mode", "code"))
        # the indexed text field's source column (None on legacy manifests)
        self.text_field = self.manifest.get("text_field")
        # file list comes FROM the manifest (not a glob): slices become
        # visible only at the atomic manifest flip, so a crashed/partial
        # segment add can never serve half-finalized postings. Each file
        # carries its slice id for SCOPED tombstones (updates kill only
        # copies in slices older than the re-add).
        import re

        pairs = sorted(
            (
                os.path.join(index_dir, s["dir"], "postings", p["path"]),
                int(re.search(r"(\d+)$", s["dir"]).group(1)),
            )
            for s in self.manifest["slices"]
            for p in s["partitions"]
        )
        files = [f for f, _ in pairs]
        self._files = files
        self._file_slice = [sid for _, sid in pairs]
        # A serving engine instance (one per query actor) holds the term
        # dictionary in memory always, and — when the index fits
        # ``preload_bytes`` — the posting tables too (Lucene keeps them
        # mmapped; per-query parquet take() across many part files costs
        # hundreds of ms). Larger indexes fall back to on-disk take().
        total = sum(os.path.getsize(f) for f in files)
        self._preloaded = total <= preload_bytes
        self._tables: list[pa.Table] | None = [] if self._preloaded else None
        self._datasets = None if self._preloaded else [pads.dataset(f, format="parquet") for f in files]
        # Term dictionary: each part file is term-SORTED (build's lexsort),
        # so the dictionary is just each file's Arrow term column + binary
        # search — no O(vocab) Python loop, no per-actor Python dict.
        self._term_cols: list[pa.Array] = []
        for fi, f in enumerate(files):
            if self._preloaded:
                tbl = pq.read_table(f)
                self._tables.append(tbl)
                self._term_cols.append(tbl["term"].combine_chunks())
            else:
                self._term_cols.append(
                    pq.read_table(f, columns=["term"])["term"].combine_chunks()
                )
        # global term dictionary (stats.parquet, term-sorted): eager
        # in-RAM Arrow bisect when it fits dict_budget_bytes, else a
        # row-group-pruned lazy view — the 10^9-vocab serving path
        # (see index/termdict.py)
        from .termdict import TermDictionary

        self._dict = TermDictionary(
            os.path.join(index_dir, "stats.parquet"), budget_bytes=dict_budget_bytes
        )
        self._docmap_parts = [
            (
                int(re.search(r"(\d+)$", s["dir"]).group(1)),
                sorted(glob(os.path.join(index_dir, s["dir"], "docmap", "*.parquet"))),
            )
            for s in self.manifest["slices"]
        ]
        docmap = sorted(f for _, fs in self._docmap_parts for f in fs)
        self._docmap = pads.dataset(docmap, format="parquet") if docmap else None
        # per-term DECODED postings cache (LRU, byte-capped): varint
        # decode of a dense term is the serving hot path's dominant cost
        # (~30 ms/query measured); repeated query vocab hits the cache
        self._postings_cache: OrderedDict[str, tuple] = OrderedDict()
        self._postings_cache_bytes = 0
        self._postings_cache_cap = int(postings_cache_bytes)
        self.store_positions = bool(self.manifest.get("store_positions", False))
        self._positions_ds = None  # lazy: only phrase queries open the sidecar
        # tombstones (Lucene .liv analogue): docs filtered at decode time;
        # global stats (n_docs/avgdl/df) stay STALE until compaction —
        # exactly Lucene's delete-before-merge semantics, so a delete
        # never changes a live doc's BM25 score (block upper bounds
        # remain valid bounds; pruning is just marginally less tight).
        from .lifecycle import load_tombstones

        self.deleted, self._del_lf = load_tombstones(index_dir, self.manifest)
        # per-BLOCK decoded cache for the PRUNED path (LRU, byte-capped):
        # pruning touches only the blocks that can beat theta, so caching
        # whole terms wastes budget — repeated query vocab re-decodes just
        # the few competitive blocks. Keyed (term, chunk first_doc, block):
        # stable across queries, unique within the index.
        self._block_cache: OrderedDict[tuple, tuple] = OrderedDict()
        self._block_cache_bytes = 0
        self._block_cache_cap = int(postings_cache_bytes) // 2
        # docs-only per-term cache for multi-term (wildcard/fuzzy/terms)
        # unions — membership arrays are 1/3 the decoded size and must
        # not evict the BM25 serving set from _postings_cache
        self._docs_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._docs_cache_bytes = 0
        self._docs_cache_cap = int(postings_cache_bytes) // 2

    # ---------- postings access ----------

    def _live(self, docs: np.ndarray, slices) -> np.ndarray:
        """Scoped-tombstone survival mask (see lifecycle.live_mask)."""
        from .lifecycle import live_mask

        return live_mask(docs, slices, self.deleted, self._del_lf)

    def df(self, term: str) -> int:
        return self._dict.df(term)

    def chunks_for(self, terms: list[str]) -> pa.Table:
        from .segments import POSTINGS_SCHEMA

        by_file: dict[int, list[int]] = {}
        for t in terms:
            for fi, col in enumerate(self._term_cols):
                lo = _arrow_bisect(col, t, "left")
                hi = _arrow_bisect(col, t, "right")
                if hi > lo:
                    by_file.setdefault(fi, []).extend(range(lo, hi))
        if not by_file:
            return POSTINGS_SCHEMA.empty_table().append_column(
                "slice", pa.array([], pa.int64())
            )
        parts = []
        for fi, rows in sorted(by_file.items()):
            src = self._tables[fi] if self._preloaded else self._datasets[fi]
            t = src.take(sorted(rows))
            parts.append(
                t.append_column(
                    "slice",
                    pa.array(np.full(t.num_rows, self._file_slice[fi], np.int64)),
                )
            )
        return pa.concat_tables(parts)

    def term_arrays(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decoded (docs, tfs, dls) of one term across all part files, in
        (file, row) order — LRU-cached by decoded size."""
        hit = self._postings_cache.get(term)
        if hit is not None:
            self._postings_cache.move_to_end(term)
            return hit
        from .segments import decode_chunks_bulk

        rows = self.chunks_for([term]).to_pylist()
        if rows:
            docs, tfs, dls, off = decode_chunks_bulk(rows, int(self.manifest.get("block_size", 128)))
            if self.deleted.size:
                slices = np.repeat(
                    np.asarray([r["slice"] for r in rows], dtype=np.int64),
                    np.diff(off),
                )
                keep = self._live(docs, slices)
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        else:
            docs = tfs = dls = np.empty(0, dtype=np.int64)
        entry = (docs, tfs, dls)
        nb = docs.nbytes * 3
        self._postings_cache[term] = entry
        self._postings_cache_bytes += nb
        while self._postings_cache_bytes > self._postings_cache_cap and len(self._postings_cache) > 1:
            _, (d, _, _) = self._postings_cache.popitem(last=False)
            self._postings_cache_bytes -= d.nbytes * 3
        return entry

    def _term_rows(self, chunks: pa.Table) -> dict[str, list[dict]]:
        by_term: dict[str, list[dict]] = {}
        for row in chunks.to_pylist():
            by_term.setdefault(row["term"], []).append(row)
        return by_term

    # ---------- BM25 ----------

    def query_terms(self, query: str) -> list[str]:
        return sorted(set(self.analyzer.tokens(query)))

    def bm25_topk(self, query: str, k: int = 10, prune: bool = True) -> list[tuple[int, float]]:
        terms = self.query_terms(query)
        if prune:
            chunks = self.chunks_for(terms)
            if chunks.num_rows == 0:
                return []
            return self._score_pruned(chunks, k)
        return self._score_exact(terms, k)

    def bm25_scores(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """Full exact BM25 accumulation: (sorted matching doc_ids, their
        scores) — the building block multi_match / search_after rank
        from."""
        terms = self.query_terms(query)
        docs_parts, imp_parts = [], []
        for t in terms:
            docs_t, tfs_t, dls_t = self.term_arrays(t)
            if docs_t.size == 0:
                continue
            w = float(bm25_idf(self.df(t), self.n_docs))
            docs_parts.append(docs_t)
            imp_parts.append(w * tf_norm(tfs_t, dls_t, self.avgdl))
        if not docs_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        docs = np.concatenate(docs_parts)
        imps = np.concatenate(imp_parts)
        max_doc = int(docs.max()) if docs.size else 0
        if max_doc < 4 * self.n_docs:
            # dense doc-id space → bincount accumulation (no sort)
            scores = np.bincount(docs, weights=imps, minlength=max_doc + 1)
            hit = np.flatnonzero(np.bincount(docs, minlength=max_doc + 1))
            return hit.astype(np.int64), scores[hit]
        uniq, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, imps)
        return uniq.astype(np.int64), scores

    def _score_exact(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        # re-analysis of already-analyzed terms is idempotent (tokens
        # tokenize to themselves), so the join round-trip is exact
        docs, scores = self.bm25_scores(" ".join(terms))
        if docs.size == 0:
            return []
        return _topk_with_ties(docs, scores, k)

    def _score_pruned(self, chunks: pa.Table, k: int) -> list[tuple[int, float]]:
        # flatten every block of every chunk row: (first, last, ub, row_idx, block_idx)
        rows = chunks.to_pylist()
        firsts, lasts, ubs, rowis, blkis = [], [], [], [], []
        for ri, row in enumerate(rows):
            w = float(bm25_idf(self.df(row["term"]), self.n_docs))
            bf = np.asarray(row["block_first"], dtype=np.int64)
            bl = np.asarray(row["block_last"], dtype=np.int64)
            ub = w * tf_norm(
                np.asarray(row["block_max_tf"], dtype=np.float64),
                np.asarray(row["block_min_dl"], dtype=np.float64),
                self.avgdl,
            )
            firsts.append(bf)
            lasts.append(bl)
            ubs.append(ub)
            rowis.append(np.full(bf.size, ri))
            blkis.append(np.arange(bf.size))
        bfirst = np.concatenate(firsts)
        blast = np.concatenate(lasts)
        bub = np.concatenate(ubs)
        brow = np.concatenate(rowis)
        bblk = np.concatenate(blkis)

        # elementary intervals over doc axis from all block boundaries
        bounds = np.unique(np.concatenate([bfirst, blast + 1]))
        lo_idx = np.searchsorted(bounds, bfirst, side="right") - 1
        hi_idx = np.searchsorted(bounds, blast, side="right") - 1
        # interval UB via difference array over interval indices
        diff = np.zeros(bounds.size + 1, dtype=np.float64)
        np.add.at(diff, lo_idx, bub)
        np.add.at(diff, hi_idx + 1, -bub)
        iub = np.cumsum(diff[:-1])  # UB per elementary interval [bounds[i], bounds[i+1])

        live = np.flatnonzero(iub > 0)
        order = live[np.argsort(-iub[live], kind="stable")]

        # per-block decoded score cache
        block_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

        def block_scores(ri: int, bi: int) -> tuple[np.ndarray, np.ndarray]:
            key = (ri, bi)
            hit = block_cache.get(key)
            if hit is None:
                row = rows[ri]
                pkey = (row["term"], row["first_doc"], bi)
                hit = self._block_cache.get(pkey)
                if hit is not None:
                    self._block_cache.move_to_end(pkey)
                else:
                    w = float(bm25_idf(self.df(row["term"]), self.n_docs))
                    docs, tfs, dls = decode_block(row, bi)
                    if self.deleted.size:
                        keep = self._live(docs, int(row["slice"]))
                        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                    hit = (docs, w * tf_norm(tfs, dls, self.avgdl))
                    self._block_cache[pkey] = hit
                    self._block_cache_bytes += hit[0].nbytes * 2
                    while (self._block_cache_bytes > self._block_cache_cap
                           and len(self._block_cache) > 1):
                        _, (d, _) = self._block_cache.popitem(last=False)
                        self._block_cache_bytes -= d.nbytes * 2
                block_cache[key] = hit
            return hit

        # running top-k kept as flat arrays (docs partition across
        # elementary intervals, so each doc's full score arrives in one
        # interval — merging is concatenate + partition, no per-doc heap)
        theta = -np.inf
        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float64)

        for i in order:
            if iub[i] < theta:
                break
            lo, hi = bounds[i], bounds[i + 1] if i + 1 < bounds.size else bounds[i] + 1
            docs_parts, val_parts = [], []
            # covering blocks of interval i, computed lazily and vectorized
            # (round-1 pre-materialized a per-interval block-list dict with
            # a Python loop over blocks × covered intervals — quadratic for
            # dense terms; with early termination only the few intervals
            # actually scored pay this O(blocks) mask)
            cov = np.flatnonzero((lo_idx <= i) & (hi_idx >= i))
            for b in cov:
                docs, vals = block_scores(int(brow[b]), int(bblk[b]))
                s = np.searchsorted(docs, lo, side="left")
                e = np.searchsorted(docs, hi, side="left")
                if e > s:
                    docs_parts.append(docs[s:e])
                    val_parts.append(vals[s:e])
            if not docs_parts:
                continue
            d = np.concatenate(docs_parts)
            v = np.concatenate(val_parts)
            uniq, inv = np.unique(d, return_inverse=True)
            sc = np.zeros(uniq.size)
            np.add.at(sc, inv, v)
            top_d = np.concatenate([top_d, uniq])
            top_s = np.concatenate([top_s, sc])
            if top_s.size >= k:
                theta = -np.partition(-top_s, k - 1)[k - 1]
                if top_s.size > 8 * k:
                    keep = top_s >= theta  # keep score ties for exact doc-id tie-break
                    top_d, top_s = top_d[keep], top_s[keep]

        if top_s.size == 0:
            return []
        return _topk_with_ties(top_d, top_s, k)

    # ---------- Boolean ----------

    def conjunctive(self, query: str) -> np.ndarray:
        """Sorted doc_ids containing ALL query terms (filter context,
        SURVEY.md §2.A2 — ``ParseUtils.java:321,370-376``).

        Rarest-first; after the first term, each remaining term decodes
        ONLY the posting blocks whose [block_first, block_last] doc range
        intersects the surviving candidates (the block-max metadata
        doubles as a skip list — round-1 fully decoded every posting of
        every term before intersecting)."""
        terms = self.query_terms(query)
        if not terms:
            return np.empty(0, dtype=np.int64)
        result: np.ndarray | None = None
        for t in sorted(terms, key=self.df):
            if self.df(t) == 0:
                return np.empty(0, dtype=np.int64)
            if result is None:
                result = self.term_docs(t)
            else:
                docs = self._term_docs_skipped(t, result)
                result = result[np.isin(result, docs, assume_unique=True)]
            if result.size == 0:
                break
        return result if result is not None else np.empty(0, dtype=np.int64)

    def _term_docs_skipped(self, term: str, candidates: np.ndarray) -> np.ndarray:
        """Sorted doc_ids of ``term`` restricted to blocks that can
        contain any of the (sorted) candidate doc ids — skips decoding
        blocks whose doc range misses every candidate."""
        rows = self.chunks_for([term]).to_pylist()
        if not rows:
            return np.empty(0, dtype=np.int64)
        parts: list[np.ndarray] = []
        for row in rows:
            bf = np.asarray(row["block_first"], dtype=np.int64)
            bl = np.asarray(row["block_last"], dtype=np.int64)
            # block b can intersect iff a candidate falls inside [bf, bl]
            keep = np.flatnonzero(
                np.searchsorted(candidates, bl, side="right")
                > np.searchsorted(candidates, bf, side="left")
            )
            for bi in keep:
                docs, _, _ = decode_block(row, int(bi))
                if self.deleted.size:
                    # scoped filter required here: an updated doc's LIVE
                    # candidate must not be matched by its DEAD old copy
                    docs = docs[self._live(docs, int(row["slice"]))]
                parts.append(docs)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(parts))

    def term_docs(self, term: str) -> np.ndarray:
        return np.sort(self.term_arrays(term)[0])

    def prefix_terms(self, prefix: str, max_expansions: int | None = None) -> list[str]:
        """Dictionary terms starting with ``prefix`` — a binary-search
        range over the term-sorted global stats (the reason the
        dictionary is stored sorted), like Lucene's TermRangeEnum."""
        terms: list[str] = []
        for sl in self._dict.iter_slices(prefix):
            terms.extend(sl.to_pylist())
            if max_expansions is not None and len(terms) >= max_expansions:
                break  # slices arrive in term order — Lucene keeps first-N
        if max_expansions is not None:
            terms = terms[:max_expansions]
        return terms

    def prefix_docs(self, prefix: str, max_expansions: int | None = None) -> np.ndarray:
        """Sorted doc_ids containing ANY term with the given prefix
        (filter-context prefix query): dictionary range scan → union of
        the matched terms' postings."""
        return self.union_docs(self.prefix_terms(prefix, max_expansions))

    def union_docs(self, terms: list[str]) -> np.ndarray:
        """Sorted doc_ids containing ANY of ``terms`` (multi-term query
        rewrite: postings union). Filter context needs membership only,
        so this decodes JUST the doc streams of all matched terms in one
        bulk pass — no tf/dl decode, and the (BM25-serving) postings
        cache is neither consulted nor polluted by a 100-term wildcard
        expansion (measured 3-4× on dense expansions)."""
        if not terms:
            return np.empty(0, dtype=np.int64)
        if len(terms) == 1:
            return self.term_docs(terms[0])
        parts: list[np.ndarray] = []
        misses = []
        for t in set(terms):
            hit = self._docs_cache.get(t)
            if hit is not None:
                self._docs_cache.move_to_end(t)
                parts.append(hit)
            else:
                misses.append(t)
        if misses:
            from .segments import decode_docs_bulk

            rows = self.chunks_for(misses).to_pylist()
            if rows:
                docs, off = decode_docs_bulk(
                    rows, int(self.manifest.get("block_size", 128))
                )
                counts = np.diff(off)
                if self.deleted.size:
                    slices = np.repeat(
                        np.asarray([r["slice"] for r in rows], dtype=np.int64), counts
                    )
                    keep = self._live(docs, slices)
                    # recompute per-row counts after the scoped filter
                    row_of = np.repeat(np.arange(len(rows)), counts)[keep]
                    docs = docs[keep]
                    counts = np.bincount(row_of, minlength=len(rows))
                row_terms = [r["term"] for r in rows]
                bounds = np.concatenate(([0], np.cumsum(counts)))
                by_term: dict[str, list[np.ndarray]] = {}
                for i, t in enumerate(row_terms):
                    by_term.setdefault(t, []).append(docs[bounds[i] : bounds[i + 1]])
                for t in misses:
                    segs = by_term.get(t, [])
                    dt = (
                        np.unique(np.concatenate(segs)).astype(np.int64)
                        if segs else np.empty(0, dtype=np.int64)
                    )
                    parts.append(dt)
                    self._docs_cache[t] = dt
                    self._docs_cache_bytes += dt.nbytes
                while (
                    self._docs_cache_bytes > self._docs_cache_cap
                    and len(self._docs_cache) > 1
                ):
                    _, ev = self._docs_cache.popitem(last=False)
                    self._docs_cache_bytes -= ev.nbytes
            else:
                parts.extend(np.empty(0, dtype=np.int64) for _ in misses)
        if not parts:
            return np.empty(0, dtype=np.int64)
        cat = np.concatenate(parts)
        if cat.size == 0:
            return cat.astype(np.int64)
        mx = int(cat.max())
        if mx < 8 * max(self.n_docs, 1):
            # dense id space: bitmap dedup is O(n), no sort
            flags = np.zeros(mx + 1, dtype=bool)
            flags[cat] = True
            return np.flatnonzero(flags).astype(np.int64)
        return np.unique(cat).astype(np.int64)

    # ---------- multi-term queries (wildcard / regexp / fuzzy) ----------

    def _scan_terms(self, prefix: str, anchored_regex: str,
                    max_expansions: int | None = None) -> list[str]:
        """Dictionary terms matching an anchored regex, scanning only the
        ``prefix``-bounded range of the sorted vocabulary — one vectorized
        RE2 match over the Arrow slice (see termscan module docstring)."""
        import pyarrow.compute as pc

        terms: list[str] = []
        for sl in self._dict.iter_slices(prefix):
            terms.extend(
                sl.filter(pc.match_substring_regex(sl, anchored_regex)).to_pylist()
            )
            if max_expansions is not None and len(terms) >= max_expansions:
                break  # first-N in term order (Lucene); slices are ordered
        if max_expansions is not None:
            terms = terms[:max_expansions]
        return terms

    def wildcard_terms(self, pattern: str, max_expansions: int | None = None) -> list[str]:
        """Lucene WildcardQuery: ``*`` = any run, ``?`` = one char."""
        from .termscan import wildcard_prefix, wildcard_to_regex

        return self._scan_terms(
            wildcard_prefix(pattern), wildcard_to_regex(pattern), max_expansions
        )

    def wildcard_docs(self, pattern: str, max_expansions: int | None = None) -> np.ndarray:
        return self.union_docs(self.wildcard_terms(pattern, max_expansions))

    def regexp_terms(self, pattern: str, max_expansions: int | None = None) -> list[str]:
        """Lucene RegexpQuery: the pattern must match the WHOLE term
        (anchored). Both this engine (Arrow) and the DuckDB oracle run
        RE2, so semantics agree by construction."""
        from .termscan import regexp_prefix

        return self._scan_terms(
            regexp_prefix(pattern), f"^(?:{pattern})$", max_expansions
        )

    def regexp_docs(self, pattern: str, max_expansions: int | None = None) -> np.ndarray:
        return self.union_docs(self.regexp_terms(pattern, max_expansions))

    def fuzzy_terms(
        self,
        term: str,
        fuzziness: int | str = "AUTO",
        prefix_length: int = 0,
        transpositions: bool = False,
        max_expansions: int | None = 50,
    ) -> list[str]:
        """Lucene FuzzyQuery rewrite: dictionary terms within
        ``fuzziness`` edits of ``term`` (AUTO = 0/1/2 by term length),
        sharing its first ``prefix_length`` chars, closest-first capped
        at ``max_expansions``. ``transpositions=True`` = OSA distance
        (``transpositions=False`` is the DuckDB-``levenshtein`` exact
        oracle mode)."""
        import pyarrow.compute as pc

        from .termscan import _rank_matches, auto_fuzziness, bounded_distances_arrow

        max_edits = auto_fuzziness(term) if fuzziness == "AUTO" else int(fuzziness)
        pre = term[: max(0, int(prefix_length))]
        all_dists: list[np.ndarray] = []
        all_strs: list[str] = []
        for sl in self._dict.iter_slices(pre):
            # cheap vectorized length band before any DP work
            ln = pc.utf8_length(sl)
            mask = pc.and_(
                pc.greater_equal(ln, len(term) - max_edits),
                pc.less_equal(ln, len(term) + max_edits),
            )
            cands = sl.filter(mask)
            if len(cands) == 0:
                continue
            # bounded DP straight off the Arrow buffers; only the (few)
            # matching terms ever become Python strings
            dist = bounded_distances_arrow(term, cands, max_edits, transpositions)
            sel = np.flatnonzero(dist <= max_edits)
            if sel.size:
                all_dists.append(dist[sel])
                all_strs.extend(cands.take(pa.array(sel)).to_pylist())
        if not all_strs:
            return []
        # closest-first ranking runs over ALL slices' matches (Lucene's
        # FuzzyQuery boosts by edit distance across the whole enum)
        return _rank_matches(np.concatenate(all_dists), max_edits, all_strs, max_expansions)

    def fuzzy_docs(self, term: str, **kwargs) -> np.ndarray:
        return self.union_docs(self.fuzzy_terms(term, **kwargs))

    # ---------- phrase queries (positional sidecar) ----------

    def _position_keys(self, terms: list[str]) -> dict[str, np.ndarray]:
        """term → sorted int64 keys ``(doc_id << 32) | position`` from the
        positional sidecar (``build_index(store_positions=True)``). The
        sidecar is term-hash partitioned and term-sorted per part, so the
        read prunes to the query terms' row groups."""
        if not self.store_positions:
            raise ValueError(
                "index was built without store_positions=True; phrase queries unavailable"
            )
        if self._positions_ds is None:
            import re
            from glob import glob as _glob

            self._positions_ds = [
                (
                    int(re.search(r"(\d+)$", s["dir"]).group(1)),
                    pads.dataset(files, format="parquet"),
                )
                for s in self.manifest["slices"]
                if (files := sorted(_glob(
                    os.path.join(self.index_dir, s["dir"], "positions", "*.parquet")
                )))
            ]
        term_filter = pads.field("term").isin(list(set(terms)))
        parts = []
        for sid, ds in self._positions_ds:
            t = ds.to_table(filter=term_filter)
            if self.deleted.size and t.num_rows:
                keep = self._live(t["doc_id"].to_numpy().astype(np.int64), sid)
                t = t.filter(pa.array(keep))
            parts.append(t)
        tbl = pa.concat_tables(parts) if parts else None
        if tbl is None:
            return {t: np.empty(0, dtype=np.int64) for t in set(terms)}
        out: dict[str, np.ndarray] = {}
        import pyarrow.compute as pc

        for t in set(terms):
            sub = tbl.filter(pc.equal(tbl["term"], t))
            lst = sub["positions"].combine_chunks()
            pos = lst.values.to_numpy(zero_copy_only=False).astype(np.int64)
            counts = np.diff(lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
            docs = np.repeat(sub["doc_id"].to_numpy().astype(np.int64), counts)
            out[t] = np.sort((docs << np.int64(32)) | pos)
        return out

    def phrase(self, query: str, slop: int = 0) -> np.ndarray:
        """Sorted doc_ids whose analyzed token stream contains the query
        tokens CONSECUTIVELY (match_phrase, filter context). One
        vectorized key-walk verifies adjacency across every candidate
        doc at once: start from the first term's (doc, pos) keys and
        keep those whose successor key exists for each following term —
        no per-doc loop, no text access.

        ``slop > 0`` relaxes to IN-ORDER proximity: the terms must appear
        in query order within a window of ``len(terms)-1+slop`` positions
        (∃ p_1<…<p_k with p_k−p_1 ≤ k−1+slop). This is the in-order
        subset of Lucene's sloppy phrase — the reordering-at-cost-2 moves
        Lucene also accepts are deliberately NOT matched (documented
        divergence; in-order-within-window is the semantics the SQL twin
        can state exactly). Vectorized greedy chain: from every start
        position, hop to each next term's EARLIEST later occurrence
        (searchsorted) — greedy minimizes the end for a fixed start, so
        the window test is exact."""
        terms = self.analyzer.tokens(query)
        if not terms:
            return np.empty(0, dtype=np.int64)
        if len(terms) == 1:
            return self.term_docs(terms[0])
        keys = self._position_keys(terms)
        if slop <= 0:
            s = keys[terms[0]]
            for i, t in enumerate(terms[1:], start=1):
                if s.size == 0:
                    break
                s = s[np.isin(s + np.int64(i), keys[t], assume_unique=False)]
            return np.unique(s >> np.int64(32)).astype(np.int64)
        cur = keys[terms[0]]
        start = cur
        for t in terms[1:]:
            if cur.size == 0:
                break
            nxt = keys[t]
            if nxt.size == 0:
                cur = start = cur[:0]
                break
            idx = np.searchsorted(nxt, cur + np.int64(1), side="left")
            ok = idx < nxt.size
            cand = nxt[np.minimum(idx, nxt.size - 1)]
            ok &= (cand >> np.int64(32)) == (cur >> np.int64(32))
            cur, start = cand[ok], start[ok]
        m = (cur - start) <= np.int64(len(terms) - 1 + slop)
        return np.unique(start[m] >> np.int64(32)).astype(np.int64)

    def phrase_prefix(self, query: str, max_expansions: int | None = 50) -> np.ndarray:
        """match_phrase_prefix (autocomplete): the query's last token is a
        PREFIX — it expands to dictionary terms (first ``max_expansions``
        in term order, Lucene semantics; ``None`` = all, the exact-twin
        mode) and the phrase key-walk's final step accepts any of them."""
        terms = self.analyzer.tokens(query)
        if not terms:
            return np.empty(0, dtype=np.int64)
        expansions = self.prefix_terms(terms[-1], max_expansions)
        if not expansions:
            return np.empty(0, dtype=np.int64)
        if len(terms) == 1:
            parts = [self.term_arrays(t)[0] for t in expansions]
            return np.unique(np.concatenate(parts)).astype(np.int64)
        keys = self._position_keys(terms[:-1] + expansions)
        last_keys = np.unique(np.concatenate([keys[t] for t in expansions]))
        s = keys[terms[0]]
        for i, t in enumerate(terms[1:-1], start=1):
            if s.size == 0:
                break
            s = s[np.isin(s + np.int64(i), keys[t])]
        if s.size:
            s = s[np.isin(s + np.int64(len(terms) - 1), last_keys)]
        return np.unique(s >> np.int64(32)).astype(np.int64)

    def docmap(self) -> pads.Dataset:
        if self._docmap is None:
            raise FileNotFoundError("index has no docmap")
        return self._docmap

    def live_docmap(self, columns: list[str] | None = None,
                    filter=None) -> pa.Table:
        """Docmap restricted to live rows (scoped tombstones applied per
        slice) — what metadata queries evaluate against.

        ``columns``/``filter`` push straight down into the per-slice
        parquet scan (row-group pruning + column projection), so a
        metadata predicate over a 10^12-doc corpus reads matching row
        groups of the needed columns, not the whole docmap. Requesting a
        column a slice lacks null-fills it (update files need not repeat
        every keep_col)."""
        if self._docmap is None:
            if self.n_docs == 0:  # a legitimately-empty index (e.g.
                # compacted after deleting everything) has zero docmap rows
                return pa.schema([("doc_id", pa.int64())]).empty_table()
            raise FileNotFoundError("index has no docmap")
        if columns is not None and "doc_id" not in columns:
            columns = ["doc_id", *columns]  # tombstone filtering needs it
        # unified schema across slices (update files may lack keep_cols);
        # missing columns null-fill with their TRUE type from the union
        if getattr(self, "_docmap_schema", None) is None:
            self._docmap_schema = pa.unify_schemas(
                [
                    pads.dataset(files, format="parquet").schema
                    for _, files in self._docmap_parts
                    if files
                ]
            )
        target = self._docmap_schema
        parts = []
        for sid, files in self._docmap_parts:
            if not files:
                continue
            ds = pads.dataset(files, format="parquet")
            have = set(ds.schema.names)
            want = columns if columns is not None else target.names
            cols = [c for c in want if c in have]
            pad_cols = [c for c in want if c not in have]
            try:
                t = ds.to_table(columns=cols, filter=filter)
            except (pa.ArrowInvalid, KeyError):
                # predicate references a column this slice lacks → the
                # column is all-null here → no row can match it
                continue
            for c in pad_cols:
                t = t.append_column(c, pa.nulls(t.num_rows, target.field(c).type))
            if self.deleted.size and t.num_rows:
                keep = self._live(t["doc_id"].to_numpy().astype(np.int64), sid)
                t = t.filter(pa.array(keep))
            parts.append(t)
        if not parts:
            want = columns if columns is not None else target.names
            return pa.schema([target.field(c) for c in want]).empty_table()
        return pa.concat_tables(parts, promote_options="default")

    # ---------- distributed scoring (doc-bucket parallel) ----------

    def bm25_topk_distributed(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """BM25 top-k as a Ray pipeline: the query's posting chunks are
        grouped by doc BUCKET (the index's doc-range partitioning), each
        bucket scores its doc range independently in parallel, and the
        tiny per-bucket top-k lists merge on the driver — the
        document-sharded execution model OpenSearch itself uses (per-
        shard top-k + merge), so results are identical to the local path
        (tested). This is the shape that serves a 10^12-doc index: no
        single task ever sees more than one bucket's postings."""
        import ray.data as rd

        terms = self.query_terms(query)
        chunks = self.chunks_for(terms)
        if chunks.num_rows == 0:
            return []
        dfs = {t: self.df(t) for t in terms}
        n_docs, avgdl = self.n_docs, self.avgdl
        block_size = int(self.manifest.get("block_size", 128))

        import ray

        tombs_ref = (
            ray.put((self.deleted, self._del_lf)) if self.deleted.size else None
        )

        def score_bucket(group: pa.Table) -> pa.Table:
            from .lifecycle import live_mask
            from .segments import decode_chunks_bulk

            rows = group.to_pylist()
            docs, tfs, dls, off = decode_chunks_bulk(rows, block_size)
            idfs = np.asarray([float(bm25_idf(dfs[r["term"]], n_docs)) for r in rows])
            w = np.repeat(idfs, np.diff(off))
            if tombs_ref is not None:
                ids, lf = ray.get(tombs_ref)
                slices = np.repeat(
                    np.asarray([r["slice"] for r in rows], dtype=np.int64),
                    np.diff(off),
                )
                keep = live_mask(docs, slices, ids, lf)
                docs, tfs, dls, w = docs[keep], tfs[keep], dls[keep], w[keep]
            imps = w * tf_norm(tfs, dls, avgdl)
            uniq, inv = np.unique(docs, return_inverse=True)
            scores = np.zeros(uniq.size)
            np.add.at(scores, inv, imps)
            top = _topk_with_ties(uniq, scores, k)
            return pa.table(
                {"doc_id": pa.array([d for d, _ in top], pa.int64()),
                 "score": pa.array([s for _, s in top], pa.float64())}
            )

        parts = (
            rd.from_arrow(chunks)
            .groupby("bucket")
            .map_groups(score_bucket, batch_format="pyarrow")
            .to_pandas()
        )
        return _topk_with_ties(parts["doc_id"].to_numpy(), parts["score"].to_numpy(), k)

    # ---------- restricted query DSL (SURVEY §2.A4) ----------

    def execute_filter(self, query: dict | None) -> np.ndarray:
        """bool/term/range/match AST → sorted doc_ids (filter context)."""
        from .queryast import QueryCompiler

        if getattr(self, "_compiler", None) is None:
            self._compiler = QueryCompiler(self)
        return self._compiler.execute(query)

    def count(self, query: dict | None = None) -> int:
        """Hit count of a filter-DSL query (the _count API)."""
        return int(self.execute_filter(query).size)

    def index_stats(self) -> dict:
        """The _stats/_cat-indices surface: corpus + segment shape and
        on-disk size, straight from the manifest (no postings access)."""
        return {
            "n_docs": self.n_docs,
            "n_deleted": int(self.deleted.size),
            "n_terms": int(self.manifest.get("n_terms", 0)),
            "avgdl": self.avgdl,
            "total_tokens": int(self.manifest.get("total_tokens", 0)),
            "n_slices": len(self.manifest["slices"]),
            "n_partitions": len(self._files),
            "postings_bytes": int(sum(os.path.getsize(f) for f in self._files)),
            "store_positions": self.store_positions,
            "analyzer_mode": self.manifest.get("analyzer_mode", "code"),
        }

    def more_like_this(
        self,
        text: str,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
        exclude_doc: int | None = None,
    ) -> list[tuple[int, float]]:
        """Lucene MoreLikeThis over ``like`` text: analyze, keep terms
        with tf ≥ min_term_freq and df ≥ min_doc_freq, rank by the
        classic tf·idf interestingness (ties by term), take the top
        ``max_query_terms``, then run disjunctive BM25 top-k with that
        term set (our exact scorer IS the should-OR accumulation).
        ``exclude_doc`` drops the source doc from the results (MLT's
        include=false default)."""
        from collections import Counter

        import math

        tf = Counter(self.analyzer.tokens(text))
        scored = []
        for t, f in tf.items():
            if f < min_term_freq:
                continue
            df = self.df(t)
            if df < min_doc_freq:
                continue
            scored.append((-(f * math.log(max(self.n_docs, 1) / df)), t))
        scored.sort()
        terms = sorted(t for _, t in scored[:max_query_terms])
        if not terms:
            return []
        hits = self._score_exact(terms, k + (1 if exclude_doc is not None else 0))
        if exclude_doc is not None:
            hits = [(d, s) for d, s in hits if d != exclude_doc][:k]
        return hits

    def facets(
        self, filter_query: dict | None, field: str, k: int = 10
    ) -> list[tuple[object, int]]:
        """Terms-aggregation facet over the docs matching ``filter_query``:
        top-k (value, doc_count) of a docmap column, count desc then
        value asc — the aggs-on-hits shape OpenSearch pairs with every
        search (the reference composes exactly this in ParseUtils'
        generated queries: a filtered search wrapping a terms agg)."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        # missing values drop out of the buckets (OpenSearch terms aggs
        # default) — a null bucket would also poison the (count, value)
        # sort when it ties a string bucket
        t = t.filter(pc.is_valid(t[field]))
        counts = t.group_by(field).aggregate([("doc_id", "count")])
        rows = sorted(
            zip(counts[field].to_pylist(), counts["doc_id_count"].to_pylist()),
            key=lambda r: (-r[1], r[0]),
        )
        return [(v, int(c)) for v, c in rows[:k]]

    def metric_agg(self, filter_query: dict | None, field: str, op: str):
        """Metric aggregation over the docs matching ``filter_query`` —
        the min/max/avg/sum/value_count/cardinality/stats single-value
        aggs OpenSearch pairs with searches (the reference issues these
        shapes over its result indices, e.g. the max-ts agg in
        ``SearchFeatureDao``). ``value_count`` counts non-null values,
        ``cardinality`` is EXACT distinct here (OpenSearch's is an
        approximate HLL — documented difference, same contract
        otherwise), ``stats`` returns the composite dict. Pushes the
        column projection into the docmap scan like :meth:`facets`."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        col = t[field]
        valid = t.filter(pc.is_valid(col))[field]
        if op == "value_count":
            return int(len(valid))
        if op == "cardinality":
            return int(len(pc.unique(valid)))
        if op == "stats":
            n = int(len(valid))
            if n == 0:
                return {"count": 0, "min": None, "max": None, "avg": None, "sum": 0.0}
            return {
                "count": n,
                "min": pc.min(valid).as_py(),
                "max": pc.max(valid).as_py(),
                "avg": float(pc.mean(valid).as_py()),
                "sum": float(pc.sum(valid).as_py()),
            }
        if op == "extended_stats":
            n = int(len(valid))
            if n == 0:
                return {"count": 0, "min": None, "max": None, "avg": None,
                        "sum": 0.0, "sum_of_squares": 0.0, "variance": None,
                        "std_deviation": None, "std_deviation_bounds": None}
            v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
            avg = float(v.mean())
            var = float(v.var())  # population variance, like OpenSearch
            std = float(np.sqrt(var))
            return {
                "count": n,
                "min": float(v.min()),
                "max": float(v.max()),
                "avg": avg,
                "sum": float(v.sum()),
                "sum_of_squares": float((v * v).sum()),
                "variance": var,
                "std_deviation": std,
                "std_deviation_bounds": {"upper": avg + 2 * std,
                                         "lower": avg - 2 * std},
            }
        if op in ("min", "max"):
            if len(valid) == 0:
                return None
            return (pc.min if op == "min" else pc.max)(valid).as_py()
        if op in ("avg", "sum"):
            if len(valid) == 0:
                return None if op == "avg" else 0.0
            fn = pc.mean if op == "avg" else pc.sum
            return float(fn(valid).as_py())
        raise ValueError(f"unsupported metric aggregation {op!r}")

    def histogram_agg(self, filter_query: dict | None, field: str,
                      interval: float, min_doc_count: int = 0) -> list[dict]:
        """Histogram aggregation: fixed-width buckets keyed
        ``floor(v / interval) × interval`` over the matching docs' column
        (OpenSearch semantics incl. negative values; empty buckets
        between populated ones are emitted unless ``min_doc_count`` > 0,
        matching min_doc_count=0's default gap-filling)."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        col = t[field]
        vals = t.filter(pc.is_valid(col))[field].to_numpy(zero_copy_only=False).astype(np.float64)
        if vals.size == 0:
            return []
        keys = np.floor(vals / float(interval)) * float(interval)
        uniq, counts = np.unique(keys, return_counts=True)
        if min_doc_count <= 0:
            # gap-fill empty buckets across the populated span
            full = np.arange(uniq[0], uniq[-1] + float(interval) / 2, float(interval))
            cmap = dict(zip(uniq.tolist(), counts.tolist()))
            return [{"key": float(k), "doc_count": int(cmap.get(float(k), 0))} for k in full]
        return [{"key": float(k), "doc_count": int(c)}
                for k, c in zip(uniq, counts) if c >= min_doc_count]

    def date_histogram_agg(self, filter_query: dict | None, field: str,
                           fixed_interval: str, min_doc_count: int = 0) -> list[dict]:
        """date_histogram with a ``fixed_interval`` (``"30s"``/``"5m"``/
        ``"1h"``/``"1d"`` — OpenSearch's fixed units; calendar intervals
        like ``"1M"`` are not supported and raise): epoch-ms bucket keys
        floored to the interval, the same tumbling-window rule as the
        events side (``dataStart -= dataStart % interval``)."""
        ms = _parse_fixed_interval_ms(fixed_interval)
        return self.histogram_agg(filter_query, field, float(ms),
                                  min_doc_count=min_doc_count)

    def range_agg(self, filter_query: dict | None, field: str,
                  ranges: list[dict]) -> list[dict]:
        """Range aggregation: explicit [from, to) buckets (half-open like
        OpenSearch; either bound optional), doc counts over the matching
        docs' column. Buckets may overlap — each is counted
        independently, exactly like OpenSearch."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        col = t[field]
        vals = t.filter(pc.is_valid(col))[field].to_numpy(zero_copy_only=False).astype(np.float64)
        out = []
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            mask = np.ones(vals.size, dtype=bool)
            if lo is not None:
                mask &= vals >= float(lo)
            if hi is not None:
                mask &= vals < float(hi)
            key = r.get("key") or f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            b = {"key": key, "doc_count": int(mask.sum())}
            if lo is not None:
                b["from"] = float(lo)
            if hi is not None:
                b["to"] = float(hi)
            out.append(b)
        return out

    def percentiles_agg(self, filter_query: dict | None, field: str,
                        percents=(1, 5, 25, 50, 75, 95, 99)) -> dict:
        """Percentiles aggregation over the matching docs' column —
        OpenSearch's default percents and response shape
        ({"values": {"50.0": v, …}}). EXACT (numpy linear interpolation)
        where OpenSearch serves a t-digest approximation — same contract,
        documented difference (the events-side feature aggs offer the
        mergeable t-digest variant, ``functions/sketches.py``)."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        col = t[field]
        vals = t.filter(pc.is_valid(col))[field].to_numpy(zero_copy_only=False)
        vals = vals.astype(np.float64)
        if vals.size == 0:
            return {"values": {f"{float(p)}": None for p in percents}}
        qs = np.percentile(vals, list(percents))
        return {"values": {f"{float(p)}": float(v) for p, v in zip(percents, qs)}}

    def suggest_terms(self, text: str, size: int = 5, max_edits: int = 2,
                      prefix_length: int = 1,
                      suggest_mode: str = "missing") -> list[dict]:
        """OpenSearch TERM SUGGESTER (the ``"suggest"`` envelope
        section): per analyzed token, dictionary terms within
        ``max_edits`` Levenshtein edits sharing the first
        ``prefix_length`` characters, ordered by (edit distance asc,
        doc freq desc, term asc) — OpenSearch's score-then-frequency
        default. ``suggest_mode="missing"`` (the default) suggests only
        for tokens absent from the index; ``"always"`` suggests for
        every token (the candidate never includes the token itself).
        Candidates come from the dictionary's prefix range scan, so the
        lazy 10⁹-vocab mode prunes the same row groups a prefix query
        would."""
        from .termscan import levenshtein_batch

        if suggest_mode not in ("missing", "always"):
            raise ValueError(f"unsupported suggest_mode {suggest_mode!r}")
        out = []
        for tok in self.analyzer.tokens(text):
            present = self.df(tok) > 0
            entry = {"text": tok, "options": []}
            if not (suggest_mode == "missing" and present):
                cands = [t for t in self.prefix_terms(tok[:prefix_length])
                         if t != tok]
                if cands:
                    dists = levenshtein_batch(tok, cands)
                    keep = [(int(d), c) for d, c in zip(dists, cands)
                            if d <= max_edits]
                    scored = sorted(
                        ((d, -self.df(c), c) for d, c in keep),
                    )
                    entry["options"] = [
                        {"text": c, "distance": d, "freq": -negdf}
                        for d, negdf, c in scored[:size]
                    ]
            out.append(entry)
        return out

    def percentile_ranks_agg(self, filter_query: dict | None, field: str,
                             values) -> dict:
        """percentile_ranks aggregation: for each given value, the
        percentage of the matching docs' column at or below it —
        OpenSearch's inverse-percentiles response shape
        ({"values": {"500.0": 55.1}}). EXACT where OpenSearch serves a
        t-digest approximation (same documented difference as
        :meth:`percentiles_agg`)."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        col = t[field]
        vals = t.filter(pc.is_valid(col))[field].to_numpy(zero_copy_only=False)
        vals = np.sort(vals.astype(np.float64))
        out = {}
        for v in values:
            if vals.size == 0:
                out[f"{float(v)}"] = None
            else:
                out[f"{float(v)}"] = float(
                    np.searchsorted(vals, float(v), side="right") / vals.size * 100.0
                )
        return {"values": out}

    def significant_terms_agg(self, filter_query: dict | None, field: str,
                              size: int = 10) -> list[dict]:
        """significant_terms over a keyword docmap column: terms
        overrepresented in the MATCHING docs (foreground) vs the whole
        live index (background), scored with OpenSearch's default JLH
        heuristic — (fg% − bg%) × (fg%/bg%), terms with fg% ≤ bg%
        dropped — top ``size`` by (score desc, key asc). Buckets carry
        doc_count (foreground), bg_count and score. One docmap scan and
        two Arrow value_counts serve the request."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id"] if field == "doc_id" else ["doc_id", field]
        t = self.live_docmap(columns=cols)
        bg_valid = t.filter(pc.is_valid(t[field]))
        bg_total = bg_valid.num_rows
        bg_counts = {d["values"]: d["counts"]
                     for d in pc.value_counts(bg_valid[field]).to_pylist()}
        fg = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs))) \
            if docs.size < t.num_rows else t
        fg = fg.filter(pc.is_valid(fg[field]))
        fg_total = fg.num_rows
        if fg_total == 0 or bg_total == 0:
            return []
        buckets = []
        for d in pc.value_counts(fg[field]).to_pylist():
            term, fg_n = d["values"], d["counts"]
            bg_n = bg_counts[term]  # fg ⊆ bg, always present
            fg_pct = fg_n / fg_total
            bg_pct = bg_n / bg_total
            if fg_pct <= bg_pct:
                continue  # JLH keeps only overrepresented terms
            score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
            buckets.append({"key": term, "doc_count": int(fg_n),
                            "bg_count": int(bg_n), "score": float(score)})
        buckets.sort(key=lambda b: (-b["score"], b["key"]))
        return buckets[:size]

    # -------------------------------------------------- sub-aggregations

    def _subagg_table(self, filter_query: dict | None, fields: set[str]):
        """Matching-docs docmap slice projected to ``fields`` — the shared
        scan of every bucketed sub-aggregation path (one column-pruned
        read, one membership filter)."""
        import pyarrow.compute as pc

        docs = self.execute_filter(filter_query)
        cols = ["doc_id", *sorted(f for f in fields if f != "doc_id")]
        t = self.live_docmap(columns=cols)
        if docs.size < t.num_rows:
            t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
        return t

    def _grouped_subagg_rows(self, t, plan: list[tuple[str, str, str]],
                             keys: tuple[str, ...] = ("__key",)):
        """One Arrow ``group_by(keys)`` pass computing doc_count plus
        every distinct (field, kernel) the sub-agg plan needs; returns
        the raw group rows (key columns + named aggregate columns)."""
        aggs = {("doc_id", "count")}
        for _, op, f in plan:
            for o in (("count", "min", "max", "mean", "sum")
                      if op == "stats" else (_SUB_METRIC_ARROW[op],)):
                aggs.add((f, o))
        g = t.group_by(list(keys)).aggregate(sorted(aggs))
        return g.to_pylist()

    @staticmethod
    def _subagg_values(row: dict, plan: list[tuple[str, str, str]]) -> dict:
        """Nest one group row's aggregate columns into the OpenSearch
        response shapes: single-value aggs → {"value": v} (avg/min/max of
        nothing = null, sum = 0.0, counts = 0), stats → the composite."""
        out = {}
        for name, op, f in plan:
            if op == "stats":
                n = int(row.get(f"{f}_count") or 0)
                if n == 0:
                    out[name] = {"count": 0, "min": None, "max": None,
                                 "avg": None, "sum": 0.0}
                else:
                    out[name] = {
                        "count": n,
                        "min": row[f"{f}_min"],
                        "max": row[f"{f}_max"],
                        "avg": float(row[f"{f}_mean"]),
                        "sum": float(row[f"{f}_sum"]),
                    }
            elif op == "avg":
                v = row.get(f"{f}_mean")
                out[name] = {"value": None if v is None else float(v)}
            elif op == "sum":
                v = row.get(f"{f}_sum")
                out[name] = {"value": 0.0 if v is None else float(v)}
            elif op in ("value_count", "cardinality"):
                out[name] = {"value": int(row.get(f"{f}_{_SUB_METRIC_ARROW[op]}") or 0)}
            else:  # min / max keep the column's own type
                out[name] = {"value": row.get(f"{f}_{op}")}
        return out

    def terms_agg_subs(self, filter_query: dict | None, field: str,
                       size: int, sub_aggs: dict,
                       order: dict | None = None) -> list[dict]:
        """Terms aggregation with nested METRIC SUB-AGGREGATIONS — the
        reference's central agg composition (a terms/composite bucket per
        entity wrapping per-feature metric aggs, the shape
        ``AbstractRetriever.parseBucket`` consumes and ParseUtils
        generates): top-``size`` buckets, each carrying its nested
        metric values keyed by sub-agg name. ``order`` follows
        OpenSearch terms-agg ordering: ``{"_count": "desc"}`` (default),
        ``{"_key": "asc"}``, a sub-agg name, or a dotted
        ``"name.avg"`` path into a stats sub-agg; (key asc) breaks
        ties. One column-pruned scan + one Arrow group_by for ALL
        metrics."""
        import pyarrow.compute as pc

        top_hits = {n: s["top_hits"] for n, s in sub_aggs.items()
                    if isinstance(s, dict) and "top_hits" in s}
        metrics = {n: s for n, s in sub_aggs.items() if n not in top_hits}
        plan = _sub_agg_plan(metrics)
        th_fields = {f for th in top_hits.values()
                     for f, _ in _parse_sort_keys(th.get("sort"))}
        t = self._subagg_table(
            filter_query, {field, *(f for _, _, f in plan), *th_fields})
        t = t.filter(pc.is_valid(t[field]))
        t = t.append_column("__key", t[field])
        rows = self._grouped_subagg_rows(t, plan)
        buckets = [{"key": r["__key"], "doc_count": int(r["doc_id_count"]),
                    **self._subagg_values(r, plan)} for r in rows]
        buckets.sort(key=_terms_order_key(order, plan))
        buckets = buckets[:size]
        if top_hits:
            self._attach_top_hits(t, field, buckets, top_hits)
        return buckets

    @staticmethod
    def _attach_top_hits(t, field: str, buckets: list[dict],
                         top_hits: dict[str, dict]) -> None:
        """Restricted ``top_hits`` sub-aggregation: the top-N docs of
        each bucket by a FIELD sort (missing-last, doc_id tie-break; no
        sort → doc_id asc, the score-less filter-context order). One
        pandas sort + groupby-head serves all buckets."""
        import pandas as pd  # noqa: F401 (to_pandas())

        df_all = t.to_pandas()
        keys = {b["key"] for b in buckets}
        df_all = df_all[df_all["__key"].isin(keys)]
        for name, th in top_hits.items():
            n = int(th.get("size", 3))
            sort_keys = _parse_sort_keys(th.get("sort"))
            by = [f for f, _ in sort_keys] + ["doc_id"]
            asc = [a for _, a in sort_keys] + [True]
            d = df_all.sort_values(by=by, ascending=asc,
                                   na_position="last", kind="mergesort")
            groups = d.groupby("__key", sort=False)
            per_key: dict = {}
            for key, g in groups:
                hits = []
                for rec in g.head(n).to_dict("records"):
                    h = {"_id": int(rec["doc_id"])}
                    if sort_keys:
                        h["sort"] = [
                            None if pd_isna(rec[f]) else _py_scalar(rec[f])
                            for f, _ in sort_keys
                        ]
                    hits.append(h)
                per_key[key] = hits
            for b in buckets:
                b[name] = {"hits": {
                    "total": {"value": b["doc_count"], "relation": "eq"},
                    "hits": per_key.get(b["key"], []),
                }}

    def histogram_agg_subs(self, filter_query: dict | None, field: str,
                           interval: float, sub_aggs: dict,
                           min_doc_count: int = 0) -> list[dict]:
        """Histogram buckets (same keying/gap-fill rules as
        :meth:`histogram_agg`) with nested metric sub-aggregations; empty
        gap-filled buckets carry the empty-set metric values."""
        import pyarrow.compute as pc

        plan = _sub_agg_plan(sub_aggs)
        t = self._subagg_table(filter_query, {field, *(f for _, _, f in plan)})
        t = t.filter(pc.is_valid(t[field]))
        if t.num_rows == 0:
            return []
        vals = t[field].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = np.floor(vals / float(interval)) * float(interval)
        t = t.append_column("__key", pa.array(keys))
        rows = self._grouped_subagg_rows(t, plan)
        by_key = {float(r["__key"]): r for r in rows}
        ks = sorted(by_key)
        if min_doc_count <= 0:
            full = np.arange(ks[0], ks[-1] + float(interval) / 2, float(interval))
            empty = self._subagg_values({}, plan)
            return [
                {"key": float(k), "doc_count": int(by_key[float(k)]["doc_id_count"]),
                 **self._subagg_values(by_key[float(k)], plan)}
                if float(k) in by_key else
                {"key": float(k), "doc_count": 0, **empty}
                for k in full
            ]
        return [{"key": k, "doc_count": int(by_key[k]["doc_id_count"]),
                 **self._subagg_values(by_key[k], plan)}
                for k in ks if by_key[k]["doc_id_count"] >= min_doc_count]

    def calendar_histogram_agg(self, filter_query: dict | None, field: str,
                               calendar_interval: str, min_doc_count: int = 0,
                               sub_aggs: dict | None = None) -> list[dict]:
        """date_histogram with a CALENDAR interval (week/month/quarter/
        year — variable-width UTC calendar buckets, which modulo
        arithmetic can't express; OpenSearch's ``calendar_interval``).
        Bucket keys are the epoch-ms calendar floor; gap-fill enumerates
        calendar boundaries (min_doc_count=0 default). Metric sub-aggs
        ride the same single Arrow group_by."""
        import pyarrow.compute as pc

        from ..stages.window import calendar_floor_ms

        plan = _sub_agg_plan(sub_aggs or {})
        t = self._subagg_table(filter_query, {field, *(f for _, _, f in plan)})
        t = t.filter(pc.is_valid(t[field]))
        if t.num_rows == 0:
            return []
        vals = t[field].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, _ = calendar_floor_ms(vals, calendar_interval)
        t = t.append_column("__key", pa.array(keys))
        rows = self._grouped_subagg_rows(t, plan)
        by_key = {int(r["__key"]): r for r in rows}
        ks = sorted(by_key)
        if min_doc_count <= 0:
            empty = self._subagg_values({}, plan)
            return [
                {"key": int(k), "doc_count": int(by_key[k]["doc_id_count"]),
                 **self._subagg_values(by_key[k], plan)}
                if k in by_key else {"key": int(k), "doc_count": 0, **empty}
                for k in _calendar_boundaries(ks[0], ks[-1], calendar_interval)
            ]
        return [{"key": k, "doc_count": int(by_key[k]["doc_id_count"]),
                 **self._subagg_values(by_key[k], plan)}
                for k in ks if by_key[k]["doc_id_count"] >= min_doc_count]

    def composite_agg(self, filter_query: dict | None, sources: list[dict],
                      size: int = 10, after: dict | None = None,
                      sub_aggs: dict | None = None) -> dict:
        """Composite aggregation with after-key pagination — THE agg the
        reference drives HC detection with (``CompositeRetriever`` pages
        (entity…) buckets with per-feature metric sub-aggs,
        ``CompositeAggregationBuilder`` + afterKey). ``sources`` is the
        OpenSearch list-of-single-source-terms shape
        ``[{name: {"terms": {"field": f}}}, …]``; buckets come back in
        the total (source₁, source₂, …) ascending key order, ``after``
        resumes strictly past that key, and the response carries
        ``after_key`` = the last returned bucket's key (absent on the
        final page, like OpenSearch). Missing-value rows drop out
        (missing_bucket=false default). One pruned scan + one Arrow
        group_by serves every page request."""
        import pyarrow.compute as pc

        if not sources:
            raise ValueError("composite needs at least one source")
        names, fields = [], []
        for s in sources:
            ((name, spec),) = s.items()
            if "terms" not in spec:
                raise ValueError("composite sources support terms on a docmap column")
            names.append(name)
            fields.append(spec["terms"]["field"])
        plan = _sub_agg_plan(sub_aggs or {})
        t = self._subagg_table(filter_query, {*fields, *(f for _, _, f in plan)})
        for f in fields:
            t = t.filter(pc.is_valid(t[f]))
        rows = self._grouped_subagg_rows(t, plan, keys=tuple(fields))

        def key_tuple(r):
            return tuple(r[f] for f in fields)

        rows.sort(key=key_tuple)
        if after is not None:
            cursor = tuple(after[n] for n in names)
            rows = [r for r in rows if key_tuple(r) > cursor]
        page = rows[:size]
        buckets = []
        for r in page:
            kt = key_tuple(r)
            buckets.append({"key": dict(zip(names, kt)),
                            "doc_count": int(r["doc_id_count"]),
                            **self._subagg_values(r, plan)})
        out = {"buckets": buckets}
        if buckets and len(rows) > size:
            out["after_key"] = dict(buckets[-1]["key"])
        return out

    def range_agg_subs(self, filter_query: dict | None, field: str,
                       ranges: list[dict], sub_aggs: dict) -> list[dict]:
        """Range buckets ([from, to) half-open, overlap allowed) with
        nested metric sub-aggregations — each bucket aggregates its own
        row mask independently, exactly like OpenSearch."""
        import pyarrow.compute as pc

        plan = _sub_agg_plan(sub_aggs)
        t = self._subagg_table(filter_query, {field, *(f for _, _, f in plan)})
        t = t.filter(pc.is_valid(t[field]))
        vals = t[field].to_numpy(zero_copy_only=False).astype(np.float64)
        out = []
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            mask = np.ones(vals.size, dtype=bool)
            if lo is not None:
                mask &= vals >= float(lo)
            if hi is not None:
                mask &= vals < float(hi)
            sub = t.filter(pa.array(mask)).append_column(
                "__key", pa.array(np.zeros(int(mask.sum()), dtype=np.int64)))
            rows = self._grouped_subagg_rows(sub, plan)
            row = rows[0] if rows else {}
            key = r.get("key") or f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            b = {"key": key, "doc_count": int(mask.sum()),
                 **self._subagg_values(row, plan)}
            if lo is not None:
                b["from"] = float(lo)
            if hi is not None:
                b["to"] = float(hi)
            out.append(b)
        return out

    def bm25_search_after(
        self, query: str, k: int = 10, search_after: tuple[int, float] | None = None
    ) -> list[tuple[int, float]]:
        """Deep pagination (OpenSearch ``search_after``): the next ``k``
        hits strictly after the cursor — the previous page's LAST HIT
        ``(doc_id, score)``, exactly as pages return them — in (score
        desc, doc_id asc) order. Page boundaries are exact because the
        sort key is total: paging through every hit reproduces the full
        ranking (tested). Uses the exact scoring path — pruning cannot
        bound a page that starts below the global top-k, the same reason
        OpenSearch charges deep pagination linearly."""
        uniq, scores = self.bm25_scores(query)
        if uniq.size == 0:
            return []
        if search_after is not None:
            after_doc, after_score = int(search_after[0]), float(search_after[1])
            keep = (scores < after_score) | (
                (scores == after_score) & (uniq > after_doc)
            )
            uniq, scores = uniq[keep], scores[keep]
        return _topk_with_ties(uniq, scores, k)

    def bm25_topk_filtered(self, query: str, filter_query: dict | None, k: int = 10) -> list[tuple[int, float]]:
        """BM25 top-k restricted to filter_query matches — the composed
        shape of generateInternalFeatureQuery (ParseUtils.java:314-331):
        bool(filter_query ∧ ...) wrapping the scored part."""
        if not filter_query or "match_all" in filter_query:
            return self.bm25_topk(query, k=k)
        allowed = self.execute_filter(filter_query)
        terms = self.query_terms(query)
        if allowed.size == 0:
            return []
        docs_parts, imp_parts = [], []
        for t in terms:
            docs_t, tfs_t, dls_t = self.term_arrays(t)
            if docs_t.size == 0:
                continue
            wt = float(bm25_idf(self.df(t), self.n_docs))
            docs_parts.append(docs_t)
            imp_parts.append(wt * tf_norm(tfs_t, dls_t, self.avgdl))
        if not docs_parts:
            return []
        docs = np.concatenate(docs_parts)
        imps = np.concatenate(imp_parts)
        keep = np.isin(docs, allowed)
        docs, imps = docs[keep], imps[keep]
        if docs.size == 0:
            return []
        uniq, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(uniq.size)
        np.add.at(scores, inv, imps)
        return _topk_with_ties(uniq, scores, k)


def _match_text_and_default(body: dict) -> tuple[str, bool]:
    """Text of a ``match`` clause + whether it uses the DEFAULT operator
    semantics (operator=or, minimum_should_match absent/≤1). Long-form
    options change the HIT SET, not the per-doc BM25 score — ``boost``
    (handled by :func:`_match_boost`) changes neither. Percentage msm
    values ("75%") are valid OpenSearch requests — they classify as
    non-default here and are evaluated by filter context (queryast's
    parse_msm), never crashed on."""
    ((_f, spec),) = body.items()
    text = spec["query"] if isinstance(spec, dict) else str(spec)
    if not isinstance(spec, dict):
        return text, True
    msm = spec.get("minimum_should_match", 1)
    try:
        msm_default = int(msm) <= 1  # ints and plain "N" strings
    except (TypeError, ValueError):
        msm_default = False  # "75%" and friends → filter context decides
    return text, (spec.get("operator", "or") == "or" and msm_default)


def _match_boost(body: dict) -> float:
    """Long-form ``boost`` of a match clause (Lucene multiplies the
    clause's score by it; hit sets are unaffected)."""
    ((_f, spec),) = body.items()
    return float(spec.get("boost", 1.0)) if isinstance(spec, dict) else 1.0


def _split_scoring_clause(query: dict | None) -> tuple[str | None, dict | None]:
    """Separate the SCORING part of an OpenSearch-shaped query from its
    filter-context remainder: a top-level ``match`` (or a bool whose
    ``must`` contains exactly one match) scores with BM25; everything
    else stays a filter. The composed bool(filter… ∧ must match) shape is
    exactly what the reference's ParseUtils generates
    (``ParseUtils.java:314-331``).

    A match with ``operator=and`` / ``minimum_should_match`` still scores
    with BM25 (docs matching all/enough terms have identical OR-sum and
    AND-sum scores — the non-matching terms contribute 0), but the HIT
    SET shrinks, so the clause itself stays in the filter-context
    residual: the scored page and ``hits.total`` are intersected with its
    conjunctive/msm semantics instead of silently widening to the OR
    match.

    Returns ``(required_text, optional_clauses, residual,
    union_defines_hits, text_boost)`` — ``text_boost`` is the required
    match's long-form ``boost`` (scores scale by it; hit sets don't):
    ``optional_clauses`` are scorable ``should`` clauses — they
    contribute ADDITIVE scores (Lucene's BooleanQuery sums every
    matching clause's score) but never define the hit set when a
    ``must``/filter is present (OpenSearch's msm-defaults-to-0 rule; the
    repo's queryast applies the same rule in filter context). A bool of
    ONLY scorable shoulds has no required text: the hit set is their
    union. Each entry is tagged: ``("match", text, constraint, boost)``
    scores additive BM25 × boost over the text (``constraint`` = the
    clause itself when operator/msm shrink its matching set),
    ``("leaf", clause)`` is a
    non-match leaf scored by :func:`_leaf_should_scores` (term → BM25 /
    norms-off idf; multi-term and set queries → Lucene's constant-score
    rewrite, 1.0). A should list containing any UNscorable clause
    (phrase, nested bool) falls back to filter context for the whole
    list — hit sets stay right, those scores read 1.0."""
    if not query:
        return None, [], None, False, 1.0
    ((kind, body),) = query.items()
    if kind == "match":
        text, default = _match_text_and_default(body)
        return text, [], (None if default else dict(query)), False, _match_boost(body)
    if kind == "bool":
        musts = list(body.get("must", []))
        scoring = [m for m in musts if isinstance(m, dict) and "match" in m]
        shoulds = list(body.get("should", []))
        # tag every scorable should clause; None marks an unscorable one
        optional: list[tuple] = []
        all_scorable = True
        for s in shoulds:
            if not isinstance(s, dict) or len(s) != 1:
                all_scorable = False
                continue
            (s_kind,) = s.keys()
            if s_kind == "match":
                txt, default = _match_text_and_default(s["match"])
                optional.append(("match", txt, None if default else s,
                                 _match_boost(s["match"])))
            elif s_kind in _LEAF_SHOULD_KINDS:
                optional.append(("leaf", s))
            else:
                all_scorable = False
        msm_explicit = body.get("minimum_should_match") is not None
        if msm_explicit:
            # an explicit bool-level msm makes shoulds hit-set-defining —
            # leave them entirely to filter context, no additive scoring
            optional = []
        if len(scoring) == 1:
            text, default = _match_text_and_default(scoring[0]["match"])
            boost = _match_boost(scoring[0]["match"])
            residual = {k: v for k, v in body.items()}
            if default:
                # default-operator match: lift it out of the residual
                residual["must"] = [m for m in musts if m is not scoring[0]]
                if not residual["must"]:
                    residual.pop("must")
                if shoulds and not msm_explicit:
                    # with a must present, shoulds are scoring-only
                    # (OpenSearch msm-defaults-to-0); once the must is
                    # lifted the residual bool would reinterpret them as
                    # a required union — drop them (scores ride
                    # ``optional``)
                    residual.pop("should", None)
            # else: the match stays in the residual's must — filter
            # context applies its operator/msm while its text scores,
            # and the residual's must keeps its shoulds scoring-only
            return text, optional, ({"bool": residual} if residual else None), False, boost
        if not scoring and not msm_explicit and optional and all_scorable:
            # should-only bool of scorable clauses, no scoring must.
            # OpenSearch's msm default: 1 when the bool has no
            # must/filter (the union IS the hit set), 0 otherwise
            # (shoulds are scoring-only and the residual alone defines
            # the hits).
            union_hits = not (body.get("must") or body.get("filter"))
            residual = {k: v for k, v in body.items() if k != "should"}
            return None, optional, ({"bool": residual} if residual else None), union_hits, 1.0
    return None, [], query, False, 1.0


# should-context leaf kinds with a Lucene-defined score: term (BM25 on
# the text field / norms-off idf on keyword), constant_score (its
# boost), everything else a constant-score rewrite (MultiTermQuery
# CONSTANT_SCORE_REWRITE, TermInSetQuery, ids, range, exists → 1.0).
# match_phrase is deliberately absent: PhraseQuery scores by phrase
# frequency, which this engine doesn't track — those stay in filter
# context rather than score wrong.
_LEAF_SHOULD_KINDS = {"term", "terms", "prefix", "wildcard", "regexp",
                      "fuzzy", "range", "exists", "ids", "constant_score"}


def _leaf_should_scores(engine: QueryEngine, clause: dict) -> tuple[np.ndarray, np.ndarray]:
    """(matching docs, per-doc scores) of a non-match should clause,
    following Lucene's query-context scoring:

    - ``term`` on the indexed TEXT field = a TermQuery: full BM25
      (idf × tf_norm) with the engine's stale-stats df, exactly like a
      one-term match.
    - ``term`` on a keyword (docmap) column: keyword fields omit norms,
      so Lucene's BM25 collapses to idf — freq=1 and dl=avgdl=1 make
      tf_norm exactly 1 in the (k1+1) convention (BM25Similarity with
      norms omitted decodes dl=1). df is the LIVE matching count (the
      docmap is tombstone-filtered), N stays manifest n_docs for
      consistency with text idf's stale-stats semantics.
    - every other kind (terms/prefix/wildcard/regexp/fuzzy/range/exists):
      Lucene rewrites these to constant score 1.0 per matching doc
      (MultiTermQuery CONSTANT_SCORE_REWRITE — OpenSearch's default
      ``rewrite``)."""
    ((kind, body),) = clause.items()
    if kind == "term":
        ((field, value),) = body.items()
        if getattr(engine, "_compiler", None) is None:
            from .queryast import QueryCompiler

            engine._compiler = QueryCompiler(engine)
        if not engine._compiler._is_meta_field(field):
            docs, tfs, dls = engine.term_arrays(str(value))
            if docs.size == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
            w = float(bm25_idf(engine.df(str(value)), engine.n_docs))
            return docs, w * tf_norm(tfs, dls, engine.avgdl)
        docs = engine.execute_filter(clause)
        w = float(bm25_idf(int(docs.size), engine.n_docs)) if docs.size else 0.0
        return docs, np.full(docs.size, w, dtype=np.float64)
    docs = engine.execute_filter(clause)
    w = float(body.get("boost", 1.0)) if kind == "constant_score" else 1.0
    return docs, np.full(docs.size, w, dtype=np.float64)


def _bm25_scores_multi(
    engine: QueryEngine, clauses: list[tuple]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Additive scoring over independent should/must clauses — Lucene's
    BooleanQuery sums every matching clause's score, so a term repeated
    across clauses counts once PER CLAUSE (a single concatenated query
    would dedupe it). Each clause is tagged (see
    :func:`_split_scoring_clause`): ``("match", text, constraint)``
    scores BM25 over the text — a non-default match (operator=and / msm)
    only scores, and only matches, on the docs satisfying its own
    filter-context semantics; ``("leaf", clause)`` scores through
    :func:`_leaf_should_scores`. Returns (sorted doc_ids, summed scores,
    union of per-clause matching doc sets) — the union IS the hit set of
    a should-only bool, so callers never re-decode postings to count
    hits."""
    docs_parts, score_parts = [], []
    for entry in clauses:
        if entry[0] == "leaf":
            d, s = _leaf_should_scores(engine, entry[1])
        else:
            _, text, clause, boost = entry
            d, s = engine.bm25_scores(text)
            if boost != 1.0:
                s = s * boost
            if clause is not None:
                allowed = engine.execute_filter(clause)
                keep = np.isin(d, allowed, assume_unique=True)
                d, s = d[keep], s[keep]
        if d.size:
            docs_parts.append(d)
            score_parts.append(s)
    if not docs_parts:
        empty = np.empty(0, dtype=np.int64)
        return empty, np.empty(0, dtype=np.float64), empty
    docs = np.concatenate(docs_parts)
    sc = np.concatenate(score_parts)
    uniq, inv = np.unique(docs, return_inverse=True)
    out = np.zeros(uniq.size)
    np.add.at(out, inv, sc)
    # each part is exactly its clause's matching set, so uniq is the
    # union of per-clause hits
    return uniq, out, uniq


def _parse_fixed_interval_ms(s: str) -> int:
    """OpenSearch fixed_interval units → milliseconds (ms/s/m/h/d; the
    calendar units y/M/w/q need calendar arithmetic and raise)."""
    import re

    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", s.strip())
    if not m:
        raise ValueError(
            f"unsupported fixed_interval {s!r} (use <n>ms|s|m|h|d; "
            "calendar intervals are not supported)"
        )
    mult = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}
    return int(m.group(1)) * mult[m.group(2)]


def _dis_max_scores(engine: QueryEngine, spec: dict) -> tuple[np.ndarray, np.ndarray]:
    """Lucene DisjunctionMaxQuery scoring: per doc, the BEST sub-query
    score plus ``tie_breaker`` × the sum of the others. Sub-queries score
    like should clauses (match = BM25, constraint-masked for
    operator/msm; leaf kinds per :func:`_leaf_should_scores`); an
    unscorable sub-query (phrase, nested bool) raises rather than score
    wrong. Returns (sorted matching docs — the union, per-doc scores)."""
    tie = float(spec.get("tie_breaker", 0.0))
    docs_parts, score_parts = [], []
    for c in spec.get("queries", []):
        ((k, _b),) = c.items()
        if k == "match":
            txt, default = _match_text_and_default(c["match"])
            d, s = engine.bm25_scores(txt)
            b = _match_boost(c["match"])
            if b != 1.0:
                s = s * b
            if not default:
                allowed = engine.execute_filter(c)
                keep = np.isin(d, allowed, assume_unique=True)
                d, s = d[keep], s[keep]
        elif k in _LEAF_SHOULD_KINDS:
            d, s = _leaf_should_scores(engine, c)
        else:
            raise ValueError(f"dis_max cannot score sub-query kind {k!r}")
        if d.size:
            docs_parts.append(d)
            score_parts.append(s)
    if not docs_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(docs_parts)
    sc = np.concatenate(score_parts)
    uniq, inv = np.unique(docs, return_inverse=True)
    total = np.zeros(uniq.size, dtype=np.float64)
    best = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(total, inv, sc)
    np.maximum.at(best, inv, sc)
    return uniq.astype(np.int64), best + tie * (total - best)


def search(engine: QueryEngine, body: dict, source_files: list[str] | None = None,
           text_col: str = "content") -> dict:
    """OpenSearch ``_search``-shaped request → response envelope — the
    composed surface a user of the reference actually exchanges:

        {"query": …, "size": k, "from": n, "search_after": [score, id],
         "aggs": {name: {"terms": {"field": f, "size": s}}},
         "highlight": {"fields": {…}}}

    →   {"hits": {"total": {"value": n, "relation": "eq"},
                  "hits": [{"_id", "_score", "_source", "highlight"?}]},
         "aggregations": {name: {"buckets": [{"key", "doc_count"}]}}}

    Query context: a top-level ``match`` (or single bool-must match)
    scores with BM25 over the residual filter (``bm25_topk_filtered``);
    pure filter context returns constant score 1.0 in doc_id order
    (OpenSearch's filter/constant_score behavior). ``aggs`` = terms
    facets over the full matching set (not just the page), like
    OpenSearch. ``highlight`` needs ``source_files`` — this index stores
    metadata + lineage hashes in the docmap, not the text, so snippets
    read exactly the hit rows back from the source parquet (predicate
    pushdown), trading _source storage for corpus-scale index size."""
    import pyarrow.compute as pc

    size = int(body.get("size", 10))
    frm = int(body.get("from", 0))
    if frm > 0 and body.get("search_after") is not None:
        # OpenSearch rejects from>0 combined with search_after — a
        # malformed request must error, not return a silently-wrong page
        raise ValueError("`from` parameter must be set to 0 when `search_after` is used")
    if body.get("sort"):
        if body.get("search_after") is not None:
            raise ValueError("field sort with search_after is not supported; "
                             "page with from/size")
        return _search_sorted(engine, body, source_files=source_files,
                              text_col=text_col)
    query = body.get("query")
    if query and next(iter(query)) in ("query_string", "simple_query_string"):
        # Lucene string syntax lowers to the structured DSL first, so
        # scoring/aggs/pagination ride the existing bool machinery
        from .querystring import lower_query_string

        query = lower_query_string(engine, query)
        body = {**body, "query": query}
    text, optional, residual, union_hits, text_boost = _split_scoring_clause(query)
    if text_boost <= 0:
        # Lucene requires a positive boost; a non-positive one would
        # invalidate the scale-invariant ranking shortcuts below
        raise ValueError(f"boost must be positive, got {text_boost}")

    if body.get("collapse") is not None:
        if body.get("search_after") is not None:
            raise ValueError("collapse with search_after is not supported")
        kind0 = next(iter(query)) if query else None
        if text is None or optional or kind0 == "dis_max":
            raise ValueError("collapse supports single-match (optionally "
                             "filtered) queries")
    if query and next(iter(query)) == "dis_max":
        # Lucene DisjunctionMaxQuery: hit set = union of sub-queries,
        # score = best + tie_breaker × rest (text/optional are already
        # None/[] — the splitter treats dis_max as pure residual)
        if body.get("search_after") is not None:
            raise ValueError("search_after supports pure match queries")
        docs_d, sc_d = _dis_max_scores(engine, query["dis_max"])
        page = _topk_with_ties(docs_d, sc_d, frm + size)[frm:]
        total = int(docs_d.size)
        hits = [{"_id": int(d), "_score": float(s)} for d, s in page]
    elif text is not None or optional:
        if body.get("search_after") is not None:
            if residual is not None or optional:
                raise ValueError("search_after supports pure match queries")
            sa = body["search_after"]
            # boost scales scores uniformly, so the unboosted cursor is
            # the request cursor ÷ boost and page scores scale back up
            page = engine.bm25_search_after(
                text, k=size, search_after=(int(sa[1]), float(sa[0]) / text_boost))
            if text_boost != 1.0:
                page = [(d, s * text_boost) for d, s in page]
            matched = engine.union_docs(engine.query_terms(text))
            total = int(matched.size)
        elif not optional:
            collapse = body.get("collapse")
            if collapse:
                page = _collapse_page(engine, text, residual,
                                      collapse["field"], frm, size)
            elif residual is None:
                page = engine.bm25_topk(text, k=frm + size, prune=False)[frm:]
            else:
                page = engine.bm25_topk_filtered(text, residual, k=frm + size)[frm:]
            if text_boost != 1.0:
                # positive scale: ranking unchanged, reported _score scales
                page = [(d, s * text_boost) for d, s in page]
            # total = |docs matching any query term| ∧ filter
            # (OpenSearch's hit count for an OR match)
            matched = engine.union_docs(engine.query_terms(text))
            if residual is not None:
                allowed = engine.execute_filter(residual)
                matched = matched[np.isin(matched, allowed, assume_unique=True)]
            total = int(matched.size)
        else:
            # additive should scoring (BooleanQuery sum). The HIT SET:
            # the must match if present; else the should union when the
            # bool has no must/filter (msm default 1); else the residual
            # alone (shoulds scoring-only, msm default 0).
            docs_u, scores_u, hit_union = _bm25_scores_multi(
                engine,
                ([("match", text, None, text_boost)] if text is not None else [])
                + optional,
            )
            if text is not None:
                hitset = engine.union_docs(engine.query_terms(text))
            elif union_hits:
                hitset = hit_union  # per-clause union, already decoded
            else:
                hitset = None
            if residual is not None:
                allowed = engine.execute_filter(residual)
                hitset = allowed if hitset is None else \
                    hitset[np.isin(hitset, allowed, assume_unique=True)]
            if hitset is None:  # defensive: split() never produces this
                hitset = docs_u
            # score each hit (docs matching only scoring-optional clauses
            # outside the hit set never page; hits matching no scoring
            # term rank last at 0.0, doc-id order)
            if docs_u.size:
                idx = np.minimum(np.searchsorted(docs_u, hitset), docs_u.size - 1)
                sc = np.where(docs_u[idx] == hitset, scores_u[idx], 0.0)
            else:
                sc = np.zeros(hitset.size)
            page = _topk_with_ties(hitset, sc, frm + size)[frm:]
            total = int(hitset.size)
        hits = [{"_id": int(d), "_score": float(s)} for d, s in page]  # exact: search_after cursors need the unrounded sort value
    else:
        docs = engine.execute_filter(query)
        total = int(docs.size)
        # pure filter context scores 1.0 in doc order; a top-level
        # constant_score wrapper scores its boost instead
        const = 1.0
        if query and next(iter(query)) == "constant_score":
            const = float(query["constant_score"].get("boost", 1.0))
        hits = [{"_id": int(d), "_score": const} for d in docs[frm:frm + size]]

    _attach_source(engine, hits)

    if body.get("highlight") and text is not None:
        if not source_files:
            raise ValueError("highlight needs source_files (text is not stored in the index)")
        from ..stages.highlight import snippets_for_hits

        snips = snippets_for_hits(
            engine, source_files, text,
            [(h["_id"], h["_score"]) for h in hits], text_col=text_col,
        )
        for h, s in zip(hits, snips):
            h["highlight"] = {text_col: [s["snippet"]]}

    out = {"hits": {"total": {"value": total, "relation": "eq"}, "hits": hits}}
    _apply_aggs(engine, body, query, out)
    _apply_suggest(engine, body, out)
    return out


def _apply_suggest(engine: QueryEngine, body: dict, out: dict) -> None:
    """The ``"suggest"`` envelope section: named term suggesters
    ({name: {"text": …, "term": {…}}}) → {name: [per-token entries]}."""
    suggest = body.get("suggest")
    if not suggest:
        return
    out["suggest"] = {}
    for name, spec in suggest.items():
        term = spec.get("term")
        if term is None:
            raise ValueError(f"suggester {name!r}: only the term suggester is supported")
        out["suggest"][name] = engine.suggest_terms(
            str(spec["text"]),
            size=int(term.get("size", 5)),
            max_edits=int(term.get("max_edits", 2)),
            prefix_length=int(term.get("prefix_length", 1)),
            suggest_mode=term.get("suggest_mode", "missing"),
        )


def _attach_source(engine: QueryEngine, hits: list[dict]) -> None:
    """_source from the docmap (metadata + lineage hash; text lives in
    the source parquet by design)."""
    import pyarrow.compute as pc

    if hits and engine._docmap is not None:
        ids = [h["_id"] for h in hits]
        t = engine.live_docmap(filter=pc.field("doc_id").isin(ids))
        rows = {r["doc_id"]: r for r in t.to_pylist()}
        for h in hits:
            src = dict(rows.get(h["_id"], {}))
            src.pop("doc_id", None)
            h["_source"] = src


def _apply_aggs(engine: QueryEngine, body: dict, query: dict | None, out: dict) -> None:
    aggs = body.get("aggs") or body.get("aggregations")
    if aggs:
        out["aggregations"] = {}
        metric_ops = {"min", "max", "avg", "sum", "value_count", "cardinality",
                      "stats", "extended_stats"}
        for name, spec in aggs.items():
            sub = spec.get("aggs") or spec.get("aggregations")
            if "terms" in spec:
                field = spec["terms"]["field"]
                k = int(spec["terms"].get("size", 10))
                torder = spec["terms"].get("order")
                if sub or torder:
                    out["aggregations"][name] = {
                        "buckets": engine.terms_agg_subs(query, field, k,
                                                         sub or {}, order=torder)}
                    continue
                buckets = engine.facets(query, field, k=k)
                out["aggregations"][name] = {
                    "buckets": [{"key": v, "doc_count": c} for v, c in buckets]
                }
                continue
            if "percentiles" in spec:
                p_spec = spec["percentiles"]
                out["aggregations"][name] = engine.percentiles_agg(
                    query, p_spec["field"],
                    percents=tuple(p_spec.get("percents", (1, 5, 25, 50, 75, 95, 99))),
                )
                continue
            if "percentile_ranks" in spec:
                pr = spec["percentile_ranks"]
                out["aggregations"][name] = engine.percentile_ranks_agg(
                    query, pr["field"], list(pr["values"]))
                continue
            if "significant_terms" in spec:
                sg = spec["significant_terms"]
                out["aggregations"][name] = {"buckets": engine.significant_terms_agg(
                    query, sg["field"], size=int(sg.get("size", 10)))}
                continue
            if "histogram" in spec:
                h = spec["histogram"]
                mdc = int(h.get("min_doc_count", 0))
                out["aggregations"][name] = {"buckets": (
                    engine.histogram_agg_subs(
                        query, h["field"], float(h["interval"]), sub,
                        min_doc_count=mdc)
                    if sub else engine.histogram_agg(
                        query, h["field"], float(h["interval"]),
                        min_doc_count=mdc))}
                continue
            if "range" in spec:
                r = spec["range"]
                out["aggregations"][name] = {"buckets": (
                    engine.range_agg_subs(query, r["field"], list(r["ranges"]), sub)
                    if sub else
                    engine.range_agg(query, r["field"], list(r["ranges"])))}
                continue
            if "composite" in spec:
                c = spec["composite"]
                out["aggregations"][name] = engine.composite_agg(
                    query, list(c.get("sources", ())),
                    size=int(c.get("size", 10)),
                    after=c.get("after"), sub_aggs=sub)
                continue
            if "filters" in spec:
                # named filter buckets: each inner query intersects the
                # main matching set independently (OpenSearch's filters
                # agg; buckets keep the request's key order)
                named = spec["filters"]["filters"]
                matched = engine.execute_filter(query)
                buckets = {}
                for key, fq in named.items():
                    docs = engine.execute_filter(fq)
                    buckets[key] = {"doc_count": int(
                        np.intersect1d(matched, docs, assume_unique=True).size)}
                out["aggregations"][name] = {"buckets": buckets}
                continue
            if "date_histogram" in spec:
                dh = spec["date_histogram"]
                mdc = int(dh.get("min_doc_count", 0))
                if "calendar_interval" in dh:
                    out["aggregations"][name] = {
                        "buckets": engine.calendar_histogram_agg(
                            query, dh["field"], dh["calendar_interval"],
                            min_doc_count=mdc, sub_aggs=sub)}
                    continue
                ms = float(_parse_fixed_interval_ms(dh["fixed_interval"]))
                out["aggregations"][name] = {"buckets": (
                    engine.histogram_agg_subs(query, dh["field"], ms, sub,
                                              min_doc_count=mdc)
                    if sub else engine.date_histogram_agg(
                        query, dh["field"], dh["fixed_interval"],
                        min_doc_count=mdc))}
                continue
            op = next((o for o in metric_ops if o in spec), None)
            if op is None:
                raise ValueError(
                    f"unsupported aggregation {list(spec)} "
                    f"(terms, percentiles or {sorted(metric_ops)})"
                )
            v = engine.metric_agg(query, spec[op]["field"], op)
            out["aggregations"][name] = (
                v if op in ("stats", "extended_stats") else {"value": v})


def _collapse_page(engine: QueryEngine, text: str, residual: dict | None,
                   field: str, frm: int, size: int) -> list[tuple[int, float]]:
    """Field collapsing (OpenSearch ``collapse``): the BM25 ranking with
    only the BEST-scoring doc of each ``field`` value kept (first in
    (score desc, doc_id asc) order; null values form one group), then
    from/size paged. ``hits.total`` stays the UNCOLLAPSED count, like
    OpenSearch. Charges linearly in the matching-set size — collapse
    cannot be pruned, same as the engine it mirrors."""
    import pandas as pd
    import pyarrow.compute as pc

    uniq, sc = engine.bm25_scores(text)
    if residual is not None:
        allowed = engine.execute_filter(residual)
        keep = np.isin(uniq, allowed, assume_unique=True)
        uniq, sc = uniq[keep], sc[keep]
    if uniq.size == 0:
        return []
    t = engine.live_docmap(columns=["doc_id", field])
    t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(uniq)))
    dmap = t.to_pandas().set_index("doc_id")[field]
    order = np.lexsort((uniq, -sc))
    vals = dmap.reindex(uniq[order])
    first = ~pd.Series(vals.to_numpy()).duplicated().to_numpy()
    idx = order[first][frm:frm + size]
    return [(int(d), float(s)) for d, s in zip(uniq[idx], sc[idx])]


def _search_sorted(engine: QueryEngine, body: dict,
                   source_files: list[str] | None = None,
                   text_col: str = "content") -> dict:
    """Field-sorted ``_search`` (``"sort": [{field: "asc"|"desc"}, …]`` —
    the shape the reference uses everywhere it reads results back, e.g.
    execution_end_time desc in the top-anomaly queries): hits come back
    in the metadata sort order with missing values LAST either direction
    and a doc_id ascending tie-break; ``_score`` is null, OpenSearch's
    track_scores=false behavior. Aggregations still run over the full
    matching set. Deep sorts charge linearly in the matching-set size,
    exactly like OpenSearch."""
    import pandas as pd
    import pyarrow.compute as pc

    size = int(body.get("size", 10))
    frm = int(body.get("from", 0))
    query = body.get("query")
    if query and next(iter(query)) in ("query_string", "simple_query_string"):
        from .querystring import lower_query_string

        query = lower_query_string(engine, query)
    if body.get("collapse") is not None:
        raise ValueError("collapse with a field sort is not supported")
    keys = _parse_sort_keys(body["sort"])
    if any(f == "_score" for f, _ in keys):
        raise ValueError("sort by _score is the default ranking; omit `sort`")

    docs = engine.execute_filter(query)
    total = int(docs.size)
    fields = sorted({f for f, _ in keys if f != "doc_id"})
    t = engine.live_docmap(columns=["doc_id", *fields])
    if docs.size < t.num_rows:
        t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(docs)))
    df = t.to_pandas()
    df = df.sort_values(by=[f for f, _ in keys] + ["doc_id"],
                        ascending=[a for _, a in keys] + [True],
                        na_position="last", kind="mergesort")
    page = df.iloc[frm:frm + size]

    def _py(v):
        if v is None or pd.isna(v):
            return None
        return v.item() if hasattr(v, "item") else v

    hits = [
        {"_id": int(rec["doc_id"]), "_score": None,
         "sort": [_py(rec[f]) for f, _ in keys]}
        for rec in page.to_dict("records")
    ]
    _attach_source(engine, hits)
    if body.get("highlight"):
        raise ValueError("highlight with a field sort is not supported; "
                         "use the relevance-ranked form")
    out = {"hits": {"total": {"value": total, "relation": "eq"}, "hits": hits}}
    _apply_aggs(engine, body, query, out)
    return out
