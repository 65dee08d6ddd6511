"""SPIMI-style inverted-index build on Ray Data — SURVEY.md §7.1 M2.

Dataflow per corpus *slice* (a group of input parquet files; slices are
the unit of incremental build / resume, like Lucene segments):

    read_parquet(slice files, columns=[doc_id, content])     # prune at the read
      → map_batches(TokenizeCombine, pyarrow, actor pool)    # phase 1: per-batch partial postings
      → add salted partition key kh = (hash(term) + doc_bucket) % P
      → groupby(kh).map_groups(merge partition → write part file)   # phase 2: THE shuffle
    read_parquet(slice files, all meta cols)
      → map_batches(DocMap) → write_parquet(docmap/)         # sha256 lineage

The salt is the doc-id bucket: a hot term ('import') is split across
its doc buckets, so no single reducer ever materializes a full hot
posting list — the two-phase combine the north rule requires. Each
phase-2 group writes its own ``postings/part-{kh}.parquet`` atomically
(tmp + rename) and emits a manifest row (sha256, counts, input
fingerprint); a rerun with identical inputs skips the write.

Resume is slice-granular: a slice whose ``_slice_manifest.json``
matches its input fingerprint is skipped entirely, so a killed build
restarted on the same inputs only recomputes unfinished slices.

Replaces the substrate the reference assumes from OpenSearch/Lucene
(queries built in ``timeseries/util/ParseUtils.java:308-431`` are
executed against it); internals follow public literature (SPIMI:
Manning et al. IIR ch. 4; block-max layout: Ding & Suel SIGIR'11).
"""

from __future__ import annotations

import hashlib
import json
import os
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash_strings, sha256_file
from ..stages.tokenize import DocMap, TokenizeCombine
from .segments import DEFAULT_BLOCK_SIZE

MANIFEST_NAME = "manifest.json"

# global-term-stats finalize: below this total posting-stat size the
# driver aggregates inline (instant, byte-stable); above it the stats
# pass runs as a distributed groupby + range-partitioned sort and the
# dictionary is written as a DIRECTORY of globally-sorted part files —
# the driver only ever holds one part's manifest metadata, never the
# vocabulary (a 10⁹-term dictionary would OOM a driver-side sort)
STATS_INLINE_BYTES = 512 * 1024 * 1024
# modest row groups: the term-sorted dictionary's row-group statistics
# are the LAZY serving mode's prune index (termdict.TermDictionary) —
# one giant group would force every dictionary scan to read the file
STATS_ROW_GROUP = 131072


def _stats_sha256(path: str) -> str:
    """Lineage hash of the stats dictionary — a single file, or a
    directory of part files (hash over 'name:sha256' lines in name
    order, so any part change or rename changes the digest)."""
    if os.path.isdir(path):
        h = hashlib.sha256()
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                h.update(f"{name}:{sha256_file(os.path.join(path, name))}\n".encode())
        return h.hexdigest()
    return sha256_file(path)


def _write_stats_part(block, path: str) -> tuple[int, str | None, str | None, bool]:
    """Write one globally-sorted stats block as a part file; returns
    (n_terms, first_term, last_term, internally_sorted) for the driver's
    order check — the boundary comparison alone can't see disorder
    INSIDE a block, and both dictionary serving modes bisect, so an
    unsorted part must never be committed."""
    import pyarrow.compute as pc

    tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if tbl.num_rows == 0:
        return 0, None, None, True
    tbl = tbl.select(["term", "df", "cttf"])
    col = tbl["term"].combine_chunks()
    ordered = bool(
        tbl.num_rows < 2
        or pc.all(pc.less_equal(col.slice(0, len(col) - 1), col.slice(1))).as_py()
    )
    if ordered:
        pq.write_table(tbl, path, row_group_size=STATS_ROW_GROUP)
    return tbl.num_rows, col[0].as_py(), col[len(col) - 1].as_py(), ordered


def _stats_term_boundaries(posting_files: list[str], n_parts: int) -> list[str] | None:
    """Range-partition boundaries for the stats exchange, sampled from
    the posting files' per-row-group ``term`` column statistics — footer
    metadata only, no data pages read. Statistics truncation (long terms)
    only blurs boundary PLACEMENT, never correctness: every term still
    lands in exactly one range by binary search. Returns ``None`` when
    any file lacks term statistics (→ caller falls back to the Ray-Data
    sort path)."""
    mins: list[str] = []
    for f in posting_files:
        md = pq.read_metadata(f)
        try:
            ti = md.schema.names.index("term")
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ti).statistics
            if st is None or not st.has_min_max or st.min is None:
                return None
            mins.append(st.min if isinstance(st.min, str) else st.min.decode("utf-8", "replace"))
    if not mins:
        return None
    mins.sort()
    # dedupe keeps ranges non-empty by construction; fewer parts is fine
    return sorted({mins[len(mins) * p // n_parts] for p in range(1, n_parts)})


def _bisect_left_arrow(col, value: str) -> int:
    """First index with ``col[i] >= value`` in a term-sorted Arrow
    column — O(log n) scalar accesses, no materialization."""
    lo, hi = 0, len(col)
    while lo < hi:
        mid = (lo + hi) // 2
        if col[mid].as_py() < value:
            lo = mid + 1
        else:
            hi = mid
    return lo


_STATS_AGG_COLS = ["term", "df", "cttf"]


def _split_stats_by_range(path: str, boundaries: list[str]) -> list[pa.Table]:
    """Map side of the stats exchange: one posting file → locally
    combined (term, df, cttf) partials, term-sorted, sliced into
    ``len(boundaries)+1`` range partitions (terms equal to a boundary go
    right). All heavy work is Arrow C kernels; the split offsets come
    from binary search on the sorted column."""
    t = pq.read_table(path, columns=["term", "df_chunk", "tf_sum"])
    t = t.group_by("term").aggregate([("df_chunk", "sum"), ("tf_sum", "sum")])
    t = t.select(["term", "df_chunk_sum", "tf_sum_sum"]).rename_columns(_STATS_AGG_COLS)
    t = t.sort_by([("term", "ascending")])
    col = t["term"].combine_chunks()
    offs = [0] + [_bisect_left_arrow(col, b) for b in boundaries] + [t.num_rows]
    return [t.slice(offs[p], offs[p + 1] - offs[p]) for p in range(len(offs) - 1)]


def _split_stats_single_range(path: str, boundaries: list[str]) -> pa.Table:
    """Degenerate one-range split (tiny distributed finalizes)."""
    return _split_stats_by_range(path, boundaries)[0]


def _merge_stats_range(path: str, *parts: pa.Table) -> tuple[int, str | None, str | None, bool]:
    """Reduce side: merge one term range's partials across all posting
    files, re-sort, write the part file. Output ranges are disjoint and
    ordered by construction, so the parts concatenate into a globally
    term-sorted dictionary."""
    live = [p for p in parts if p.num_rows]
    if not live:
        return 0, None, None, True
    t = pa.concat_tables(live)
    t = t.group_by("term").aggregate([("df", "sum"), ("cttf", "sum")])
    t = t.select(["term", "df_sum", "cttf_sum"]).rename_columns(_STATS_AGG_COLS)
    t = t.sort_by([("term", "ascending")])
    return _write_stats_part(t, path)


def _write_global_stats(posting_files: list[str], stats_path: str,
                        inline_bytes: int = STATS_INLINE_BYTES) -> int:
    """Global (term, df, cttf) dictionary from the posting parts' chunk
    stat columns, term-sorted, written atomically to ``stats_path``.
    Returns the term count.

    Small indexes (≤ ``inline_bytes`` of posting parts): driver-side
    pandas aggregation into ONE file — instant and byte-stable. Bigger:
    a raw-Ray RANGE exchange (boundaries sampled from parquet row-group
    statistics, map-side local combine, one reduce per term range) — the
    same drop-to-raw-Ray shape as the posting merge, because Ray Data's
    sort-based groupby paid a full extra exchange here (measured ~2-6×).
    Each reduce writes its own part file under a ``stats.parquet/``
    DIRECTORY — the vocabulary never materializes on the driver (only
    per-part boundaries do), so a 10⁹-term build finalizes with flat
    driver RSS. Files without term statistics fall back to the Ray-Data
    groupby+sort path. Both layouts serve identically through
    ``termdict.TermDictionary``."""
    import pandas as pd

    total_bytes = sum(os.path.getsize(f) for f in posting_files)
    if not posting_files or total_bytes < inline_bytes:
        if not posting_files:
            stats_tbl = pd.DataFrame({"term": pd.Series(dtype="object"),
                                      "df": pd.Series(dtype="int64"),
                                      "cttf": pd.Series(dtype="int64")})
        else:
            stats_tbl = (
                pa.concat_tables(pq.read_table(f, columns=["term", "df_chunk", "tf_sum"]) for f in posting_files)
                .to_pandas()
                .groupby("term", as_index=False)
                .agg(df=("df_chunk", "sum"), cttf=("tf_sum", "sum"))
            )
        stats_tbl = stats_tbl.sort_values("term").reset_index(drop=True)
        tmp_stats = f"{stats_path}.tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(stats_tbl, preserve_index=False), tmp_stats,
                       row_group_size=STATS_ROW_GROUP)
        _swap_into_place(tmp_stats, stats_path)
        return int(len(stats_tbl))

    import shutil

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def check(results, tmp_dir) -> int | None:
        """Drop empty parts; verify global order across the kept
        boundaries. An out-of-order result would corrupt every lazy
        dictionary prune downstream, so it must never be served."""
        n_terms, last_hi = 0, None
        for n, lo, hi, ordered in results:
            if n == 0:
                continue
            if not ordered or (last_hi is not None and lo < last_hi):
                shutil.rmtree(tmp_dir, ignore_errors=True)
                return None
            last_hi = hi
            n_terms += n
        return n_terms

    def run_range() -> tuple[int, str] | None:
        """Raw-Ray range exchange: boundaries from footer statistics,
        map-side local combine + sort + slice, one reduce (merge + part
        write) per term range. Driver holds boundaries and refs only."""
        # ~96 MB of posting bytes per reduce (stats columns are a small
        # slice of that, so real reducers run well under the bound);
        # floor at 2 parts whenever there are ≥2 inputs so a FORCED
        # distributed finalize still exercises the multi-part layout the
        # lazy dictionary serves
        n_target = max(2 if len(posting_files) > 1 else 1,
                       min(256, int(total_bytes // (96 << 20)) + 1))
        bounds = _stats_term_boundaries(posting_files, n_target)
        if bounds is None:
            return None
        n_parts = len(bounds) + 1
        tmp_dir = f"{stats_path}.tmp-{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        if n_parts > 1:
            split = ray.remote(num_returns=n_parts)(_split_stats_by_range)
        else:
            # single range: unwrap the one-element list (num_returns=1
            # would hand the merge the LIST, not the table)
            split = ray.remote(_split_stats_single_range)
        merge = ray.remote(_merge_stats_range)
        part_refs: list[list] = [[] for _ in range(n_parts)]
        for f in posting_files:
            outs = split.remote(f, bounds)
            if n_parts == 1:
                outs = [outs]
            for p, r in enumerate(outs):
                part_refs[p].append(r)
        refs = [merge.remote(os.path.join(tmp_dir, f"part-{p:05d}.parquet"), *part_refs[p])
                for p in range(n_parts)]
        n = check(ray.get(refs), tmp_dir)
        return None if n is None else (n, tmp_dir)

    def run(explicit_sort: bool) -> tuple[int, str] | None:
        """Ray-Data fallback attempt (files without term statistics) →
        (n_terms, tmp_dir), or None when the parts came out of global
        order (possible only on the first, sort-free attempt — Ray's
        groupby is itself a sort-based shuffle, so its aggregate output
        is normally already in key order)."""
        stats = (
            rd.read_parquet(posting_files, columns=["term", "df_chunk", "tf_sum"])
            .groupby("term")
            .aggregate(Sum("df_chunk", alias_name="df"), Sum("tf_sum", alias_name="cttf"))
        )
        if explicit_sort:
            stats = stats.sort("term")
        tmp_dir = f"{stats_path}.tmp-{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        write = ray.remote(_write_stats_part)
        refs = []
        # stream blocks straight to per-part writes: the driver holds
        # refs and part counters only, never the vocabulary
        for bundle in stats.iter_internal_ref_bundles():
            for ref in bundle.block_refs:
                refs.append(write.remote(ref, os.path.join(tmp_dir, f"part-{len(refs):05d}.parquet")))
        n = check(ray.get(refs), tmp_dir)
        return None if n is None else (n, tmp_dir)

    got = run_range()
    if got is None:
        got = run(explicit_sort=False)
    if got is None:
        got = run(explicit_sort=True)
        if got is None:  # sorted output out of order = engine bug
            raise RuntimeError("stats parts out of global term order after explicit sort")
    n_terms, tmp_dir = got
    if n_terms == 0:
        # degenerate: all-empty posting stats → fall back to one empty file
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return _write_global_stats([], stats_path, inline_bytes)
    # consistency manifest INSIDE the directory: the dir swap is two
    # renames, so a reader racing a re-finalize could list one layout and
    # open the other — the part-count/row-count check turns that torn
    # read into a loud error instead of a silently mis-ordered dictionary
    n_parts = len([n for n in os.listdir(tmp_dir) if n.endswith(".parquet")])
    with open(os.path.join(tmp_dir, "_dict_meta.json"), "w") as f:
        json.dump({"n_parts": n_parts, "n_terms": int(n_terms)}, f)
    _swap_into_place(tmp_dir, stats_path)
    return n_terms


def _swap_into_place(tmp: str, dst: str) -> None:
    """Replace ``dst`` (file OR directory, may not exist) with ``tmp``.
    The index MANIFEST flip is the real commit point — it records the
    stats sha, so a crash inside this swap is caught by the sha check on
    the next finalize, which recomputes stats from the posting parts."""
    import shutil

    old = f"{dst}.old-{os.getpid()}"
    shutil.rmtree(old, ignore_errors=True)
    # os.rename moves FILES and DIRECTORIES alike, so both layout flips
    # (file→dir, dir→file) go through the same move-aside: a crash
    # between the two renames leaves the old dictionary recoverable at
    # ``old`` instead of a window with no stats at all
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        os.remove(old)


def _add_partition_key(batch: pa.Table, num_partitions: int) -> pa.Table:
    kh = (hash_strings(batch["term"].to_pylist()) + batch["bucket"].to_numpy().astype(np.uint64)) % np.uint64(
        num_partitions
    )
    return batch.append_column("kh", pa.array(kh.astype(np.int64)))


def _group_fingerprint(tbl: pa.Table) -> str:
    """Deterministic fingerprint of a phase-2 input group (order-insensitive)."""
    h = hashlib.sha256()
    idx = np.lexsort(
        (tbl["first_doc"].to_numpy(), tbl["bucket"].to_numpy(), np.asarray(tbl["term"].to_pylist(), dtype=object))
    )
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)[idx]
    h.update("\x00".join(map(str, terms)).encode())
    for col in ("bucket", "first_doc", "df_chunk", "tf_sum"):
        h.update(np.ascontiguousarray(tbl[col].to_numpy()[idx]).tobytes())
    return h.hexdigest()


def merge_partition(
    group: pa.Table,
    *,
    out_dir: str,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> pa.Table:
    """Phase-2 reducer: merge all phase-1 chunks of one salted partition
    into doc-ordered posting rows; write the part file; return one
    manifest row. Idempotent: skips the write when the existing part's
    recorded input fingerprint matches."""
    kh = int(group["kh"][0].as_py())
    path = os.path.join(out_dir, f"part-{kh:05d}.parquet")
    meta_path = path + ".json"
    fp = _group_fingerprint(group)

    if os.path.exists(path) and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp and meta.get("sha256") == sha256_file(path):
            meta["resumed"] = True
            return pa.Table.from_pylist([_manifest_row(meta)])

    # ---- fully vectorized merge: phase-1 chunks are single-block rows,
    # so all three varint streams of the whole partition decode in ONE
    # pass each; groupwise cumsum rebuilds absolute doc ids; a single
    # lexsort orders every posting by (term, bucket, doc); the bulk
    # encoder writes the final doc-ordered rows. No per-posting Python.
    import pyarrow.compute as pc

    if pc.max(pc.list_value_length(group["block_doc_off"])).as_py() > 1:
        raise ValueError("merge_partition expects single-block phase-1 chunks")
    terms_arr = np.asarray(group["term"].to_pylist(), dtype=object)
    ucodes, codes = np.unique(terms_arr, return_inverse=True)
    buckets_arr = group["bucket"].to_numpy()
    df_chunk = group["df_chunk"].to_numpy().astype(np.int64)
    row_starts = np.concatenate(([0], np.cumsum(df_chunk)))[:-1]

    from ..functions.varint import decode_varint

    def cat(col: str) -> np.ndarray:
        return decode_varint(b"".join(group[col].to_pylist()))

    deltas = cat("docs")
    tfs_all = cat("tfs").astype(np.int64)
    dls_all = cat("dls").astype(np.int64)
    if deltas.size != int(df_chunk.sum()):
        raise ValueError("posting stream length mismatch — corrupt phase-1 chunk")
    # groupwise cumsum: absolute doc = running delta sum reset per chunk row
    c = np.cumsum(deltas)
    base = np.repeat(c[row_starts] - deltas[row_starts], df_chunk)
    docs_all = (c - base).astype(np.int64)

    code_all = np.repeat(codes, df_chunk)
    bucket_all = np.repeat(buckets_arr, df_chunk)
    order = np.lexsort((docs_all, bucket_all, code_all))
    docs_all, tfs_all, dls_all = docs_all[order], tfs_all[order], dls_all[order]
    code_all, bucket_all = code_all[order], bucket_all[order]

    change = np.empty(code_all.size, dtype=bool)
    change[0] = True
    np.not_equal(code_all[1:], code_all[:-1], out=change[1:])
    change[1:] |= bucket_all[1:] != bucket_all[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], code_all.size)
    same = np.zeros(code_all.size, dtype=bool)
    same[1:] = (docs_all[1:] == docs_all[:-1]) & ~change[1:]
    if same.any():
        raise ValueError("duplicate doc_id in postings — corrupt input")

    from .segments import encode_rows_batched

    tbl = encode_rows_batched(
        ucodes[code_all[starts]].astype(object),
        bucket_all[starts],
        docs_all,
        tfs_all,
        dls_all,
        starts,
        ends,
        block_size,
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=4096)
    os.replace(tmp, path)
    terms = terms_arr  # for the manifest fields below

    meta = {
        "kh": kh,
        "path": os.path.basename(path),
        "fingerprint": fp,
        "sha256": sha256_file(path),
        "n_rows": tbl.num_rows,
        "n_terms": len(set(terms)),
        "df_sum": int(group["df_chunk"].to_numpy().sum()),
        "tf_sum": int(group["tf_sum"].to_numpy().sum()),
        "resumed": False,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return pa.Table.from_pylist([_manifest_row(meta)])


def _manifest_row(meta: dict) -> dict:
    return {
        "kh": meta["kh"],
        "path": meta["path"],
        "sha256": meta["sha256"],
        "n_rows": meta["n_rows"],
        "n_terms": meta["n_terms"],
        "df_sum": meta["df_sum"],
        "tf_sum": meta["tf_sum"],
        "resumed": bool(meta.get("resumed", False)),
    }


def _split_table_by_kh(tbl: pa.Table, num_partitions: int) -> list[pa.Table]:
    if tbl.num_rows == 0 or "kh" not in tbl.column_names:
        # empty read blocks pass through the map stages schema-less
        from .segments import POSTINGS_SCHEMA

        empty = POSTINGS_SCHEMA.empty_table().append_column("kh", pa.array([], pa.int64()))
        return [empty] * num_partitions
    kh = tbl["kh"].to_numpy()
    order = np.argsort(kh, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    skh = kh[order]
    bounds = np.searchsorted(skh, np.arange(num_partitions + 1))
    return [sorted_tbl.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(num_partitions)]


def hash_exchange_merge(chunks_ds, num_partitions: int, out_dir: str, block_size: int) -> list[dict]:
    """Explicit two-stage hash shuffle for phase 2, on raw Ray tasks.

    Ray Data's ``groupby`` is a sort-based shuffle whose fixed overhead
    dominates this exchange (measured: it neither scales 8→32 CPUs nor
    beats a plain hash split at this shape). Since the partition key
    ``kh`` is already materialized on every chunk row, the textbook
    exchange is enough: map side splits each phase-1 block into P
    sub-tables (``num_returns=P`` → P object refs, moved zero-copy
    through the object store), reduce side concatenates its P-th pieces
    and runs the vectorized merge. This is the documented drop-to-raw-
    Ray case: a deterministic custom exchange the Dataset API can't
    express efficiently."""
    import ray

    split = ray.remote(num_returns=num_partitions)(_split_table_by_kh)
    merge = ray.remote(_merge_remote)

    part_refs: list[list] = [[] for _ in range(num_partitions)]
    # stream map-side splits as tokenize blocks materialize — no barrier
    # between the map stage and the split stage
    for bundle in chunks_ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            outs = split.remote(ref, num_partitions)
            if num_partitions == 1:
                outs = [outs]
            for p, r in enumerate(outs):
                part_refs[p].append(r)
    manifests = [merge.remote(p, out_dir, block_size, *part_refs[p]) for p in range(num_partitions)]
    return [m for m in ray.get(manifests) if m is not None]


def _merge_remote(kh: int, out_dir: str, block_size: int, *parts: pa.Table) -> dict | None:
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    group = pa.concat_tables(parts)
    row = merge_partition(group, out_dir=out_dir, block_size=block_size)
    return row.to_pylist()[0]


def _slice_fingerprint(files: list[str]) -> str:
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}".encode())
    return h.hexdigest()


def build_slice(
    files: list[str],
    slice_dir: str,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "code",
    num_partitions: int = 16,
    bucket_shift: int = 17,
    block_size: int = DEFAULT_BLOCK_SIZE,
    batch_size: int | None = None,
    concurrency: int | None = None,
    keep_cols=("repo", "path", "commit", "lang"),
    store_positions: bool = False,
) -> dict:
    """Build one index slice; returns its manifest dict. Skips the whole
    slice when a valid ``_slice_manifest.json`` already matches.

    ``store_positions=True`` additionally writes a positional sidecar
    (``positions/part-*.parquet``: term, doc_id, positions) for phrase
    queries — term-hash partitioned and term-sorted within each part so
    a phrase lookup touches one file per term with row-group pruning.
    The BM25 posting codec is untouched; non-phrase users pay nothing."""
    import ray.data as rd

    os.makedirs(slice_dir, exist_ok=True)
    manifest_path = os.path.join(slice_dir, "_slice_manifest.json")
    fp = _slice_fingerprint(files)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("input_fingerprint") == fp:
            m["resumed"] = True
            return m

    postings_dir = os.path.join(slice_dir, "postings")
    docmap_dir = os.path.join(slice_dir, "docmap")
    os.makedirs(postings_dir, exist_ok=True)

    if concurrency is None:
        import ray

        # fixed-size pool sized to the session (autoscaling ramps too
        # slowly for a build-shaped burst), minus headroom for the read
        # and shuffle stages
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)

    # doc count from parquet footers — no Ray execution needed
    n_docs = sum(pq.read_metadata(f).num_rows for f in files)
    if batch_size is None:
        # SURVEY §7.3 "very wide records": cap tokenize batches by BYTES,
        # not rows — a 1024-row batch of MB-scale source files would blow
        # the worker heap. Average row bytes come from the same footers.
        tot_bytes = 0
        for f in files:
            md = pq.read_metadata(f)
            tot_bytes += sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        avg = max(1, tot_bytes // max(n_docs, 1))
        batch_size = int(min(1024, max(16, (32 << 20) // avg)))
    # split the read well beyond the file count so every tokenize actor
    # stays busy (a block per file would cap parallelism at len(files))
    n_blocks = max(len(files), int(concurrency) * 6)
    corpus = rd.read_parquet(files, columns=[id_col, text_col], override_num_blocks=n_blocks)

    # tokenize runs as a plain TASK pool: the combiner's only state is a
    # couple of compiled regexes (cheap to pickle), and tasks schedule
    # elastically with no actor-pool startup ramp — measurably better
    # utilization than a fixed actor pool for a build-shaped burst.
    tokenizer = TokenizeCombine(
        text_col=text_col, id_col=id_col, mode=mode, bucket_shift=bucket_shift, block_size=block_size
    )
    chunks = corpus.map_batches(
        tokenizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    ).map_batches(
        partial(_add_partition_key, num_partitions=num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def run_postings():
        return hash_exchange_merge(chunks, num_partitions, postings_dir, block_size)

    def run_docmap():
        # docmap + lineage pass (projection only — content analyzed once)
        meta_cols = [id_col, text_col] + [c for c in keep_cols]
        avail = set(pq.read_schema(files[0]).names)
        cols = [c for c in meta_cols if c in avail]
        docmap = DocMap(text_col=text_col, id_col=id_col, keep_cols=keep_cols)
        rd.read_parquet(files, columns=cols, override_num_blocks=n_blocks).map_batches(
            docmap,  # stateless → plain task pool, no actor startup cost
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(docmap_dir)

    # sequential executions: two concurrent streaming executors contend
    # for the same CPUs and finish later than back-to-back runs (measured)
    import time as _time

    def run_positions():
        from ..stages.tokenize import PositionRows

        pos_dir = os.path.join(slice_dir, "positions")
        extract = PositionRows(text_col=text_col, id_col=id_col, mode=mode)

        def add_pk(b: pa.Table) -> pa.Table:
            pk = hash_strings(b["term"].to_pylist()) % np.int64(num_partitions)
            return b.append_column("pk", pa.array(pk.astype(np.int64)))

        def sort_group(g: pa.Table) -> pa.Table:
            return g.sort_by([("term", "ascending"), ("doc_id", "ascending")]).drop_columns(["pk"])

        (
            rd.read_parquet(files, columns=[id_col, text_col], override_num_blocks=n_blocks)
            .map_batches(extract, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
            .map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pk")
            .map_groups(sort_group, batch_format="pyarrow")
            .write_parquet(pos_dir)
        )

    timings: dict[str, float] = {}
    t_start = _time.perf_counter()
    # docmap FIRST: the exchange leaves the session with lingering
    # object-store/worker state that measurably slows whatever streaming
    # execution follows it at higher CPU counts (docmap ran 3-4x slower
    # AFTER postings than in a fresh session); the small phase goes first
    t0 = _time.perf_counter()
    run_docmap()
    timings["docmap_sec"] = round(_time.perf_counter() - t0, 2)
    if store_positions:
        t0 = _time.perf_counter()
        run_positions()
        timings["positions_sec"] = round(_time.perf_counter() - t0, 2)
    t0 = _time.perf_counter()
    manifest_rows = run_postings()
    timings["postings_sec"] = round(_time.perf_counter() - t0, 2)
    timings["slice_total_sec"] = round(_time.perf_counter() - t_start, 2)

    total_tokens = int(sum(r["tf_sum"] for r in manifest_rows))
    manifest = {
        "input_files": sorted(os.path.basename(f) for f in files),
        "input_fingerprint": fp,
        "n_docs": int(n_docs),
        "total_tokens": total_tokens,
        "num_partitions": num_partitions,
        "bucket_shift": bucket_shift,
        "block_size": block_size,
        "analyzer_mode": mode,
        "store_positions": bool(store_positions),
        "partitions": sorted(manifest_rows, key=lambda r: r["kh"]),
        "timings": timings,
        "resumed": False,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def build_index(
    input_files: list[str],
    out_dir: str,
    *,
    slices: int = 1,
    **kwargs,
) -> dict:
    """Build a full index: input files → ``slices`` incremental slices →
    global stats + manifest. Returns the global manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    stats_inline_bytes = kwargs.pop("stats_inline_bytes", STATS_INLINE_BYTES)
    file_groups = [list(g) for g in np.array_split(sorted(input_files), slices) if len(g)]
    slice_manifests = []
    for i, files in enumerate(file_groups):
        slice_dir = os.path.join(out_dir, "segments", f"slice-{i:04d}")
        slice_manifests.append(build_slice(list(files), slice_dir, **kwargs))

    return _finalize_index(
        out_dir, slice_manifests,
        mode=kwargs.get("mode", "code"),
        bucket_shift=kwargs.get("bucket_shift", 17),
        block_size=kwargs.get("block_size", DEFAULT_BLOCK_SIZE),
        store_positions=kwargs.get("store_positions", False),
        text_field=kwargs.get("text_col", "content"),
        stats_inline_bytes=stats_inline_bytes,
    )


def _finalize_index(out_dir: str, slice_manifests: list[dict], *,
                    mode: str, bucket_shift: int, block_size: int,
                    store_positions: bool = False,
                    dirs: list[str] | None = None,
                    deletes: dict | None = None,
                    text_field: str | None = None,
                    stats_inline_bytes: int = STATS_INLINE_BYTES) -> dict:
    """Global stats + manifest over the given slices (in slice-id order).
    Pure recompute from the slices' chunk-stat columns — no dependence on
    a previous ``stats.parquet``, so re-finalizing after a crash or a
    segment add is idempotent. Stats and manifest write atomically
    (tmp + replace); the manifest flip is what makes a new slice visible
    to :class:`..query.QueryEngine` (which lists files FROM the manifest,
    never by glob). ``dirs`` overrides the default ``segments/slice-{i}``
    naming (compaction writes a fresh dir); ``deletes`` carries the
    tombstone record through a re-finalize (segment adds keep deletes)."""
    if dirs is None:
        dirs = [f"segments/slice-{i:04d}" for i in range(len(slice_manifests))]
    # global term stats (df, cttf): groupby over the chunk-stat columns —
    # driver-inline for small indexes, distributed sort + part-file
    # directory for vocabulary-scale ones (see _write_global_stats)
    posting_files = sorted(
        os.path.join(out_dir, d, "postings", p["path"])
        for d, m in zip(dirs, slice_manifests)
        for p in m["partitions"]
    )
    stats_path = os.path.join(out_dir, "stats.parquet")
    n_terms = _write_global_stats(posting_files, stats_path, stats_inline_bytes)

    n_docs = int(sum(m["n_docs"] for m in slice_manifests))
    total_tokens = int(sum(m["total_tokens"] for m in slice_manifests))
    manifest = {
        "format": "anomaly_detection_ray.index/v1",
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "n_terms": int(n_terms),
        "analyzer_mode": mode,
        "bucket_shift": bucket_shift,
        "block_size": block_size,
        "store_positions": bool(store_positions),
        # the ONE indexed text field's source column — exists-queries on
        # any other non-docmap field match nothing (OpenSearch unmapped)
        "text_field": text_field,
        "stats_sha256": _stats_sha256(stats_path),
        "slices": [
            {
                "dir": d,
                "n_docs": m["n_docs"],
                "resumed": m.get("resumed", False),
                "partitions": m["partitions"],
            }
            for d, m in zip(dirs, slice_manifests)
        ],
    }
    if deletes:
        manifest["deletes"] = deletes
    manifest_path = os.path.join(out_dir, MANIFEST_NAME)
    tmp_manifest = f"{manifest_path}.tmp-{os.getpid()}"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp_manifest, manifest_path)
    return manifest


def extend_index(index_dir: str, new_files: list[str], **kwargs) -> dict:
    """Append new documents to an EXISTING index as one additional slice
    — the Lucene segment-add analogue (prior slices are never rewritten),
    and the indexing half of a realtime/tailing pipeline (pair with
    ``sources.tailing.TailingSource``: poll → extend_index → commit).

    Builds ``segments/slice-{N}`` from ``new_files`` and re-finalizes the
    global stats + manifest over ALL slices. A fresh
    :class:`..query.QueryEngine` then serves the union with BM25 results
    identical to a from-scratch build over every file (global df/avgdl
    re-derived; postings are slice-local, so no old bytes are touched
    beyond their chunk-stat columns in the stats pass). The manifest
    rewrite is atomic and is what flips the new slice visible — a crash
    mid-add leaves the old index serving and the rerun resumes the slice
    by fingerprint.

    Idempotent: if an existing slice already carries ``new_files``'s
    fingerprint, returns the current manifest unchanged. Analyzer /
    bucket_shift / block_size come from the existing manifest; passing a
    conflicting override raises (mixed-analyzer slices would split the
    term space). Caller owns doc-id uniqueness across slices.

    Reference parity: the plugin's indexes take rolling writes +
    rollover (``IndexManagement.java``); this is the batch-parquet
    counterpart for the searchable corpus."""
    manifest_path = os.path.join(index_dir, MANIFEST_NAME)
    with open(manifest_path) as f:
        manifest = json.load(f)

    stats_inline_bytes = kwargs.pop("stats_inline_bytes", STATS_INLINE_BYTES)
    defaults = {"analyzer_mode": "code", "bucket_shift": 17,
                "block_size": DEFAULT_BLOCK_SIZE, "store_positions": False}
    for arg_key, manifest_key in (("mode", "analyzer_mode"),
                                  ("bucket_shift", "bucket_shift"),
                                  ("block_size", "block_size"),
                                  ("store_positions", "store_positions")):
        built_with = manifest.get(manifest_key, defaults[manifest_key])
        if arg_key in kwargs and kwargs[arg_key] != built_with:
            raise ValueError(
                f"{arg_key}={kwargs[arg_key]!r} conflicts with the index's "
                f"{built_with!r}; segment adds must match the build"
            )
        kwargs[arg_key] = built_with

    old_manifests = []
    for s in manifest["slices"]:
        with open(os.path.join(index_dir, s["dir"], "_slice_manifest.json")) as f:
            old_manifests.append(json.load(f))

    fp = _slice_fingerprint(new_files)
    if any(m.get("input_fingerprint") == fp for m in old_manifests):
        return manifest  # these files are already a slice — no-op

    i = next_slice_id(manifest)
    rel_dir = f"segments/slice-{i:04d}"
    sm = build_slice(sorted(new_files), os.path.join(index_dir, rel_dir), **kwargs)
    return _finalize_index(
        index_dir, old_manifests + [sm],
        mode=kwargs["mode"], bucket_shift=kwargs["bucket_shift"],
        block_size=kwargs["block_size"],
        store_positions=kwargs["store_positions"],
        dirs=[s["dir"] for s in manifest["slices"]] + [rel_dir],
        deletes=manifest.get("deletes"),
        text_field=manifest.get("text_field"),
        stats_inline_bytes=stats_inline_bytes,
    )


def next_slice_id(manifest: dict) -> int:
    """Next unused slice number: one past the largest trailing integer in
    any live OR historical slice dir name (compaction leaves old dirs on
    disk until GC, so length-of-slices would collide after a compact)."""
    import re

    ids = [0]
    for s in manifest["slices"]:
        m = re.search(r"(\d+)$", s["dir"])
        if m:
            ids.append(int(m.group(1)) + 1)
    return max(ids)


def tail_index_tick(input_dir: str, index_dir: str, seen_manifest: str,
                    max_slices: int | None = None, **kwargs) -> dict | None:
    """One continuous-indexing tick: poll the growing ``input_dir`` for
    parquet files not yet indexed, build (first tick) or segment-add
    (later ticks) exactly those, then commit the seen-files manifest —
    the search-index counterpart of the detector's tailing job tick.
    Returns the updated index manifest, or None when nothing new arrived.

    Commit happens only after the index manifest flip, so a crash
    mid-tick reprocesses the same files on the rerun — harmless, because
    ``extend_index`` de-dupes slices by input fingerprint.

    ``max_slices`` bounds segment count across ticks: when a tick's add
    pushes past it, the smallest slices fold together
    (:func:`..lifecycle.maybe_merge` — TieredMergePolicy shape), so
    per-query file opens stay O(max_slices) no matter how many ticks
    have run."""
    from ..sources.tailing import TailingSource

    src = TailingSource(input_dir, seen_manifest, suffixes=(".parquet", ".pq"))
    files = src.poll()
    if not files:
        return None
    if os.path.exists(os.path.join(index_dir, MANIFEST_NAME)):
        m = extend_index(index_dir, files, **kwargs)
    else:
        m = build_index(files, index_dir, **kwargs)
    src.commit(files)
    if max_slices is not None:
        from .lifecycle import maybe_merge

        merged = maybe_merge(index_dir, max_slices=max_slices, gc=True)
        if merged is not None:
            m = merged
    return m
