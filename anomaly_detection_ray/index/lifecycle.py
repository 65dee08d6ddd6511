"""Index lifecycle: tombstone deletes + compaction (segment merge).

Lucene's delete/merge model, rebuilt over the parquet segment format:

- ``delete_docs`` records doc ids in a tombstone file and flips the
  manifest atomically. Postings are NOT rewritten; the QueryEngine
  filters tombstoned docs at decode time, and the global statistics
  (n_docs, avgdl, df) stay STALE until compaction — exactly Lucene's
  semantics between a delete and a merge, so live docs' BM25 scores are
  unchanged by a delete (block-max upper bounds stay valid upper
  bounds; pruning just gets marginally less tight).
- ``delete_by_query`` resolves a filter-DSL query to doc ids first —
  the OpenSearch ``_delete_by_query`` the reference plugin itself uses
  to clean result indices
  (`/root/reference/src/main/java/org/opensearch/timeseries/transport/DeleteConfigTransportAction.java`
  and the `DeleteByQueryRequest` uses in `ad/transport/`).
- ``compact_index`` merges every slice into ONE fresh slice, purging
  tombstones and recomputing exact global stats (df, cttf, n_docs,
  avgdl) — Lucene's forceMerge(1). After compaction, BM25 scores equal
  a from-scratch build over the live docs (tested rank- and
  score-identical). Old slice dirs stay on disk until ``gc=True``
  removes them, so a crash mid-compact leaves the old index serving
  (the manifest flip is the commit point).

Scale shape: compaction re-partitions the existing posting CHUNKS by
the same (term-hash + doc-bucket) key used at build time — a raw-Ray
hash exchange over already-compressed rows (the varint streams ship
through the object store as-is; only the reducer decodes). No
re-tokenization, no text access: a 100 TB corpus compacts by moving
its ~x-times-smaller index, not its documents.
"""

from __future__ import annotations

import hashlib
import json
import os
from glob import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash_strings, sha256_file
from .build import MANIFEST_NAME, _finalize_index, next_slice_id
from .segments import DEFAULT_BLOCK_SIZE, decode_chunks_bulk, encode_rows_batched

DELETES_REL = "deletes/deleted.parquet"


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return json.load(f)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    path = os.path.join(index_dir, MANIFEST_NAME)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)


def load_deleted(index_dir: str, manifest: dict | None = None) -> np.ndarray:
    """Sorted int64 tombstoned doc ids ([] when none)."""
    manifest = manifest or _load_manifest(index_dir)
    d = manifest.get("deletes")
    if not d:
        return np.empty(0, dtype=np.int64)
    return (
        pq.read_table(os.path.join(index_dir, d["path"]))["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )


def delete_docs(index_dir: str, doc_ids) -> dict:
    """Tombstone ``doc_ids`` (unioned with prior deletes, idempotent).

    Writes the tombstone parquet atomically, then flips the manifest —
    readers opened before the flip keep serving the old view; new
    :class:`..query.QueryEngine` instances filter the deleted docs from
    every query path. Returns the updated manifest."""
    manifest = _load_manifest(index_dir)
    new = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    merged = np.union1d(load_deleted(index_dir, manifest), new)
    path = os.path.join(index_dir, DELETES_REL)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp)
    os.replace(tmp, path)
    manifest["deletes"] = {
        "path": DELETES_REL,
        "n_deleted": int(merged.size),
        "sha256": sha256_file(path),
    }
    _write_manifest(index_dir, manifest)
    return manifest


def delete_by_query(index_dir: str, query: dict) -> tuple[dict, int]:
    """Resolve a filter-DSL query against the CURRENT live view and
    tombstone the matches (OpenSearch ``_delete_by_query``). Returns
    (manifest, n_newly_deleted)."""
    from .query import QueryEngine

    docs = QueryEngine(index_dir).execute_filter(query)
    if docs.size == 0:
        return _load_manifest(index_dir), 0
    return delete_docs(index_dir, docs), int(docs.size)


def _compact_partition(
    kh: int,
    out_dir: str,
    block_size: int,
    deleted: np.ndarray,
    *parts: pa.Table,
) -> dict | None:
    """Reducer: all existing chunks of one target partition → decode,
    drop tombstoned postings, re-sort, bulk re-encode as ONE doc-ordered
    chunk per (term, bucket). Runs as a Ray task per partition."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    group = pa.concat_tables(parts)
    rows = group.to_pylist()
    docs, tfs, dls, off = decode_chunks_bulk(rows, block_size)
    counts = np.diff(off)
    terms_arr = np.asarray(group["term"].to_pylist(), dtype=object)
    ucodes, codes = np.unique(terms_arr, return_inverse=True)
    code_all = np.repeat(codes, counts)
    bucket_all = np.repeat(group["bucket"].to_numpy(), counts)

    if deleted.size:
        keep = np.isin(docs, deleted, invert=True)
        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        code_all, bucket_all = code_all[keep], bucket_all[keep]
    if docs.size == 0:
        return None

    order = np.lexsort((docs, bucket_all, code_all))
    docs, tfs, dls = docs[order], tfs[order], dls[order]
    code_all, bucket_all = code_all[order], bucket_all[order]

    change = np.empty(code_all.size, dtype=bool)
    change[0] = True
    np.not_equal(code_all[1:], code_all[:-1], out=change[1:])
    change[1:] |= bucket_all[1:] != bucket_all[:-1]
    dup = np.zeros(code_all.size, dtype=bool)
    dup[1:] = (docs[1:] == docs[:-1]) & ~change[1:]
    if dup.any():
        raise ValueError("duplicate doc_id across slices — corrupt index")
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], code_all.size)

    tbl = encode_rows_batched(
        ucodes[code_all[starts]].astype(object),
        bucket_all[starts],
        docs,
        tfs,
        dls,
        starts,
        ends,
        block_size,
    )
    path = os.path.join(out_dir, f"part-{kh:05d}.parquet")
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=4096)
    os.replace(tmp, path)
    return {
        "kh": kh,
        "path": os.path.basename(path),
        "sha256": sha256_file(path),
        "n_rows": tbl.num_rows,
        "n_terms": int(len(np.unique(code_all))),
        "df_sum": int(docs.size),
        "tf_sum": int(tfs.sum()),
        "resumed": False,
    }


def compact_index(
    index_dir: str,
    *,
    num_partitions: int | None = None,
    gc: bool = False,
) -> dict:
    """Merge all slices into one, purging tombstones and recomputing
    exact global stats — forceMerge(1). See module docstring.

    ``num_partitions`` re-buckets the merged postings (default: the
    largest slice's partition count). ``gc=True`` removes the replaced
    slice dirs and the tombstone file AFTER the manifest flip."""
    import ray
    import ray.data as rd

    manifest = _load_manifest(index_dir)
    block_size = int(manifest.get("block_size", DEFAULT_BLOCK_SIZE))
    deleted = load_deleted(index_dir, manifest)
    deleted_tag = hashlib.sha256(deleted.tobytes()).hexdigest()[:16]
    old_dirs = [s["dir"] for s in manifest["slices"]]
    slice_manifests = []
    for d in old_dirs:
        with open(os.path.join(index_dir, d, "_slice_manifest.json")) as f:
            slice_manifests.append(json.load(f))
    if num_partitions is None:
        num_partitions = max(m.get("num_partitions", 16) for m in slice_manifests)

    sid = next_slice_id(manifest)
    rel_dir = f"segments/slice-{sid:04d}"
    slice_dir = os.path.join(index_dir, rel_dir)
    if os.path.exists(slice_dir):
        # leftover from a crashed compact (sid is past every manifest-
        # referenced slice, so nothing here is being served) — start clean
        import shutil

        shutil.rmtree(slice_dir)
    postings_dir = os.path.join(slice_dir, "postings")
    os.makedirs(postings_dir, exist_ok=True)

    posting_files = sorted(
        os.path.join(index_dir, s["dir"], "postings", p["path"])
        for s in manifest["slices"]
        for p in s["partitions"]
    )

    # --- postings: hash exchange of existing chunks by the same
    # (term-hash + bucket) % P key, raw-Ray tasks (build.py's exchange
    # pattern; compressed rows move zero-copy, only reducers decode)
    def add_kh(b: pa.Table) -> pa.Table:
        kh = (
            hash_strings(b["term"].to_pylist())
            + b["bucket"].to_numpy().astype(np.uint64)
        ) % np.uint64(num_partitions)
        return b.append_column("kh", pa.array(kh.astype(np.int64)))

    from .build import _split_table_by_kh

    chunks = rd.read_parquet(posting_files).map_batches(
        add_kh, batch_format="pyarrow", zero_copy_batch=True
    )
    split = ray.remote(num_returns=num_partitions)(_split_table_by_kh)
    compact = ray.remote(_compact_partition)
    deleted_ref = ray.put(deleted)
    part_refs: list[list] = [[] for _ in range(num_partitions)]
    for bundle in chunks.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            outs = split.remote(ref, num_partitions)
            if num_partitions == 1:
                outs = [outs]
            for p, r in enumerate(outs):
                part_refs[p].append(r)
    futures = [
        compact.remote(p, postings_dir, block_size, deleted_ref, *part_refs[p])
        for p in range(num_partitions)
    ]
    manifest_rows = [r for r in ray.get(futures) if r is not None]

    # --- docmap: stream-filter tombstoned rows into the new slice
    docmap_files = sorted(
        f
        for s in manifest["slices"]
        for f in glob(os.path.join(index_dir, s["dir"], "docmap", "*.parquet"))
    )
    docmap_dir = os.path.join(slice_dir, "docmap")

    def drop_deleted(b: pa.Table) -> pa.Table:
        if not deleted.size:
            return b
        import pyarrow.compute as pc

        keep = pc.invert(pc.is_in(b["doc_id"], value_set=pa.array(deleted)))
        return b.filter(keep)

    rd.read_parquet(docmap_files).map_batches(
        drop_deleted, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(docmap_dir)
    n_docs = sum(
        pq.read_metadata(f).num_rows for f in glob(os.path.join(docmap_dir, "*.parquet"))
    )

    # --- positions sidecar (phrase queries), if present
    store_positions = bool(manifest.get("store_positions", False))
    if store_positions:
        pos_files = sorted(
            f
            for s in manifest["slices"]
            for f in glob(os.path.join(index_dir, s["dir"], "positions", "*.parquet"))
        )
        pos_dir = os.path.join(slice_dir, "positions")

        def add_pk(b: pa.Table) -> pa.Table:
            b = drop_deleted(b)
            pk = hash_strings(b["term"].to_pylist()) % np.int64(num_partitions)
            return b.append_column("pk", pa.array(pk.astype(np.int64)))

        def sort_group(g: pa.Table) -> pa.Table:
            return g.sort_by(
                [("term", "ascending"), ("doc_id", "ascending")]
            ).drop_columns(["pk"])

        (
            rd.read_parquet(pos_files)
            .map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pk")
            .map_groups(sort_group, batch_format="pyarrow")
            .write_parquet(pos_dir)
        )

    total_tokens = int(sum(r["tf_sum"] for r in manifest_rows))
    sm = {
        "input_files": [f"compacted:{d}" for d in old_dirs],
        "input_fingerprint": hashlib.sha256(
            (";".join(old_dirs) + "|" + deleted_tag).encode()
        ).hexdigest(),
        "n_docs": int(n_docs),
        "total_tokens": total_tokens,
        "num_partitions": num_partitions,
        "bucket_shift": manifest.get("bucket_shift", 17),
        "block_size": block_size,
        "analyzer_mode": manifest.get("analyzer_mode", "code"),
        "store_positions": store_positions,
        "partitions": sorted(manifest_rows, key=lambda r: r["kh"]),
        "resumed": False,
    }
    with open(os.path.join(slice_dir, "_slice_manifest.json"), "w") as f:
        json.dump(sm, f, indent=1)

    out = _finalize_index(
        index_dir,
        [sm],
        mode=manifest.get("analyzer_mode", "code"),
        bucket_shift=manifest.get("bucket_shift", 17),
        block_size=block_size,
        store_positions=store_positions,
        dirs=[rel_dir],
        deletes=None,  # tombstones are purged by the merge
    )

    if gc:
        import shutil

        for d in old_dirs:
            shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "deletes"), ignore_errors=True)
    return out
