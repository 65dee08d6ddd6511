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
from .segments import DEFAULT_BLOCK_SIZE, POSTINGS_SCHEMA, decode_chunk_row, encode_chunk

MANIFEST_NAME = "manifest.json"


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

    group = group.sort_by([("term", "ascending"), ("bucket", "ascending"), ("first_doc", "ascending")])
    terms = group["term"].to_pylist()
    buckets = group["bucket"].to_numpy()
    rows_py = group.select(
        ["docs", "tfs", "dls", "block_doc_off", "block_tf_off", "block_dl_off"]
    ).to_pylist()

    out_rows = []
    i, n = 0, len(terms)
    while i < n:
        j = i
        while j < n and terms[j] == terms[i] and buckets[j] == buckets[i]:
            j += 1
        parts = [decode_chunk_row(rows_py[x]) for x in range(i, j)]
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        order = np.argsort(docs, kind="stable")
        docs, tfs, dls = docs[order], tfs[order], dls[order]
        if docs.size > 1 and (np.diff(docs) == 0).any():
            raise ValueError(f"duplicate doc_id in postings for term {terms[i]!r}")
        out_rows.append(encode_chunk(terms[i], int(buckets[i]), docs, tfs, dls, block_size))
        i = j

    tbl = pa.Table.from_pylist(out_rows, schema=POSTINGS_SCHEMA)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=4096)
    os.replace(tmp, path)

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
    batch_size: int = 1024,
    concurrency: int | None = None,
    keep_cols=("repo", "path", "commit", "lang"),
) -> dict:
    """Build one index slice; returns its manifest dict. Skips the whole
    slice when a valid ``_slice_manifest.json`` already matches."""
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

    from ..util import pool

    # autoscaling pool: leaves headroom for the read and shuffle stages
    concurrency = pool(concurrency)

    corpus = rd.read_parquet(files, columns=[id_col, text_col])
    n_docs = corpus.count()

    tok_kwargs = dict(
        text_col=text_col, id_col=id_col, mode=mode, bucket_shift=bucket_shift, block_size=block_size
    )
    chunks = corpus.map_batches(
        TokenizeCombine,
        fn_constructor_kwargs=tok_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    ).map_batches(
        partial(_add_partition_key, num_partitions=num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    manifest_rows = (
        chunks.groupby("kh")
        .map_groups(
            partial(merge_partition, out_dir=postings_dir, block_size=block_size),
            batch_format="pyarrow",
        )
        .take_all()
    )

    # docmap + lineage pass (projection only — content analyzed once, above)
    meta_cols = [id_col, text_col] + [c for c in keep_cols]
    avail = set(pq.read_schema(files[0]).names)
    meta_cols = [c for c in meta_cols if c in avail]
    rd.read_parquet(files, columns=meta_cols).map_batches(
        DocMap,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, keep_cols=keep_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    ).write_parquet(docmap_dir)

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
        "partitions": sorted(manifest_rows, key=lambda r: r["kh"]),
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
    import ray.data as rd
    from ray.data.aggregate import Sum

    os.makedirs(out_dir, exist_ok=True)
    file_groups = [list(g) for g in np.array_split(sorted(input_files), slices) if len(g)]
    slice_manifests = []
    for i, files in enumerate(file_groups):
        slice_dir = os.path.join(out_dir, "segments", f"slice-{i:04d}")
        slice_manifests.append(build_slice(list(files), slice_dir, **kwargs))

    # global term stats (df, cttf): tiny groupby over the chunk-stat columns
    posting_files = sorted(
        os.path.join(out_dir, "segments", f"slice-{i:04d}", "postings", p["path"])
        for i, m in enumerate(slice_manifests)
        for p in m["partitions"]
    )
    stats = (
        rd.read_parquet(posting_files, columns=["term", "df_chunk", "tf_sum"])
        .groupby("term")
        .aggregate(Sum("df_chunk", alias_name="df"), Sum("tf_sum", alias_name="cttf"))
    )
    stats_tbl = stats.to_pandas()
    stats_tbl = stats_tbl.sort_values("term").reset_index(drop=True)
    stats_path = os.path.join(out_dir, "stats.parquet")
    pq.write_table(pa.Table.from_pandas(stats_tbl, preserve_index=False), stats_path)

    n_docs = int(sum(m["n_docs"] for m in slice_manifests))
    total_tokens = int(sum(m["total_tokens"] for m in slice_manifests))
    manifest = {
        "format": "anomaly_detection_ray.index/v1",
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "n_terms": int(len(stats_tbl)),
        "analyzer_mode": kwargs.get("mode", "code"),
        "bucket_shift": kwargs.get("bucket_shift", 17),
        "block_size": kwargs.get("block_size", DEFAULT_BLOCK_SIZE),
        "stats_sha256": sha256_file(stats_path),
        "slices": [
            {
                "dir": f"segments/slice-{i:04d}",
                "n_docs": m["n_docs"],
                "resumed": m.get("resumed", False),
                "partitions": m["partitions"],
            }
            for i, m in enumerate(slice_manifests)
        ],
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
