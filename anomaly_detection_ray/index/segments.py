"""On-disk segment format for posting lists.

A built index directory looks like:

    index_dir/
      manifest.json                 # global stats: n_docs, avgdl, slices, file sha256 lineage
      stats.parquet                 # term → df, cttf   (global term dictionary stats)
      segments/slice-{s:04d}/
        _slice_manifest.json        # per-slice input fingerprint → resume without recompute
        postings/part-{kh:05d}.parquet
        docmap/part-*.parquet       # doc_id → repo/path/commit/lang/content_sha256/dl

Each postings row is one *chunk*: the posting list of one term restricted
to one doc-id bucket (``bucket = doc_id >> bucket_shift``), doc-ordered,
delta + LEB128-varint compressed, with block-max skip metadata every
``block_size`` postings (classic block-max layout, Ding & Suel, "Faster
top-k document retrieval using block-max indexes", SIGIR'11):

    term:string, bucket:int64, first_doc:int64, last_doc:int64,
    df_chunk:int32, tf_sum:int64,
    docs:binary (delta-varint), tfs:binary (varint), dls:binary (varint),
    block_last:list<int64>, block_max_tf:list<int32>, block_min_dl:list<int32>

``dls`` (per-posting document length) rides with the postings so BM25
scoring needs no doc-side join; the block upper bound
``tf_norm(max_tf, min_dl)`` is a valid impact bound because tf_norm is
monotone increasing in tf and decreasing in dl.

Rows within a part file are sorted by (term, bucket, first_doc) so
Parquet row-group statistics prune term lookups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.varint import decode_varint, delta_decode, delta_encode, encode_varint

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int64()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("df_chunk", pa.int32()),
        ("tf_sum", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        ("block_doc_off", pa.list_(pa.int32())),
        ("block_tf_off", pa.list_(pa.int32())),
        ("block_dl_off", pa.list_(pa.int32())),
    ]
)

DEFAULT_BLOCK_SIZE = 128


def encode_chunk(
    term: str,
    bucket: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> dict:
    """Encode one doc-ordered (term, bucket) posting chunk into a row dict.

    Delta encoding restarts at every block boundary (first doc of a
    block is stored raw), so a single block can be decoded without
    touching the preceding bytes — that is what makes block-max skipping
    an actual skip and not a decode-then-discard. ``block_*_off`` are
    byte offsets of each block's start in the three streams.
    """
    n = doc_ids.size
    nblocks = -(-n // block_size)
    starts = np.arange(nblocks) * block_size
    ends = np.minimum(starts + block_size, n)
    doc_parts, tf_parts, dl_parts = [], [], []
    doc_off = np.zeros(nblocks, dtype=np.int32)
    tf_off = np.zeros(nblocks, dtype=np.int32)
    dl_off = np.zeros(nblocks, dtype=np.int32)
    pos_d = pos_t = pos_l = 0
    for i, (s, e) in enumerate(zip(starts, ends)):
        doc_off[i], tf_off[i], dl_off[i] = pos_d, pos_t, pos_l
        db = encode_varint(delta_encode(doc_ids[s:e]))
        tb = encode_varint(tfs[s:e])
        lb = encode_varint(dls[s:e])
        doc_parts.append(db)
        tf_parts.append(tb)
        dl_parts.append(lb)
        pos_d += len(db)
        pos_t += len(tb)
        pos_l += len(lb)
    return {
        "term": term,
        "bucket": int(bucket),
        "first_doc": int(doc_ids[0]),
        "last_doc": int(doc_ids[-1]),
        "df_chunk": int(n),
        "tf_sum": int(tfs.sum()),
        "docs": b"".join(doc_parts),
        "tfs": b"".join(tf_parts),
        "dls": b"".join(dl_parts),
        "block_first": doc_ids[starts].astype(np.int64).tolist(),
        "block_last": doc_ids[ends - 1].astype(np.int64).tolist(),
        "block_max_tf": np.maximum.reduceat(tfs, starts).astype(np.int32).tolist(),
        "block_min_dl": np.minimum.reduceat(dls, starts).astype(np.int32).tolist(),
        "block_doc_off": doc_off.tolist(),
        "block_tf_off": tf_off.tolist(),
        "block_dl_off": dl_off.tolist(),
    }


def encode_rows_batched(
    terms: np.ndarray,
    buckets: np.ndarray,
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> pa.Table:
    """Vectorized bulk encoder: one POSTINGS_SCHEMA row per run
    ``[starts[r], ends[r])`` of the (doc-ordered) posting arrays.
    All runs share three varint streams (one encode call per column);
    per-run/per-block byte ranges come from size cumsums; list columns
    are built zero-copy with ``ListArray.from_arrays``. This is the
    phase-2 merge hot path — no per-posting Python."""
    from ..functions.varint import encode_varint_with_sizes

    R = starts.size
    run_lens = ends - starts
    nblocks = -(-run_lens // block_size)
    total_blocks = int(nblocks.sum())
    first_block_of_run = np.concatenate(([0], np.cumsum(nblocks)))
    run_of_block = np.repeat(np.arange(R), nblocks)
    blk_in_run = np.arange(total_blocks) - first_block_of_run[run_of_block]
    bstarts = starts[run_of_block] + blk_in_run * block_size
    bends = np.minimum(bstarts + block_size, ends[run_of_block])

    deltas = np.empty_like(docs, dtype=np.uint64)
    d64 = docs.astype(np.uint64)
    deltas[1:] = d64[1:] - d64[:-1]
    deltas[bstarts] = d64[bstarts]  # delta restarts at every block start
    doc_stream, doc_sz = encode_varint_with_sizes(deltas)
    tf_stream, tf_sz = encode_varint_with_sizes(tfs.astype(np.uint64))
    dl_stream, dl_sz = encode_varint_with_sizes(dls.astype(np.uint64))
    doc_off = np.concatenate(([0], np.cumsum(doc_sz)))
    tf_off = np.concatenate(([0], np.cumsum(tf_sz)))
    dl_off = np.concatenate(([0], np.cumsum(dl_sz)))

    list_offsets = pa.array(first_block_of_run, type=pa.int32())
    blk_rel_doc = (doc_off[bstarts] - doc_off[starts[run_of_block]]).astype(np.int32)
    blk_rel_tf = (tf_off[bstarts] - tf_off[starts[run_of_block]]).astype(np.int32)
    blk_rel_dl = (dl_off[bstarts] - dl_off[starts[run_of_block]]).astype(np.int32)

    def lst(values: np.ndarray, typ) -> pa.ListArray:
        return pa.ListArray.from_arrays(list_offsets, pa.array(values, type=typ))

    return pa.table(
        {
            "term": pa.array(terms),
            "bucket": pa.array(buckets, type=pa.int64()),
            "first_doc": pa.array(docs[starts], type=pa.int64()),
            "last_doc": pa.array(docs[ends - 1], type=pa.int64()),
            "df_chunk": pa.array(run_lens.astype(np.int32)),
            "tf_sum": pa.array(np.add.reduceat(tfs, starts), type=pa.int64()),
            "docs": pa.array([doc_stream[doc_off[s] : doc_off[e]] for s, e in zip(starts, ends)], type=pa.binary()),
            "tfs": pa.array([tf_stream[tf_off[s] : tf_off[e]] for s, e in zip(starts, ends)], type=pa.binary()),
            "dls": pa.array([dl_stream[dl_off[s] : dl_off[e]] for s, e in zip(starts, ends)], type=pa.binary()),
            "block_first": lst(d64[bstarts].astype(np.int64), pa.int64()),
            "block_last": lst(d64[bends - 1].astype(np.int64), pa.int64()),
            "block_max_tf": lst(np.maximum.reduceat(tfs, bstarts).astype(np.int32), pa.int32()),
            "block_min_dl": lst(np.minimum.reduceat(dls, bstarts).astype(np.int32), pa.int32()),
            "block_doc_off": lst(blk_rel_doc, pa.int32()),
            "block_tf_off": lst(blk_rel_tf, pa.int32()),
            "block_dl_off": lst(blk_rel_dl, pa.int32()),
        },
        schema=POSTINGS_SCHEMA,
    )


def decode_block(row: dict, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block ``i`` of a chunk row dict (columns as python values)."""
    nb = len(row["block_doc_off"])

    def sl(stream: bytes, offs: list[int]) -> bytes:
        end = offs[i + 1] if i + 1 < nb else len(stream)
        return stream[offs[i] : end]

    docs = delta_decode(decode_varint(sl(row["docs"], row["block_doc_off"]))).astype(np.int64)
    tfs = decode_varint(sl(row["tfs"], row["block_tf_off"])).astype(np.int64)
    dls = decode_varint(sl(row["dls"], row["block_dl_off"])).astype(np.int64)
    return docs, tfs, dls


def decode_chunks_bulk(rows: list[dict], block_size: int = DEFAULT_BLOCK_SIZE):
    """Decode MANY chunk rows with three ``decode_varint`` calls total.

    Streams are concatenated; delta-restart positions are every
    ``block_size`` values within each row (plus each row start), so
    absolute doc ids come from one global cumsum with vectorized resets.
    Returns ``(docs, tfs, dls, row_value_offsets)`` where row r spans
    ``[off[r], off[r+1])``. This is the query-side hot path — the
    per-block ``decode_block`` calls cost ~30 µs each and a dense term
    can have thousands of blocks."""
    from ..functions.varint import decode_varint

    dfs = np.asarray([r["df_chunk"] for r in rows], dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(dfs)))
    deltas = decode_varint(b"".join(r["docs"] for r in rows))
    tfs = decode_varint(b"".join(r["tfs"] for r in rows)).astype(np.int64)
    dls = decode_varint(b"".join(r["dls"] for r in rows)).astype(np.int64)
    if deltas.size != off[-1]:
        raise ValueError("posting stream length mismatch")
    # reset positions: row_start + k·block_size for each row
    nblocks = -(-dfs // block_size)
    first_block = np.concatenate(([0], np.cumsum(nblocks)))
    row_of_block = np.repeat(np.arange(dfs.size), nblocks)
    blk_in_row = np.arange(int(nblocks.sum())) - first_block[row_of_block]
    resets = off[row_of_block] + blk_in_row * block_size
    seg_lens = np.diff(np.append(resets, off[-1]))
    c = np.cumsum(deltas)
    base = np.repeat(c[resets] - deltas[resets], seg_lens)
    docs = (c - base).astype(np.int64)
    return docs, tfs, dls, off


def decode_docs_bulk(rows: list[dict], block_size: int = DEFAULT_BLOCK_SIZE):
    """Docs-only variant of :func:`decode_chunks_bulk` — one
    ``decode_varint`` pass over the doc stream, tf/dl streams untouched.
    The filter-context hot path for multi-term (wildcard/fuzzy/terms)
    unions, where only membership matters: 1/3 the varint work and no
    impact arrays. Returns ``(docs, row_value_offsets)``."""
    dfs = np.asarray([r["df_chunk"] for r in rows], dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(dfs)))
    deltas = decode_varint(b"".join(r["docs"] for r in rows))
    if deltas.size != off[-1]:
        raise ValueError("posting stream length mismatch")
    nblocks = -(-dfs // block_size)
    first_block = np.concatenate(([0], np.cumsum(nblocks)))
    row_of_block = np.repeat(np.arange(dfs.size), nblocks)
    blk_in_row = np.arange(int(nblocks.sum())) - first_block[row_of_block]
    resets = off[row_of_block] + blk_in_row * block_size
    seg_lens = np.diff(np.append(resets, off[-1]))
    c = np.cumsum(deltas)
    base = np.repeat(c[resets] - deltas[resets], seg_lens)
    return (c - base).astype(np.int64), off


def decode_chunk_row(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full chunk row dict → (doc_ids, tfs, dls)."""
    nb = len(row["block_doc_off"])
    if nb <= 1:
        return (
            delta_decode(decode_varint(row["docs"])).astype(np.int64),
            decode_varint(row["tfs"]).astype(np.int64),
            decode_varint(row["dls"]).astype(np.int64),
        )
    parts = [decode_block(row, i) for i in range(nb)]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )
