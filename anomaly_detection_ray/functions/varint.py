"""Varint + delta codecs for posting lists — numpy-vectorized.

Posting lists are stored as delta-encoded (strictly increasing doc_ids
→ gaps) LEB128 varints, the classic inverted-index compression (Manning
et al., *Introduction to Information Retrieval*, ch. 5). Both encode and
decode are vectorized: the only Python-level loop is over byte
*positions* (≤ 10 iterations for 64-bit values), never over values —
this keeps the index-build and query hot paths out of row-at-a-time
Python.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7 bits-per-byte, rounded up


def encode_varint_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return per-value byte counts so callers can
    slice the stream into sub-ranges (one encode call per batch instead
    of one per posting run — the index-build hot path)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum(1, -(-nbits // 7))
    offsets = np.concatenate(([0], np.cumsum(nbytes)))[:-1]
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        sel = nbytes > j
        chunk = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[sel] > j + 1).astype(np.uint8) << 7
        out[offsets[sel] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative integers."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum(1, -(-nbits // 7))
    offsets = np.concatenate(([0], np.cumsum(nbytes)))[:-1]
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        sel = nbytes > j
        chunk = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[sel] > j + 1).astype(np.uint8) << 7
        out[offsets[sel] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def decode_varint(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if lengths.max() > _MAX_VARINT_BYTES:
        raise ValueError("varint longer than 10 bytes — corrupt stream")
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        sel = lengths > j
        out[sel] |= (b[starts[sel] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids → first value + successive gaps."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    out = np.empty_like(ids)
    out[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=out[1:])
    if ids.size > 1 and int(out[1:].min()) == 0:
        raise ValueError("doc ids must be strictly increasing for delta encoding")
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) → (delta-varint doc bytes, varint tf bytes)."""
    return encode_varint(delta_encode(doc_ids)), encode_varint(np.asarray(tfs))


def decode_postings(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(decode_varint(doc_bytes)), decode_varint(tf_bytes)
