"""Deterministic hashing: murmur3-128 entity ids, term/doc partitioning.

The entity → model-id recipe reproduces the reference exactly
(``timeseries/model/Entity.java:232-301``): attributes sorted by key,
normalized to ``k1=v1,k2=v2``, murmur3 x64 128 hashed, base64url — so
model ids are byte-identical to the reference's for the same inputs.

Term/partition hashing uses pandas' deterministic SipHash
(``pd.util.hash_array`` with the fixed default key) — stable across
processes and nodes, vectorized over whole Arrow columns.
"""

from __future__ import annotations

import base64
import hashlib
import struct

import numpy as np
import pandas as pd


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (public domain algorithm, Austin Appleby).

    Returns ``(h1, h2)`` as unsigned 64-bit ints. The reference
    serializes them big-endian h1‖h2 (``Entity.java:294-298``,
    ``Numbers.longToBytes``); see :func:`entity_model_id`.
    """
    M = 0xFFFFFFFFFFFFFFFF
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & M
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


def normalize_entity(attributes: dict[str, str]) -> str:
    """Sorted ``k1=v1,k2=v2`` string — ``Entity.java:232-246``."""
    return ",".join(f"{k}={attributes[k]}" for k in sorted(attributes))


def entity_model_id(config_id: str, attributes: dict[str, str]) -> str:
    """``configId + "_entity_" + base64url(murmur3_128(normalized, seed=42))``
    with h1‖h2 big-endian, no padding — ``Entity.java:58,281-301``."""
    h1, h2 = murmur3_x64_128(normalize_entity(attributes).encode("utf-8"), seed=42)
    digest = struct.pack(">QQ", h1, h2)
    b64 = base64.urlsafe_b64encode(digest).decode("ascii").rstrip("=")
    return f"{config_id}_entity_{b64}"


def hash_strings(values, *, dtype=np.uint64) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string array/column."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(dtype)


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha256(data).hexdigest()


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()
