"""Shingling, MinHash, SimHash, winnowing fingerprints — dedup primitives.

Public algorithms: MinHash (Broder 1997), banded LSH (Leskovec/Rajaraman/
Ullman, *Mining of Massive Datasets* ch. 3), SimHash (Charikar 2002),
winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003). All deterministic:
hash family derived from a fixed seed via splitmix-style mixing; no RNG
at call time. Vectorized over numpy; intended to run inside
``map_batches`` with per-actor precomputed hash parameters.
"""

from __future__ import annotations

import numpy as np

_MERSENNE = (1 << 61) - 1
_U64 = 0xFFFFFFFFFFFFFFFF


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic vectorized 64-bit mixing."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_U64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_U64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_U64)
    return x ^ (x >> np.uint64(31))


def token_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Distinct k-token shingles, joined with single spaces (the exact
    semantic the SQL oracle mirrors with list_slice + array_to_string)."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return sorted({" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)})


def hash_shingles(shingles: list[str]) -> np.ndarray:
    """Deterministic vectorized 64-bit hashes of shingle strings
    (pandas' fixed-key SipHash — stable across processes/nodes)."""
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    import pandas as pd

    # categorize=True factorizes first and hashes only distinct strings —
    # pure optimization, hash values identical (tokens repeat heavily)
    return pd.util.hash_array(np.asarray(shingles, dtype=object), categorize=True).astype(np.uint64)


def shingle_hashes_ref(tokens: list[str], k: int = 3) -> np.ndarray:
    """Per-doc scalar REFERENCE of the k-gram shingle hash: each shingle's
    64-bit id is a splitmix chain over its tokens' hashes (token_shingles
    semantics: docs shorter than k yield one shingle over all tokens).
    Returns the sorted distinct hash set. The batched
    :func:`batch_shingle_hashes` must be value-identical (tested)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    th = hash_shingles(tokens)
    m = min(k, len(tokens))
    n_win = len(tokens) - m + 1
    out = np.empty(n_win, dtype=np.uint64)
    for i in range(n_win):
        acc = np.uint64(0)
        for j in range(m):
            acc = _mix64(np.asarray([acc ^ th[i + j]], dtype=np.uint64))[0]
        out[i] = acc
    return np.unique(out)


def _concat_ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0) ++ [0..l1) ++ … as one array (vectorized arange-per-row)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    cs = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    return np.arange(total, dtype=np.int64) - np.repeat(cs, lengths)


def batch_shingle_hashes(token_lists: list[list[str]], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Sorted distinct k-gram shingle hashes for a BATCH of token lists —
    value-identical to per-doc :func:`shingle_hashes_ref`, with no
    per-position string building: one string-hash call over the batch's
    concatenated tokens, then k vectorized mix steps over all window
    starts at once (short docs handled per length class).

    Returns ``(values, offsets)``: doc d's set is
    ``values[offsets[d]:offsets[d+1]]`` (int64 view of the uint64 hash)."""
    D = len(token_lists)
    counts = np.fromiter((len(t) for t in token_lists), np.int64, D)
    offsets0 = np.concatenate(([0], np.cumsum(counts)))
    flat: list[str] = [tok for toks in token_lists for tok in toks]
    th = hash_shingles(flat)

    win_starts: list[np.ndarray] = []
    win_docs: list[np.ndarray] = []
    win_hashes: list[np.ndarray] = []
    # full k-windows for docs with ≥ k tokens
    nw = np.where(counts >= k, counts - k + 1, 0)
    if nw.sum():
        starts = np.repeat(offsets0[:-1], nw) + _concat_ranges(nw)
        acc = np.zeros(starts.size, dtype=np.uint64)
        for j in range(k):
            acc = _mix64(acc ^ th[starts + j])
        win_docs.append(np.repeat(np.arange(D, dtype=np.int64), nw))
        win_hashes.append(acc)
    # short docs (0 < n < k): one shingle over all n tokens, per length class
    for m in range(1, k):
        sel = np.flatnonzero(counts == m)
        if sel.size == 0:
            continue
        starts = offsets0[sel]
        acc = np.zeros(starts.size, dtype=np.uint64)
        for j in range(m):
            acc = _mix64(acc ^ th[starts + j])
        win_docs.append(sel.astype(np.int64))
        win_hashes.append(acc)

    if not win_docs:
        return np.empty(0, dtype=np.int64), np.zeros(D + 1, dtype=np.int64)
    dcode = np.concatenate(win_docs)
    h = np.concatenate(win_hashes)
    order = np.lexsort((h, dcode))
    dcode, h = dcode[order], h[order]
    # distinct per doc: drop rows equal to their predecessor within a doc
    keep = np.empty(dcode.size, dtype=bool)
    keep[0] = True
    keep[1:] = (dcode[1:] != dcode[:-1]) | (h[1:] != h[:-1])
    dcode, h = dcode[keep], h[keep]
    out_counts = np.bincount(dcode, minlength=D)
    offsets = np.concatenate(([0], np.cumsum(out_counts))).astype(np.int64)
    return h.view(np.int64), offsets


class MinHasher:
    """n_hashes minhash signatures over shingle hash sets.

    Hash family: h_i(x) = splitmix64(x ⊕ seed_i) — each seed acts as an
    independent pseudorandom permutation of the 64-bit space (wrapping
    uint64 arithmetic, fully vectorized; no bigint modmul)."""

    def __init__(self, n_hashes: int = 128, seed: int = 42):
        self.seeds = _mix64(np.arange(n_hashes, dtype=np.uint64) + np.uint64(seed * 0x9E37 + 1))
        self.n_hashes = n_hashes

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if shingle_hashes.size == 0:
            return np.full(self.n_hashes, _U64, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)[None, :] ^ self.seeds[:, None]
        return _mix64(x).min(axis=1)

    def band_keys(self, signature: np.ndarray, n_bands: int) -> np.ndarray:
        """LSH band hashes: (n_bands,) uint64, band i = mix of rows in band."""
        rows = self.n_hashes // n_bands
        sig = signature[: n_bands * rows].reshape(n_bands, rows)
        acc = np.zeros(n_bands, dtype=np.uint64)
        for j in range(rows):
            acc = _mix64(acc ^ sig[:, j])
        return acc

    def signatures_bulk(self, concat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(D, n_hashes) signatures for D docs whose shingle-hash sets are
        concatenated (doc d = ``concat[offsets[d]:offsets[d+1]]``) —
        value-identical to per-doc :meth:`signature`, vectorized with one
        segmented min per hash function. Empty docs get the all-ones
        signature (same as ``signature([])``)."""
        concat_hashes = np.asarray(concat_hashes, dtype=np.uint64)
        offsets = np.asarray(offsets, dtype=np.int64)
        D = offsets.size - 1
        out = np.full((D, self.n_hashes), _U64, dtype=np.uint64)
        ne = np.diff(offsets) > 0
        starts = offsets[:-1][ne]
        if concat_hashes.size and starts.size:
            for i in range(self.n_hashes):
                y = _mix64(concat_hashes ^ self.seeds[i])
                out[ne, i] = np.minimum.reduceat(y, starts)
        return out

    def band_keys_bulk(self, signatures: np.ndarray, n_bands: int) -> np.ndarray:
        """(D, n_bands) band hashes — value-identical to per-doc
        :meth:`band_keys`."""
        rows = self.n_hashes // n_bands
        sig = signatures[:, : n_bands * rows].reshape(-1, n_bands, rows)
        acc = np.zeros((sig.shape[0], n_bands), dtype=np.uint64)
        for j in range(rows):
            acc = _mix64(acc ^ sig[:, :, j])
        return acc


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def simhash(tokens: list[str], n_bits: int = 64) -> int:
    """Charikar SimHash over token multiset, 64-bit."""
    if not tokens:
        return 0
    hashes = hash_shingles(tokens)
    bits = ((hashes[:, None] >> np.arange(n_bits, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(n_bits):
        if v[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def winnow_fingerprints(tokens: list[str], k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprints: k-gram rolling hashes, minimum per
    window, rightmost-min tie-break (Schleimer et al. 2003, Fig. 5)."""
    grams = [" ".join(tokens[i : i + k]) for i in range(max(0, len(tokens) - k + 1))]
    if not grams:
        return []
    hs = hash_shingles(grams).astype(np.uint64)
    if hs.size <= window:
        return [int(hs.min())]
    picks = []
    for i in range(hs.size - window + 1):
        w = hs[i : i + window]
        j = int(np.flatnonzero(w == w.min())[-1]) + i  # rightmost minimum
        if not picks or picks[-1] != j:
            picks.append(j)
    return sorted({int(hs[j]) for j in picks})
