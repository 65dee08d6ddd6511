"""Mergeable sketches: HyperLogLog cardinality + merging t-digest percentiles.

The reference's feature surface accepts sketch-backed aggregations from
the search engine: ``AbstractRetriever.java:80-89`` unwraps
``InternalTDigestPercentiles`` (t-digest percentile features) and the
profile path issues cardinality aggregations (``ProfileRunner.java:271,
301`` — HLL-backed in OpenSearch). These are *mergeable partials*: each
shard builds a fixed-size sketch and the coordinator merges them, so the
shuffle moves kilobytes per group instead of the group's distinct-value
set. This module supplies that scalability class for the fused
single-shuffle detect plan (``stages/window.py``): per-batch grouped
sketch construction, order-independent merge, final estimate.

Public algorithms only: HyperLogLog (Flajolet, Fusy, Gandouet, Meunier,
AofA 2007) with linear-counting small-range correction; t-digest
(Dunning & Ertl, arXiv:1902.04023) in the *merging* formulation with the
arcsine scale function's cluster boundaries (tail-concentrated, k1
family). Everything is deterministic (fixed hash seeds, no RNG) and
vectorized across groups — per-batch construction does one lexsort +
cumsum regardless of group count.

Wire formats (Arrow ``binary`` columns in partial rows):
- HLL: the raw ``2**p`` uint8 registers (p=12 → 4 KB, ~1.6 % rel. err).
- t-digest: interleaved float64 ``[w0, mean0, w1, mean1, …]`` bytes.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)

HLL_P = 12                  # 4096 registers; standard error 1.04/sqrt(m) ~ 1.6%
TDIGEST_COMPRESSION = 100   # max centroids per digest (~1.6 KB serialized)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same family as functions/minhash.py)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _U64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _U64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _U64
    return x ^ (x >> np.uint64(31))


def hash64_values(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes of a value array (strings via pandas'
    fixed-key SipHash, numerics via bit-pattern + splitmix64). The caller
    must have dropped nulls already (cardinality counts non-null)."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "US":
        import pandas as pd

        return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False).astype(np.uint64)
    if arr.dtype.kind == "f":
        a = arr.astype(np.float64) + 0.0          # -0.0 → +0.0: one distinct zero
        return _mix64(a.view(np.uint64))
    return _mix64(arr.astype(np.int64).view(np.uint64))


# --------------------------- HyperLogLog ---------------------------


def hll_build_grouped(codes: np.ndarray, n_groups: int, hashes: np.ndarray,
                      p: int = HLL_P) -> np.ndarray:
    """(n_groups, 2**p) uint8 register matrix from per-row group codes +
    64-bit value hashes. Vectorized: one maximum.at over all rows."""
    m = 1 << p
    regs = np.zeros((n_groups, m), dtype=np.uint8)
    if hashes.size == 0:
        return regs
    h = hashes.astype(np.uint64)
    ridx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - p)) - 1)
    # bit length of rest via frexp (exact for ints < 2**53; 64-p ≤ 52)
    bl = np.frexp(rest.astype(np.float64))[1]
    rho = ((64 - p) - bl + 1).astype(np.uint8)     # 1..64-p+1
    flat = regs.reshape(-1)
    np.maximum.at(flat, codes.astype(np.int64) * m + ridx, rho)
    return regs


def hll_merge(regs_rows: np.ndarray) -> np.ndarray:
    """Merge k register vectors (k, m) → (m,): elementwise max
    (order-independent, idempotent)."""
    return np.maximum.reduce(np.atleast_2d(regs_rows), axis=0)


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet estimator + linear-counting small-range correction."""
    regs = np.asarray(regs, dtype=np.float64)
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = float(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)               # linear counting
    return float(est)


# --------------------------- merging t-digest ---------------------------


def _boundaries(m: int) -> np.ndarray:
    """Arcsine-scale cluster boundaries: q_j = (1 - cos(pi j / m)) / 2 —
    tail-concentrated cluster sizes, the k1 scale family of Dunning &
    Ertl §3 (boundaries at equal increments of the scale function)."""
    return (1.0 - np.cos(np.pi * np.arange(m + 1) / m)) / 2.0


def tdigest_build_grouped(codes: np.ndarray, n_groups: int, values: np.ndarray,
                          compression: int = TDIGEST_COMPRESSION) -> list[bytes]:
    """Per-group t-digests from raw values (nulls pre-dropped).

    Vectorized across ALL groups: one lexsort by (code, value), one
    global cumsum, then an (n_groups × m+1) boundary matrix indexes
    segment sums — no per-row Python. Returns one serialized digest per
    group (interleaved [w, mean] float64 bytes)."""
    q = _boundaries(compression)
    out: list[bytes] = [b""] * n_groups
    if values.size == 0:
        return out
    v = np.asarray(values, dtype=np.float64)
    c = np.asarray(codes, dtype=np.int64)
    order = np.lexsort((v, c))
    v, c = v[order], c[order]
    grp, starts, counts = np.unique(c, return_index=True, return_counts=True)
    cs = np.concatenate(([0.0], np.cumsum(v)))
    # segment end positions per (group, boundary): starts + round(q * n)
    pos = starts[:, None] + np.rint(q[None, :] * counts[:, None]).astype(np.int64)
    seg_w = np.diff(pos, axis=1).astype(np.float64)
    seg_sum = cs[pos[:, 1:]] - cs[pos[:, :-1]]
    with np.errstate(invalid="ignore", divide="ignore"):
        seg_mean = seg_sum / seg_w
    for gi in range(grp.size):
        keep = seg_w[gi] > 0
        blob = np.empty(2 * int(keep.sum()))
        blob[0::2] = seg_w[gi][keep]
        blob[1::2] = seg_mean[gi][keep]
        out[int(grp[gi])] = blob.tobytes()
    return out


def _decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    a = np.frombuffer(blob, dtype=np.float64)
    return a[0::2].copy(), a[1::2].copy()         # weights, means


def tdigest_merge(blobs, compression: int = TDIGEST_COMPRESSION) -> bytes:
    """Merge serialized digests: concat centroids, sort by mean, recompress
    on cumulative-weight boundaries (Dunning & Ertl merge pass, with the
    deterministic boundary formulation — order-independent given the sort)."""
    ws, ms = [], []
    for b in blobs:
        if b:
            w, mu = _decode(b)
            ws.append(w)
            ms.append(mu)
    if not ws:
        return b""
    w = np.concatenate(ws)
    mu = np.concatenate(ms)
    order = np.lexsort((w, mu))                   # by mean; weight tie-break
    w, mu = w[order], mu[order]
    if w.size <= compression:
        blob = np.empty(2 * w.size)
        blob[0::2], blob[1::2] = w, mu
        return blob.tobytes()
    W = w.sum()
    cw = np.cumsum(w)
    # assign each centroid to the boundary segment containing its cum-midpoint
    mid = cw - w / 2.0
    seg = np.clip(np.searchsorted(_boundaries(compression) * W, mid, side="right") - 1,
                  0, compression - 1)
    out_w = np.zeros(compression)
    out_s = np.zeros(compression)
    np.add.at(out_w, seg, w)
    np.add.at(out_s, seg, w * mu)
    keep = out_w > 0
    blob = np.empty(2 * int(keep.sum()))
    blob[0::2] = out_w[keep]
    blob[1::2] = out_s[keep] / out_w[keep]
    return blob.tobytes()


def tdigest_quantile(blob: bytes, q: float) -> float:
    """Standard t-digest quantile interpolation over centroid midpoints."""
    if not blob:
        return float("nan")
    w, mu = _decode(blob)
    if w.size == 1:
        return float(mu[0])
    cw = np.cumsum(w)
    W = cw[-1]
    mid = cw - w / 2.0
    target = q * W
    if target <= mid[0]:
        return float(mu[0])
    if target >= mid[-1]:
        return float(mu[-1])
    i = np.searchsorted(mid, target, side="right")
    t = (target - mid[i - 1]) / (mid[i] - mid[i - 1])
    return float(mu[i - 1] + t * (mu[i] - mu[i - 1]))
