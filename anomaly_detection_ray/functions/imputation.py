"""Imputation — SURVEY.md §2.B5/B6/B7.

``linear_uniform_impute`` reproduces the reference's
``LinearUniformImputer.singleFeatureImpute``
(``timeseries/dataprocessor/LinearUniformImputer.java:42-81``) exactly,
including the integer-sensitive rounding and the last-point pin.
``fill_missing`` implements the streaming fill policies fed to the model
(``ModelColdStart.java:536-563``, ``ImputationMethod.java``), and
``shingle_fill_nearest`` the cold-start nearest-neighbor fill
(``FeatureManager.java:202-229``).
"""

from __future__ import annotations

import numpy as np


def linear_uniform_impute(samples: np.ndarray, num_imputed: int, integer_sensitive: bool = False) -> np.ndarray:
    """Stretch ``(n, f)`` samples to ``(num_imputed, f)`` piecewise-linearly."""
    samples = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    n, f = samples.shape
    if n == 0:
        return np.empty((0, f))
    if n == 1:
        out = np.repeat(samples, num_imputed, axis=0)
    else:
        idx = np.arange(num_imputed - 1, dtype=np.float64)
        t_global = idx / (num_imputed - 1.0)
        t_interval = t_global * (n - 1.0)
        left = np.floor(t_interval).astype(np.int64)
        frac = (t_interval - left)[:, None]
        out = np.empty((num_imputed, f))
        out[:-1] = (1.0 - frac) * samples[left] + frac * samples[left + 1]
        out[-1] = samples[-1]
    if integer_sensitive and np.all(samples == np.rint(samples)):
        out = np.rint(out)
    return out


def fill_missing(values: np.ndarray, method: str = "zero", fixed_value: float = 0.0) -> np.ndarray:
    """Replace NaNs column-wise: ``zero`` | ``fixed`` | ``previous`` | ``linear``."""
    v = np.array(values, dtype=np.float64, copy=True)
    mask = np.isnan(v)
    if not mask.any():
        return v
    if method == "zero":
        v[mask] = 0.0
    elif method == "fixed":
        v[mask] = fixed_value
    elif method == "previous":
        for j in range(v.shape[1] if v.ndim > 1 else 1):
            col = v[:, j] if v.ndim > 1 else v
            m = np.isnan(col)
            idx = np.where(~m, np.arange(col.size), 0)
            np.maximum.accumulate(idx, out=idx)
            col[m] = col[idx[m]]
            col[np.isnan(col)] = 0.0  # leading NaNs
    elif method == "linear":
        for j in range(v.shape[1] if v.ndim > 1 else 1):
            col = v[:, j] if v.ndim > 1 else v
            m = np.isnan(col)
            if m.all():
                col[:] = 0.0
            else:
                col[m] = np.interp(np.flatnonzero(m), np.flatnonzero(~m), col[~m])
    else:
        raise ValueError(f"unknown imputation method {method!r}")
    return v


def shingle_fill_nearest(
    window: list[np.ndarray | None],
    max_missing_rate: float = 0.25,
    max_neighbor_distance: int = 2,
) -> np.ndarray | None:
    """Fill missing points in one shingle window from the nearest present
    neighbor (ties → the later/ceiling one, as the reference's
    ``ceilingEntry``-preferred lookup does); give up when more than
    ``floor(s · max_missing_rate)`` points are missing or a gap exceeds
    ``max_neighbor_distance``. Returns the concatenated shingle or None."""
    s = len(window)
    present = [i for i, w in enumerate(window) if w is not None]
    if len(present) < s - int(s * max_missing_rate):
        return None
    pres = np.asarray(present)
    filled = []
    for i in range(s):
        j = int(pres[np.argmin(np.abs(pres - i) - (pres >= i) * 0.5)])  # tie → ceiling
        if abs(i - j) > max_neighbor_distance:
            return None
        filled.append(window[j])
    return np.concatenate(filled)


def batch_shingle(points: np.ndarray, shingle_size: int) -> np.ndarray:
    """``(M, N) → (M−s+1, N·s)`` sliding concatenation —
    ``FeatureManager.java:248-263`` (vectorized)."""
    points = np.atleast_2d(points)
    m, n = points.shape
    if m < shingle_size or shingle_size < 1:
        raise ValueError("Invalid data for shingling.")
    idx = np.arange(m - shingle_size + 1)[:, None] + np.arange(shingle_size)[None, :]
    return points[idx].reshape(m - shingle_size + 1, n * shingle_size)
