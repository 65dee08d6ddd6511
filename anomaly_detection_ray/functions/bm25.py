"""Okapi BM25 scoring math (k1=1.2, b=0.75 per the north rule).

Formula (classic Okapi with the Lucene non-negative idf variant):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d)   = Σ_{t ∈ q} idf(t) * tf_norm(t, d)

All arithmetic is float64, term contributions summed in ascending
query-term order, so the brute-force oracle, the SQL oracle and the
vectorized engine agree bit-for-bit up to summation order (tolerance
1e-9; published results round to 6 decimals). Tie-break: score desc,
doc_id asc — fixed here and mirrored in every oracle.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc) — the canonical
    tie-break shared with the oracles."""
    order = np.lexsort((doc_ids, -scores))
    return order[:k]
