"""Time-decayed priority top-k — SURVEY.md §2.D3.

Reimplements the math of ``timeseries/caching/PriorityTracker.java``
(used by the historical HC path, ``ADBatchTaskRunner.java:318-410``, to
pick the top-1000 entities): each occurrence of an entity in period
``n`` (periods since the detector's landmark) contributes weight
``g(n) = e^{0.125·n}``; an entity's priority is the log of its
accumulated weighted count — PriorityTracker's sequential
``p += log(1 + e^{inc−p})`` update telescopes to exactly
``log Σ_j g(n_j)`` over the entity's occurrences, so one groupby
reproduces the streaming accumulation bit-for-bit in exact arithmetic.

Computed stably as ``log Σ count_n · e^{0.125(n−n_max)} + 0.125·n_max``
(log-sum-exp shift). Two-phase: per-batch (entity, period) partial
counts inside ``map_batches``, then one small groupby — recent periods
dominate, so hot entities stay hot and idle ones decay, without any
per-event state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DECAY = 0.125  # PriorityTracker's g(n) = e^{0.125 n}


def decayed_top_entities(
    ds,
    entity_col: str,
    ts_col: str = "ts",
    period_ms: int = 600_000,
    k: int = 10,
    decay: float = DECAY,
    landmark_ms: int = 0,
):
    """events Dataset → top-k entities by time-decayed occurrence count.

    Returns a pandas DataFrame (entity_col, priority) ordered by
    priority desc, entity asc; priority rounded to 6 decimals."""
    from ray.data.aggregate import Max, Sum

    from .window import add_window_columns

    ds = ds.map_batches(
        lambda b: add_window_columns(b, ts_col, 1), batch_format="pyarrow", zero_copy_batch=True
    )

    def partial(b: pa.Table) -> pa.Table:
        n = (b["window_start_ms"].to_numpy() - landmark_ms) // period_ms
        df = pd.DataFrame({entity_col: b[entity_col].to_pandas(), "n": n})
        g = df.groupby([entity_col, "n"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = counts.groupby([entity_col, "n"]).aggregate(Sum("cnt", alias_name="cnt"))
    n_max = int(counts.aggregate(Max("n", alias_name="m"))["m"])

    def weigh(b: pa.Table) -> pa.Table:
        w = b["cnt"].to_numpy() * np.exp(decay * (b["n"].to_numpy().astype(np.float64) - n_max))
        return pa.table({entity_col: b[entity_col], "w": pa.array(w)})

    pri = (
        counts.map_batches(weigh, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(entity_col)
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    pri["priority"] = np.round(np.log(pri["w"]) + decay * n_max, 6)
    pri = pri.sort_values(["priority", entity_col], ascending=[False, True], kind="stable").head(k)
    return pri[[entity_col, "priority"]].reset_index(drop=True)
