"""Result sink — SURVEY.md §2.A16 / §2.E2.

The reference bulk-writes results to a (rollover-managed) index with
pressure-based shedding (``ADResultBulkTransportAction.java:106-140``:
under soft pressure, grade-0 results are randomly dropped; under hard
pressure only anomalies are kept). Ray's streaming executor provides
backpressure natively, so the load-shedding knob survives as an explicit
``keep`` policy, and the rollover/partitioning concern becomes a
date-partitioned Parquet layout (one directory per day → reruns can
replace a day atomically; never one giant file)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def write_results(results_ds, out_dir: str, keep: str = "all"):
    """Write detector results partitioned by date.

    ``keep``: ``all`` | ``anomalies`` (grade > 0 only — the hard-pressure
    policy made explicit and deterministic)."""
    import pyarrow.compute as pc

    if keep not in ("all", "anomalies"):
        raise ValueError(f"unknown keep policy {keep!r}")
    ds = results_ds
    if keep == "anomalies":
        ds = ds.map_batches(
            lambda b: b.filter(pc.greater(b["anomaly_grade"], 0.0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def add_date(b: pa.Table) -> pa.Table:
        day = (b["window_end_ms"].to_numpy() // 86_400_000).astype(np.int64)
        return b.append_column("result_date", pa.array(day))

    ds = ds.map_batches(add_date, batch_format="pyarrow", zero_copy_batch=True)
    ds.write_parquet(out_dir, partition_cols=["result_date"])
    return out_dir


def write_forecast_results(forecast_ds, out_dir: str):
    """Forecast-result sink (``forecast/model/ForecastResult.java``
    persisted per-horizon rows): date-partitioned Parquet keyed on the
    forecast's ORIGIN day (the last observed window), so each job tick
    lands in its own partition and reruns replace it atomically."""

    def add_date(b: pa.Table) -> pa.Table:
        origin = b["forecast_window_start_ms"].to_numpy() - (
            b["horizon_index"].to_numpy() - 1
        ) * (b["forecast_window_end_ms"].to_numpy() - b["forecast_window_start_ms"].to_numpy())
        day = (origin // 86_400_000).astype(np.int64)
        return b.append_column("result_date", pa.array(day))

    ds = forecast_ds.map_batches(add_date, batch_format="pyarrow", zero_copy_batch=True)
    ds.write_parquet(out_dir, partition_cols=["result_date"])
    return out_dir
