"""File sources beyond Parquet — CSV and JSON-lines event logs.

The reference ingests documents/events through OpenSearch's REST layer;
a Ray-Data-first engine's equivalent surface is "point me at files".
Parquet is the first-class format (column pruning, row-group splits —
``read_parquet(columns=…)`` everywhere); CSV/JSONL are accepted as
ingest formats and normalized to the same schema so every pipeline
(detect / forecast / windowed aggs) runs unchanged on them.

Normalization rules:
- the timestamp column parses to ``timestamp[ms]`` (epoch seconds /
  millis are auto-detected by magnitude; ISO strings parse via Arrow),
- other columns keep their inferred types.

CSV/JSONL cannot prune columns at the read (row formats ship every
byte), so ``columns=`` projects immediately after parsing — correct,
but Parquet remains the format that avoids reading dead columns at all
(documented trade-off, not hidden).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EPOCH_SECONDS_MAX = 10_000_000_000  # ~2286-11 in seconds; beyond → millis


def normalize_ts(batch: pa.Table, ts_col: str) -> pa.Table:
    """Coerce ``ts_col`` to timestamp[ms] from epoch numbers or strings."""
    col = batch[ts_col]
    t = col.type
    if pa.types.is_timestamp(t):
        return batch
    i = batch.column_names.index(ts_col)
    if pa.types.is_floating(t):
        # Fractional epochs (e.g. CSV epoch-seconds 1700000000.25): detect the
        # unit on the float values, scale to ms while still float (preserving
        # sub-second precision), round, then cast — a direct int64 cast raises
        # ArrowInvalid on any fractional value.
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        npv = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        finite = npv[np.isfinite(npv) & (npv != 0)]
        if finite.size and np.median(np.abs(finite)) < _EPOCH_SECONDS_MAX:
            npv = npv * 1000.0
        npv = np.rint(npv)
        npv = np.where(np.isfinite(npv), npv, 0.0)
        return batch.set_column(i, ts_col, pa.array(npv.astype(np.int64), pa.int64()).cast(pa.timestamp("ms")))
    if pa.types.is_integer(t):
        vals = pc.cast(col, pa.int64())
        arr = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        npv = arr.to_numpy(zero_copy_only=False)
        finite = npv[npv != 0]
        # auto-detect unit by magnitude (epoch seconds vs millis)
        if finite.size and np.median(np.abs(finite)) < _EPOCH_SECONDS_MAX:
            npv = npv * 1000
        return batch.set_column(i, ts_col, pa.array(npv, pa.int64()).cast(pa.timestamp("ms")))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        parsed = pc.cast(pc.cast(col, pa.timestamp("ns")), pa.timestamp("ms"))
        return batch.set_column(i, ts_col, parsed)
    raise ValueError(f"cannot normalize timestamp column of type {t}")


def read_events(paths, format: str | None = None, ts_col: str = "ts",
                columns: list[str] | None = None, override_num_blocks: int | None = None):
    """events Dataset from parquet / csv / jsonl files, ts normalized.

    ``format=None`` infers from the first path's extension."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    fmt = format
    if fmt is None:
        p = paths[0].lower()
        if p.endswith((".parquet", ".pq")):
            fmt = "parquet"
        elif p.endswith((".csv", ".csv.gz")):
            fmt = "csv"
        elif p.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        else:
            raise ValueError(f"cannot infer format from {paths[0]!r}; pass format=")
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    if fmt == "parquet":
        ds = rd.read_parquet(paths, columns=columns, **kw)
    elif fmt == "csv":
        ds = rd.read_csv(paths, **kw)
    elif fmt == "json":
        ds = rd.read_json(paths, **kw)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if fmt != "parquet" and columns:
        ds = ds.select_columns(columns)

    def norm(b: pa.Table) -> pa.Table:
        return normalize_ts(b, ts_col) if ts_col in b.column_names else b

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
