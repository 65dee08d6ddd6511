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

import glob as _glob
import os

import numpy as np
import pyarrow as pa


def _count_parquet_rows(files) -> int:
    """Row count from parquet FOOTERS only (no data read)."""
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in files)


def _parquet_files(out_dir: str) -> set[str]:
    return set(_glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True))


def write_results(results_ds, out_dir: str, keep: str = "all", soft_keep_fraction: float = 0.5,
                  mode: str = "replace"):
    """Write detector results partitioned by date.

    ``keep`` mirrors ``ADResultBulkTransportAction.java:106-140``'s
    pressure ladder, made explicit and deterministic:

    - ``all`` — no shedding;
    - ``soft`` — soft index pressure: anomalies always kept, grade-0
      rows kept at ``soft_keep_fraction`` (selection by a deterministic
      hash of (model_id, window_end) instead of the reference's RNG, so
      reruns shed the same rows);
    - ``anomalies`` — hard pressure: grade > 0 only.

    ``mode``: ``replace`` (default — REPROCESSING semantics: this run's
    days atomically replace any previous content of those partitions) or
    ``append`` (INCREMENTAL-TICK semantics: a checkpointed job tick adds
    only its new windows, so earlier same-day rows must survive).

    Returns the number of rows THIS run wrote (post-shedding)."""
    import pyarrow.compute as pc

    if keep not in ("all", "soft", "anomalies"):
        raise ValueError(f"unknown keep policy {keep!r}")
    if mode not in ("replace", "append"):
        raise ValueError(f"unknown write mode {mode!r}")
    ds = results_ds
    if keep == "anomalies":
        ds = ds.map_batches(
            lambda b: b.filter(pc.greater(b["anomaly_grade"], 0.0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    elif keep == "soft":
        from ..functions.hashing import hash_strings

        def shed(b: pa.Table) -> pa.Table:
            grade = b["anomaly_grade"].to_numpy()
            key = [
                f"{m}|{w}"
                for m, w in zip(b["model_id"].to_pylist(), b["window_end_ms"].to_pylist())
            ]
            u = hash_strings(key).astype(np.float64) / float(2**64)
            keep_mask = (grade > 0.0) | (u < soft_keep_fraction)
            return b.filter(pa.array(keep_mask))

        ds = ds.map_batches(shed, batch_format="pyarrow", zero_copy_batch=True)

    def add_date(b: pa.Table) -> pa.Table:
        day = (b["window_end_ms"].to_numpy() // 86_400_000).astype(np.int64)
        return b.append_column("result_date", pa.array(day))

    ds = ds.map_batches(add_date, batch_format="pyarrow", zero_copy_batch=True)
    # the row count comes from the WRITE itself (parquet footers of
    # exactly the files this run produced) — a side-effect counter inside
    # a retryable map task double-counts replayed batches, and charged an
    # actor round-trip per batch on the write path. Append mode counts by
    # before/after file-set diff, which assumes ONE writer per out_dir at
    # a time — the same assumption 'replace' already makes (a concurrent
    # replace of the same partition would clobber files), and how the
    # job-tick runner uses it (one tick per results dir).
    if mode == "append":
        before = _parquet_files(out_dir)
        ds.write_parquet(out_dir, partition_cols=["result_date"])
        return _count_parquet_rows(_parquet_files(out_dir) - before)
    return _write_replacing_partitions(ds, out_dir)


def _write_replacing_partitions(ds, out_dir: str, partition_col: str = "result_date") -> int:
    """Partitioned write with PARTITION REPLACEMENT: the run streams
    ONCE into a staging directory, then each staged ``<partition_col>=``
    dir atomically swaps into place (old partition removed first) —
    rerunning a partition replaces it instead of appending duplicate
    files, with no materialization and no double execution of the
    pipeline (the rollover/replace semantics the reference gets from
    index management). Returns the number of rows staged (parquet
    footers of exactly this run's files)."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(out_dir, f".staging-{os.getpid()}")
    shutil.rmtree(staging, ignore_errors=True)
    try:
        ds.write_parquet(staging, partition_cols=[partition_col])
        if not os.path.isdir(staging):
            return 0  # zero-row dataset: Ray never created the staging dir
        n_rows = _count_parquet_rows(_parquet_files(staging))
        for name in sorted(os.listdir(staging)):
            if not name.startswith(f"{partition_col}="):
                continue
            dst = os.path.join(out_dir, name)
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(os.path.join(staging, name), dst)
        return n_rows
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def write_forecast_results(forecast_ds, out_dir: str, mode: str = "append"):
    """Forecast-result sink (``forecast/model/ForecastResult.java``
    persisted per-horizon rows): date-partitioned Parquet keyed on the
    forecast's ORIGIN day (the last observed window). Default ``append``
    — successive job ticks within one day each add their own forecast
    rows; ``replace`` for reprocessing a day from scratch."""
    if mode not in ("replace", "append"):
        raise ValueError(f"unknown write mode {mode!r}")

    def add_date(b: pa.Table) -> pa.Table:
        origin = b["forecast_window_start_ms"].to_numpy() - (
            b["horizon_index"].to_numpy() - 1
        ) * (b["forecast_window_end_ms"].to_numpy() - b["forecast_window_start_ms"].to_numpy())
        day = (origin // 86_400_000).astype(np.int64)
        return b.append_column("result_date", pa.array(day))

    ds = forecast_ds.map_batches(add_date, batch_format="pyarrow", zero_copy_batch=True)
    if mode == "append":
        ds.write_parquet(out_dir, partition_cols=["result_date"])
    else:
        _write_replacing_partitions(ds, out_dir)
    return out_dir


def gc_results(out_dir: str, retention_days: int, now_day: int) -> list[int]:
    """Retention GC over a date-partitioned result sink: remove every
    ``result_date=`` partition older than ``now_day - retention_days``
    — the reference's old-history-index cleanup
    (``IndexManagement.java`` deleteOldHistoryIndices; default AD result
    retention 30 days). ``now_day`` is passed in (epoch days), never
    read from the wall clock — determinism rule. Whole-directory
    removals, so a crashed GC leaves only fully-intact partitions.
    Returns the removed partition days (sorted)."""
    import shutil

    cutoff = int(now_day) - int(retention_days)
    removed: list[int] = []
    if not os.path.isdir(out_dir):
        return removed
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("result_date="):
            continue
        try:
            day = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if day < cutoff:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            removed.append(day)
    return removed


class ResultIndexManager:
    """Generation-rolled CUSTOM result sink — the Parquet analogue of the
    reference's result-index rollover + delete loop
    (``timeseries/indices/IndexManagement.java:1306-1395``: a rollover
    request carrying ``MaxIndexAgeCondition`` (custom result index
    min_age, days), ``MaxIndexSizeCondition`` (min_size, MB) and — for
    the default index — ``MaxIndexDocsCondition``; the alias rolls when
    ANY condition is met, and rolled-off generations older than the
    custom TTL are deleted).

    Layout: ``root/gen-000001/result_date=D/…`` — the ACTIVE generation
    is the highest-numbered directory; callers write through
    ``write_results(res, mgr.active(), …)`` and call
    ``maybe_rollover(now_day)`` on their job tick (the reference
    schedules the same check every ``historyRolloverPeriod``). Whole-
    generation deletion keeps retention crash-safe the same way
    ``gc_results`` does for day partitions. ``now_day`` always flows in
    from the caller — determinism rule, no wall clock."""

    def __init__(self, root: str, min_age_days: int | None = 7,
                 min_size_bytes: int | None = None, min_docs: int | None = None):
        self.root = root
        self.min_age_days = min_age_days
        self.min_size_bytes = min_size_bytes
        self.min_docs = min_docs
        os.makedirs(root, exist_ok=True)

    # ---- generations ----

    def generations(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.root)
            if n.startswith("gen-") and os.path.isdir(os.path.join(self.root, n))
        )

    def active(self, now_day: int = 0) -> str:
        gens = self.generations()
        if not gens:
            return self._create_generation(1, now_day)
        return os.path.join(self.root, gens[-1])

    def _create_generation(self, n: int, now_day: int) -> str:
        import json

        path = os.path.join(self.root, f"gen-{n:06d}")
        os.makedirs(path, exist_ok=True)
        meta = {"created_day": int(now_day), "generation": n}
        tmp = os.path.join(path, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, ".meta.json"))
        return path

    def _meta(self, gen_dir: str) -> dict:
        import json

        try:
            with open(os.path.join(gen_dir, ".meta.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"created_day": 0, "generation": 0}

    def stats(self, gen_dir: str | None = None) -> dict:
        """size/doc-count of a generation from parquet footers only."""
        import glob as _glob

        import pyarrow.parquet as _pq

        gen_dir = gen_dir or self.active()
        files = _glob.glob(os.path.join(gen_dir, "**", "*.parquet"), recursive=True)
        return {
            "bytes": sum(os.path.getsize(f) for f in files),
            "docs": sum(_pq.read_metadata(f).num_rows for f in files),
            "files": len(files),
        }

    # ---- the rollover check (ANY condition met → roll) ----

    def maybe_rollover(self, now_day: int) -> bool:
        gens = self.generations()
        if not gens:
            self._create_generation(1, now_day)
            return False
        gen_dir = os.path.join(self.root, gens[-1])
        meta = self._meta(gen_dir)
        st = self.stats(gen_dir)
        if st["files"] == 0:
            return False  # nothing written yet — an empty index never rolls
        roll = False
        if self.min_age_days is not None:
            roll |= (int(now_day) - meta["created_day"]) >= self.min_age_days
        if self.min_size_bytes is not None:
            roll |= st["bytes"] >= self.min_size_bytes
        if self.min_docs is not None:
            roll |= st["docs"] >= self.min_docs
        if roll:
            self._create_generation(meta["generation"] + 1, now_day)
        return roll

    # ---- TTL deletion of rolled-off generations ----

    def gc(self, now_day: int, ttl_days: int) -> list[str]:
        """Delete non-active generations created more than ``ttl_days``
        ago (customResultIndexTTL). Returns removed generation names."""
        import shutil

        gens = self.generations()
        removed = []
        for name in gens[:-1]:  # the active generation never deletes
            gen_dir = os.path.join(self.root, name)
            if self._meta(gen_dir)["created_day"] < int(now_day) - int(ttl_days):
                shutil.rmtree(gen_dir, ignore_errors=True)
                removed.append(name)
        return removed
