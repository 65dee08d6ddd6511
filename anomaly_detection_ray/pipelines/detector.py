"""End-to-end anomaly-detection pipelines — SURVEY.md §3 redesigns.

The reference's realtime-HC interval tick (§3.1), historical batch run
(§3.2) and deterministic preview (§3.3) all collapse into one Ray Data
pipeline shape:

    events → window_aggregate (groupby entity+window, §2.A)
           → normalize features (B1 NaN semantics)
           → model_id projection (B8: murmur3 entity hash, reference recipe)
           → groupby(hash(model_id) % n).map_groups(ScoreGroups)  # C1–C4, bounded groups
           → results (flat anomaly-result schema)

Transport hops, rate-limited queues, the hash ring, afterKey pagination
and piece scheduling all disappear — Ray's streaming executor provides
pipelining, placement and backpressure (SURVEY.md §4 table).

``detect(..., checkpoint_dir=...)`` gives realtime semantics (models
continue across runs); without it each run is a self-contained
historical/preview pass (cold start inside the run, deterministic for a
fixed config.seed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DetectorConfig
from ..functions.hashing import entity_model_id
from ..stages.scorer import ScoreGroups
from ..stages.window import (
    mergeable,
    normalize_features,
    partial_window_aggregate,
    window_aggregate,
)


def needed_columns(config: DetectorConfig, ts_col: str = "ts") -> list[str]:
    """The exact column set detect()/forecast() consume — pass as
    ``read_parquet(columns=…)`` so the scan never decodes dead columns
    (Ray does not push ``select_columns`` into the parquet read; measured
    3.4× scan-bytes reduction on the events table)."""
    from ..functions.rowfilter import predicate_fields

    return sorted(
        {ts_col, *config.category_fields, *(f.column for f in config.features)}
        | predicate_fields(config.filter_query)
    )


def _add_model_id(batch: pa.Table, config: DetectorConfig,
                  cache: dict | None = None) -> pa.Table:
    cats = list(config.category_fields)
    if not cats:
        mid = pa.array([config.config_id] * batch.num_rows)
        return batch.append_column("model_id", mid)
    # vectorize over unique entity combos: compute the murmur3 id once per
    # combo, then gather (batches repeat few entities many times); the
    # optional cache persists combos ACROSS batches (worker-local dict)
    cols = [batch[c].to_pylist() for c in cats]
    combos = list(zip(*cols)) if cols else []
    uniq = cache if cache is not None else {}
    for combo in combos:
        if combo not in uniq:
            uniq[combo] = entity_model_id(config.config_id, dict(zip(cats, map(str, combo))))
    mid = np.asarray([uniq[c] for c in combos], dtype=object)
    return batch.append_column("model_id", pa.array(mid))


def _project_model_ids(batch: pa.Table, config: DetectorConfig, n_coarse: int,
                       cache: dict) -> pa.Table:
    """Model-id (+ fused ``_coarse`` shuffle key) projection. Runs as a
    plain TASK-pool map — a stateful actor pool here would chain with the
    ScoreGroups pool and the two floors together can reserve enough CPUs
    to starve the read/shuffle tasks (measured: detect crawls). The
    per-unique-combo murmur3 cache is process-local (Ray reuses worker
    processes, so it still amortizes across the batches a worker sees)."""
    out = _add_model_id(batch, config, cache)
    if n_coarse > 0:
        from ..functions.hashing import hash_strings

        mids = out["model_id"].to_numpy(zero_copy_only=False)
        ck = (hash_strings(mids) % np.uint64(n_coarse)).astype(np.int64)
        out = out.append_column("_coarse", pa.array(ck))
    return out


def resolve_coarse_groups(coarse_groups: int | None) -> int:
    """Group count for the scoring exchange. ``None`` → 8× the cluster's
    CPUs (enough groups that the slowest is <13% of one core's share,
    bounded so the shuffle never creates one Ray group per model — the
    per-group-overhead cliff at the reference's 1M-entity HC scale,
    ``SearchFeatureDao.java:316-322``). ``0`` → legacy per-model groups
    (parity tests). On a real cluster CPU count scales with nodes, so
    group count (and per-group memory) scales with the cluster, not with
    entity count."""
    if coarse_groups is not None:
        return int(coarse_groups)
    import ray

    return max(32, int(ray.cluster_resources().get("CPU", 4)) * 8)


def add_coarse_key(ds, n_coarse: int, cols: tuple[str, ...] = ("model_id",)):
    """Append ``_coarse`` = hash(cols) % n_coarse — the bounded shuffle
    key for stateful per-model stages. Vectorized (pandas hash_array over
    the concatenated key strings)."""
    from ..functions.hashing import hash_strings

    def add(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_coarse", pa.array([], pa.int64()))
        import pyarrow.compute as pc

        key = pc.cast(batch[cols[0]], pa.string())
        for c in cols[1:]:
            key = pc.binary_join_element_wise(key, pc.cast(batch[c], pa.string()), "\x1f")
        ck = hash_strings(key.to_numpy(zero_copy_only=False)) % np.uint64(n_coarse)
        return batch.append_column("_coarse", pa.array(ck.astype(np.int64)))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def detect(
    events_ds,
    config: DetectorConfig,
    ts_col: str = "ts",
    checkpoint_dir: str | None = None,
    time_range_ms: tuple[int, int] | None = None,
    concurrency: int | None = None,
    detailed: bool = False,
    cold_start_history: bool = True,
    force_fused: bool | None = None,
    chunk_rows: int = 65536,
    coarse_groups: int | None = None,
):
    """events Dataset → anomaly results Dataset (one row per entity-window).

    ``detailed=True`` (implied by ``config.rules``) adds per-feature
    expected values, attribution and past values to each row.

    ``cold_start_history`` (with a ``time_range_ms``): models that have
    no checkpoint train on the ``max(32, history_intervals)`` (+shingle)
    windows immediately PRECEDING the range before scoring it — the
    reference's cold-start sample fetch (``ModelColdStart.java:217-339``,
    most-recent history intervals, ≤2 rounds back;
    ``SearchFeatureDao.java:1149-1169``). Training rows are processed but
    not emitted, so scores inside the range match a run that had seen the
    history live."""
    from ..util import pool

    if config.filter_query:
        from ..functions.rowfilter import apply_filter_query

        events_ds = apply_filter_query(events_ds, config.filter_query)
    concurrency = pool(concurrency)
    feats = config.feature_names()
    agg_range = time_range_ms
    if time_range_ms is not None and cold_start_history:
        n_hist = max(32, config.history_intervals) + config.shingle_size
        agg_range = (time_range_ms[0] - n_hist * config.interval_s * 1000, time_range_ms[1])
    # force_fused=False pins the two-shuffle plan (tests assert both plans
    # agree; non-mergeable aggs fall back automatically)
    fused = mergeable(config) if force_fused is None else (force_fused and mergeable(config))
    # Coarse-keyed scoring exchange: shuffle on hash(model_id) % n_coarse
    # (bounded group count — ScoreGroups iterates the models inside one
    # group), not one Ray group per model; per-model groups are the
    # per-group-overhead cliff at the reference's 1M-entity HC scale.
    # coarse_groups=0 pins the legacy per-model plan (parity tests).
    n_coarse = resolve_coarse_groups(coarse_groups)
    _mid_cache: dict = {}  # deserialized once per worker → amortizes there

    def project(b: pa.Table) -> pa.Table:
        return _project_model_ids(b, config, n_coarse, _mid_cache)

    if fused:
        # single-shuffle plan: map-side window partials (combiner) →
        # ONE groupby(model_id) that merges partials and scores. Only
        # window-level partial rows move through the exchange; the
        # two-shuffle fallback below sort-shuffles every raw event twice.
        agg = partial_window_aggregate(events_ds, config, ts_col=ts_col, time_range_ms=agg_range)
        agg = agg.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    else:
        agg = window_aggregate(events_ds, config, ts_col=ts_col, time_range_ms=agg_range)
        agg = agg.map_batches(
            lambda b: project(normalize_features(b, feats)), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    group_key = "_coarse" if n_coarse > 0 else "model_id"
    results = agg.groupby(group_key).map_groups(
        ScoreGroups,
        fn_constructor_kwargs=dict(config=config, checkpoint_dir=checkpoint_dir,
                                   detailed=detailed, fused=fused,
                                   chunk_rows=chunk_rows),
        batch_format="pandas",
        concurrency=concurrency,
    )
    if agg_range is not time_range_ms:
        lo = time_range_ms[0]
        import pyarrow.compute as pc

        results = results.map_batches(
            lambda b: b.filter(pc.greater_equal(b["window_start_ms"], lo)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    return results


def top_anomaly_results(results_ds, config: DetectorConfig, k: int = 10, by: str = "anomaly_grade"):
    """§2.A13: group results by entity, order by max grade/score, top-k
    (``SearchTopAnomalyResultTransportAction.java:74-160``)."""
    from ray.data.aggregate import Max

    keys = list(config.category_fields) or ["model_id"]
    return (
        results_ds.groupby(keys)
        .aggregate(Max(by, alias_name=f"max_{by}"))
        .sort(f"max_{by}", descending=True)
        .limit(k)
    )
