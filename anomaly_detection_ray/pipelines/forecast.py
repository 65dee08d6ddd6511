"""Forecasting pipeline — the ``forecast/`` side of the reference
(``ForecastJobProcessor`` / ``ForecastRealTimeInferencer`` /
``RCFCasterResult``), Ray-Data-first:

    events → window_aggregate (same §2.A surface as detection)
           → groupby(entity).map_groups(ForecastGroups)
           → one row per (entity, horizon step): value, lower, upper

Each entity's windows are processed in order through a
:class:`~..state.forecaster.HoltWintersForecaster`; the emitted rows are
the forecast made at the entity's LAST observed window (the realtime
"forecast from now" shape; ``horizon`` windows ahead), mirroring the
ForecastResult row schema (forecast_value / lower / upper bounds /
confidence + the forecast window's time range).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DetectorConfig
from ..stages.window import (
    mergeable,
    normalize_features,
    partial_window_aggregate,
    window_aggregate,
)
from ..util import pool


class ForecastGroups:
    """One group = one entity's windows in order. With ``checkpoint_dir``
    the forecaster state is restored before processing and saved after —
    a later run over newer windows CONTINUES the stream (the forecast
    job tick, ``forecast/ForecastJobProcessor`` semantics); overlapping
    windows are dropped as out-of-order, so reruns are idempotent."""

    def __init__(self, value_col: str, interval_ms: int, horizon: int, period: int,
                 output_after: int = 32, confidence: float = 0.9,
                 checkpoint_dir: str | None = None, config_id: str = "forecast",
                 fused_config: DetectorConfig | None = None,
                 backend: str = "holt_winters", seed: int = 0,
                 entity_cols: tuple[str, ...] = ()):
        from ..state.checkpoint import CheckpointStore

        if backend not in ("holt_winters", "rcf"):
            raise ValueError(f"unknown forecast backend {backend!r}")
        self.value_col = value_col
        self.interval_ms = interval_ms
        self.horizon = horizon
        self.period = period
        self.output_after = output_after
        self.confidence = confidence
        self.config_id = config_id
        self.store = CheckpointStore(checkpoint_dir) if checkpoint_dir else None
        self.fused_config = fused_config  # group rows are window partials
        self.backend = backend
        self.seed = seed
        self.entity_cols = tuple(entity_cols)  # split key for coarse groups

    def _new_forecaster(self, model_id: str):
        from ..functions.hashing import murmur3_x64_128
        from ..state.forecaster import HoltWintersForecaster, RCFForecaster

        if self.backend == "rcf":
            return RCFForecaster(
                horizon=self.horizon,
                seed=(self.seed ^ murmur3_x64_128(model_id.encode())[0]) & 0xFFFFFFFFFFFFFFFF,
                output_after=self.output_after, confidence=self.confidence,
            )
        return HoltWintersForecaster(
            horizon=self.horizon, period=self.period,
            output_after=self.output_after, confidence=self.confidence,
        )

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        # The group may hold MANY entities (coarse-keyed shuffle — see
        # ScoreGroups): ONE vectorized partial-merge + ONE stable sort
        # for the whole group, then split on the entity columns and
        # forecast each stream independently, in stable entity order.
        if "_coarse" in group.columns:
            group = group.drop(columns=["_coarse"])
        keys = [c for c in self.entity_cols if c in group.columns]
        if self.fused_config is not None:
            from ..stages.window import finalize_partials_multi

            group = finalize_partials_multi(group, self.fused_config, keys)
        group = group.sort_values([*keys, "window_end_ms"], kind="stable")
        if keys:
            parts = [
                self._forecast_entity(sub)
                for _, sub in group.groupby(keys, sort=True)
            ]
            if not parts:
                return pd.DataFrame()
            return parts[0] if len(parts) == 1 else pd.concat(parts)
        return self._forecast_entity(group)

    def _forecast_entity(self, group: pd.DataFrame) -> pd.DataFrame:
        # pre-merged and pre-sorted by __call__
        entity_cols = [c for c in group.columns if c not in
                       {self.value_col, "window_start_ms", "window_end_ms"}]
        model_id = "forecast_" + self.config_id + "_" + "|".join(
            str(group[c].iloc[0]) for c in entity_cols
        )
        f = None
        last_end = None
        if self.store is not None:
            state = self.store.load_state(model_id)
            if state is not None:
                f = state["forecaster"]
                last_end = state["last_window_end"]
        if f is None:
            f = self._new_forecaster(model_id)
        vals = group[self.value_col].to_numpy(dtype=np.float64)
        for v, we in zip(vals, group["window_end_ms"].to_numpy()):
            if last_end is not None and we <= last_end:
                continue  # out-of-order drop (§2.F)
            f.update(0.0 if not np.isfinite(v) else float(v))
            last_end = int(we)
            f.record_forecast()  # error bookkeeping only; bounds computed once below
        if self.store is not None:
            self.store.save_state(
                model_id, {"forecaster": f, "last_window_end": last_end},
                n_points=f.n_points, last_window_end=last_end,
            )
        fc = f.forecast()
        if fc is None or last_end is None:
            return pd.DataFrame()
        h = np.arange(1, self.horizon + 1, dtype=np.int64)
        out = pd.DataFrame(
            {
                "horizon_index": h,
                "forecast_window_start_ms": last_end + (h - 1) * self.interval_ms,
                "forecast_window_end_ms": last_end + h * self.interval_ms,
                "forecast_value": np.round(fc["values"], 6),
                "forecast_lower": np.round(fc["lower"], 6),
                "forecast_upper": np.round(fc["upper"], 6),
                "confidence": fc["confidence"],
            }
        )
        for c in entity_cols:
            out[c] = group[c].iloc[0]
        return out


BUILD_IN_QUERIES = (
    "MIN_CONFIDENCE_INTERVAL_WIDTH",
    "MAX_CONFIDENCE_INTERVAL_WIDTH",
    "MIN_VALUE_WITHIN_THE_HORIZON",
    "MAX_VALUE_WITHIN_THE_HORIZON",
    "DISTANCE_TO_THRESHOLD_VALUE",
)


def top_forecast_results(
    forecast_ds,
    config: DetectorConfig,
    k: int = 5,
    build_in_query: str = "MAX_VALUE_WITHIN_THE_HORIZON",
    horizon: int | None = None,
    threshold: float | None = None,
    relation: str = "GREATER_THAN",
):
    """Top-k entities over forecast rows — the forecast analogue of
    _topAnomalies (``forecast/transport/SearchTopForecastResult
    TransportAction.java:601-830``): a terms aggregation over the entity
    split ordered by one built-in sub-aggregation, tie-broken by entity
    key ascending (``_key: asc``).

    Built-ins mirror ``BuildInQuery``:
    - MIN/MAX_CONFIDENCE_INTERVAL_WIDTH: only the latest forecast rows
      (``horizon_index == horizon``, the reference's term filter on the
      configured horizon), agg min/max of ``upper − lower``, asc/desc.
    - MIN/MAX_VALUE_WITHIN_THE_HORIZON: no extra filter, min/max of
      ``forecast_value``, asc/desc.
    - DISTANCE_TO_THRESHOLD_VALUE: range-filter ``forecast_value``
      vs ``threshold`` per ``relation`` (GREATER_THAN[_OR_EQUAL_TO] →
      max desc; LESS_THAN[_OR_EQUAL_TO] → min asc).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    if build_in_query not in BUILD_IN_QUERIES:
        raise ValueError(f"unknown build_in_query {build_in_query!r}")
    cats = list(config.category_fields)
    if not cats:
        raise ValueError("top_forecast_results needs category fields (entity split)")

    def width_and_filter(b: pa.Table) -> pa.Table:
        b = b.append_column(
            "interval_width", pc.subtract(b["forecast_upper"], b["forecast_lower"])
        )
        if build_in_query.endswith("CONFIDENCE_INTERVAL_WIDTH") and horizon is not None:
            b = b.filter(pc.equal(b["horizon_index"], horizon))
        if build_in_query == "DISTANCE_TO_THRESHOLD_VALUE":
            if threshold is None:
                raise ValueError("DISTANCE_TO_THRESHOLD_VALUE needs a threshold")
            op = {
                "GREATER_THAN": pc.greater,
                "GREATER_THAN_OR_EQUAL_TO": pc.greater_equal,
                "LESS_THAN": pc.less,
                "LESS_THAN_OR_EQUAL_TO": pc.less_equal,
            }[relation]
            b = b.filter(op(b["forecast_value"], threshold))
        return b

    ds = forecast_ds.map_batches(width_and_filter, batch_format="pyarrow", zero_copy_batch=True)
    name = build_in_query
    if build_in_query == "MIN_CONFIDENCE_INTERVAL_WIDTH":
        agg, descending = Min("interval_width", alias_name=name), False
    elif build_in_query == "MAX_CONFIDENCE_INTERVAL_WIDTH":
        agg, descending = Max("interval_width", alias_name=name), True
    elif build_in_query == "MIN_VALUE_WITHIN_THE_HORIZON":
        agg, descending = Min("forecast_value", alias_name=name), False
    elif build_in_query == "MAX_VALUE_WITHIN_THE_HORIZON":
        agg, descending = Max("forecast_value", alias_name=name), True
    elif relation in ("GREATER_THAN", "GREATER_THAN_OR_EQUAL_TO"):
        agg, descending = Max("forecast_value", alias_name=name), True
    else:
        agg, descending = Min("forecast_value", alias_name=name), False
    return (
        ds.groupby(cats)
        .aggregate(agg)
        .sort([name, *cats], descending=[descending] + [False] * len(cats))
        .limit(k)
    )


def forecast(
    events_ds,
    config: DetectorConfig,
    horizon: int = 24,
    period: int = 0,
    ts_col: str = "ts",
    confidence: float = 0.9,
    concurrency=None,
    checkpoint_dir: str | None = None,
    backend: str = "holt_winters",
    coarse_groups: int | None = None,
):
    """events Dataset → forecast rows (one per entity × horizon step).

    With ``checkpoint_dir``, forecaster streams continue across runs
    (the forecast job tick); without it each run is a self-contained
    cold start (the run-once semantics).

    ``backend``: ``holt_winters`` (default — cheap per point) or ``rcf``
    (the reference's caster shape: forecasts are the forest's iterated
    conditional expectation; costs ``horizon`` tree walks per recorded
    forecast, throttled by the forecaster's record stride)."""
    feats = config.feature_names()
    if len(feats) != 1:
        raise ValueError("forecast() expects exactly one feature")
    if config.filter_query:
        from ..functions.rowfilter import apply_filter_query

        events_ds = apply_filter_query(events_ds, config.filter_query)
    fused = mergeable(config)
    if fused:
        # single-shuffle plan (see detect()): map-side window partials,
        # one groupby(entity) merging + forecasting
        agg = partial_window_aggregate(events_ds, config, ts_col=ts_col)
    else:
        agg = window_aggregate(events_ds, config, ts_col=ts_col)
        agg = agg.map_batches(
            lambda b: normalize_features(b, feats), batch_format="pyarrow", zero_copy_batch=True
        )
    keys = list(config.category_fields) or None
    if keys is None:
        raise ValueError("forecast() needs category fields (one model per entity)")
    # coarse-keyed exchange (see detect()): bounded group count, entities
    # iterated inside each group; coarse_groups=0 pins per-entity groups
    from .detector import add_coarse_key, resolve_coarse_groups

    n_coarse = resolve_coarse_groups(coarse_groups)
    if n_coarse > 0:
        agg = add_coarse_key(agg, n_coarse, cols=tuple(keys))
        group_key = ["_coarse"]
    else:
        group_key = keys
    return agg.groupby(group_key).map_groups(
        ForecastGroups,
        fn_constructor_kwargs=dict(
            value_col=feats[0], interval_ms=config.interval_s * 1000,
            horizon=horizon, period=period, output_after=config.model_output_after(),
            confidence=confidence, checkpoint_dir=checkpoint_dir,
            config_id=config.config_id, fused_config=config if fused else None,
            backend=backend, seed=config.seed, entity_cols=tuple(keys),
        ),
        batch_format="pandas",
        concurrency=pool(concurrency),
    )
