"""User-facing detector API — the reference's REST surface (§2.G,
``ad/rest/*`` — 18 actions) as a thin Python facade, so a user of the
plugin can run the same operations here:

    api = DetectorAPI(config, events_path)
    api.validate()        # _validate: interval / shingle-density / window-delay checks
    api.suggest_interval()# _suggest
    api.preview()         # _preview: deterministic sampled run (randomSeed(0) analogue)
    api.run_once(out_dir) # _run: full detection, results written
    api.profile()         # _profile/_stats: entity counts, model states
    api.start_job(...)    # realtime tick: checkpointed continuation
    api.top_anomalies(k)  # _topAnomalies

Create/update/delete of detector configs are plain dataclass / JSON
operations (configs are not Datasets) and need no engine support.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..config import DetectorConfig
from ..stages.window import add_window_columns

WINDOW_DELAY_RATIO = 1.2  # TimeSeriesSettings.java:301


def _per_entity_map_groups(ds, cats: list[str], fn, coarse_groups: int | None) -> pd.DataFrame:
    """Run a per-entity pandas UDF over a COARSE-keyed shuffle: group on
    ``hash(entity) % (8×CPUs)`` and iterate the entities inside each
    group (same exchange shape as ``detect()``/``forecast()``'s
    ScoreGroups) — never one Ray group per distinct entity, which is the
    repo's measured per-group-overhead cliff. ``coarse_groups=0`` pins
    the legacy per-entity plan for parity tests. Returns the collected
    pandas result (validation outputs are entity-bounded, tiny rows)."""
    from .detector import add_coarse_key, resolve_coarse_groups

    n_coarse = resolve_coarse_groups(coarse_groups)
    if n_coarse <= 0:
        return ds.groupby(cats).map_groups(fn, batch_format="pandas").to_pandas()

    def per_coarse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_coarse"])
        parts = [fn(sub) for _, sub in g.groupby(cats, sort=True)]
        if not parts:  # replayed empty group — keep the output schema
            return fn(g.iloc[0:0])
        return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)

    keyed = add_coarse_key(ds, n_coarse, cols=tuple(cats))
    return keyed.groupby("_coarse").map_groups(per_coarse, batch_format="pandas").to_pandas()


class DetectorAPI:
    def __init__(self, config: DetectorConfig, events_path: str, ts_col: str = "ts"):
        self.config = config
        self.events_path = events_path
        self.ts_col = ts_col

    def _ds(self, pruned: bool = False, columns: list[str] | None = None):
        """Events Dataset. ``columns`` prunes the SCAN to exactly those
        plus whatever the filter_query references (Ray does not push
        ``select_columns`` into the parquet read — the explicit column
        list is what keeps a validate/suggest pass from decoding every
        feature column of a 100-TB table); ``pruned`` uses the
        detect()/forecast() column set."""
        import ray.data as rd

        if columns is not None:
            from ..functions.rowfilter import predicate_fields

            cols = sorted(set(columns) | predicate_fields(self.config.filter_query))
            ds = rd.read_parquet(self.events_path, columns=cols)
        elif pruned:
            from .detector import needed_columns

            ds = rd.read_parquet(self.events_path,
                                 columns=needed_columns(self.config, self.ts_col))
        else:
            ds = rd.read_parquet(self.events_path)
        if self.config.filter_query:
            # Config.filterQuery wraps EVERY feature query in the
            # reference — suggest/validate/preview/profile must see the
            # same filtered stream as detect/forecast (which re-apply it
            # themselves; the second pass is an idempotent no-op)
            from ..functions.rowfilter import apply_filter_query

            ds = apply_filter_query(ds, self.config.filter_query)
        return ds

    # ---- _suggest (A14) ----

    RECENT_TS_CAP = 65_536

    def _recent_distinct_ts_ms(self) -> np.ndarray:
        """Most recent ``RECENT_TS_CAP`` DISTINCT event timestamps (epoch
        ms, ascending) — the shared probe behind ``suggest_interval`` and
        ``validate()``'s recency anchor (one scan serves both; r5 fused
        the separate max-ts pass). Each batch dedupes locally before the
        groupby, so the shuffle moves per-block distinct timestamps, not
        every event row; only the bounded recent sample reaches the
        driver (``IntervalCalculation.java:31-56`` samples latest data
        the same way)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from ray.data.aggregate import Count

        def to_ms_unique(b: pa.Table) -> pa.Table:
            t = add_window_columns(b, self.ts_col, 1)
            u = pc.unique(t["window_start_ms"].combine_chunks())
            return pa.table({"window_start_ms": u})

        ds = self._ds(columns=[self.ts_col]).select_columns([self.ts_col]).map_batches(
            to_ms_unique, batch_format="pyarrow", zero_copy_batch=True
        )
        frame = (
            ds.groupby("window_start_ms")
            .aggregate(Count(alias_name="__n"))
            .sort("window_start_ms", descending=True)
            .limit(self.RECENT_TS_CAP)
            .to_pandas()
        )
        if "window_start_ms" not in frame.columns:
            return np.empty(0, dtype=np.int64)
        return np.sort(frame["window_start_ms"].to_numpy(dtype=np.int64))

    @staticmethod
    def _interval_from_recent(recent: np.ndarray, default: int) -> int:
        """Median gap of the recent distinct timestamps, in seconds."""
        if recent.size < 2:
            # empty table (or a single timestamp): nothing to suggest
            return default
        return max(1, int(round(float(np.median(np.diff(recent))) / 1000.0)))

    def suggest_interval(self) -> int:
        """Median gap between distinct timestamps, in seconds — over the
        most RECENT ``RECENT_TS_CAP`` distinct timestamps (the reference's
        interval calculation also samples latest data,
        ``IntervalCalculation.java:31-56``). Distinct + sort + limit run
        distributed; only the bounded recent sample reaches the driver."""
        return self._interval_from_recent(self._recent_distinct_ts_ms(),
                                          self.config.interval_s)

    def suggest_period(self, max_period: int = 96, coarse_groups: int | None = None) -> int:
        """Seasonal-period suggestion for the forecast side (the
        reference's forecaster validation suggests horizon/interval;
        ``forecast/rest/handler``): per-entity autocorrelation of the
        windowed feature series (FFT-based, inside ``map_groups``), then
        a length-weighted vote across entities. Returns 0 when no lag's
        autocorrelation clears 0.3 — 'no clear seasonality'.

        The per-entity pass shuffles on ``hash(entity) % (8×CPUs)`` and
        iterates entities INSIDE each group (the detect()/forecast()
        exchange shape): one Ray/pandas group per DISTINCT entity is the
        measured per-group-overhead cliff at the reference's 1M-entity
        HC regime (``SearchFeatureDao.java:316-322``). With mergeable
        feature aggs the whole pass is detect()'s FUSED single-shuffle
        plan — map-side window partials, ONE coarse exchange, partial
        merge + autocorrelation inside the group — instead of a full
        windowed aggregate followed by a second entity shuffle.
        ``coarse_groups=0`` pins the legacy two-shuffle per-entity plan
        (parity tests)."""
        from ..stages.window import mergeable, window_aggregate

        feats = self.config.feature_names()
        if not feats:
            return 0
        f0 = feats[0]
        cats = list(self.config.category_fields)

        def entity_period(g: pd.DataFrame) -> pd.DataFrame:
            x = g.sort_values("window_start_ms")[f0].to_numpy(dtype=np.float64)
            x = x[np.isfinite(x)]
            n = x.size
            if n < 8:
                return pd.DataFrame({"period": [0], "weight": [0]})
            x = x - x.mean()
            spec = np.abs(np.fft.rfft(x, n=2 * n)) ** 2
            acf = np.fft.irfft(spec)[:n]
            if acf[0] <= 0:
                return pd.DataFrame({"period": [0], "weight": [n]})
            acf = acf / acf[0]
            hi = min(max_period, n // 2)
            if hi < 2:
                return pd.DataFrame({"period": [0], "weight": [n]})
            lag = int(np.argmax(acf[2 : hi + 1])) + 2
            period = lag if acf[lag] >= 0.3 else 0
            return pd.DataFrame({"period": [period], "weight": [n]})

        from .detector import resolve_coarse_groups

        if cats and mergeable(self.config) and resolve_coarse_groups(coarse_groups) > 0:
            # fused single-shuffle plan: only window-level partial rows
            # move through the exchange (events-per-window× less volume)
            from ..stages.window import finalize_partials_multi, partial_window_aggregate
            from .detector import add_coarse_key

            n_coarse = resolve_coarse_groups(coarse_groups)
            part = partial_window_aggregate(self._ds(pruned=True), self.config,
                                            ts_col=self.ts_col)
            keyed = add_coarse_key(part, n_coarse, cols=tuple(cats))
            cfg = self.config

            def per_coarse(g: pd.DataFrame) -> pd.DataFrame:
                g = g.drop(columns=["_coarse"])
                fin = finalize_partials_multi(g, cfg, cats)
                parts = [entity_period(sub) for _, sub in fin.groupby(cats, sort=True)]
                if not parts:  # replayed empty group — keep the schema
                    return entity_period(fin.iloc[0:0])
                return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)

            votes = keyed.groupby("_coarse").map_groups(
                per_coarse, batch_format="pandas").to_pandas()
        elif cats:
            agg = window_aggregate(self._ds(pruned=True), self.config, ts_col=self.ts_col)
            votes = _per_entity_map_groups(agg, cats, entity_period, coarse_groups)
        else:
            agg = window_aggregate(self._ds(pruned=True), self.config, ts_col=self.ts_col)
            votes = entity_period(agg.to_pandas())
        if "weight" not in votes.columns:  # empty input → no votes at all
            return 0
        votes = votes[votes["weight"] > 0]
        if not len(votes):
            return 0
        tally = votes.groupby("period")["weight"].sum()
        return int(tally.idxmax())

    # ---- _validate ----

    def validate(self, coarse_groups: int | None = None) -> dict:
        """Shingle-density (B4) + interval sanity + window-delay
        suggestion (WINDOW_DELAY_RATIO × observed ingest delay is the
        reference's rule; with batch files we report the suggested
        interval instead). ``coarse_groups``: see ``suggest_period``."""
        from ..stages.priority import decayed_top_entities  # noqa: F401 (import check)

        issues: list[str] = []
        # ONE distinct-ts probe serves both the interval suggestion and
        # the recency anchor for the feature sample below (r4 ran a
        # separate max-ts scan; the max IS the last recent timestamp)
        recent = self._recent_distinct_ts_ms()
        suggested = self._interval_from_recent(recent, self.config.interval_s)
        if suggested > self.config.interval_s * 2:
            issues.append(
                f"interval {self.config.interval_s}s much finer than median data gap {suggested}s"
            )
        # feature validation against live data (the reference's _validate
        # runs each feature agg and checks it returns usable values —
        # ad/rest/handler/AbstractAnomalyDetectorActionHandler feature
        # checks + IntervalCalculation.java:31-56): source columns must
        # exist, and a recent-window sample of each aggregated feature
        # must be mostly non-NaN. Schema comes from parquet METADATA (the
        # filter_query only drops rows, never columns — probing the
        # filtered stream would execute its first block just to list
        # names).
        import ray.data as rd

        schema_names = set(rd.read_parquet(self.events_path).schema().names)
        missing_cols = [f.column for f in self.config.features if f.column not in schema_names]
        if missing_cols:
            issues.append(f"feature source columns missing from input: {sorted(set(missing_cols))}")
        feature_nan_rate: dict[str, float] = {}
        if not missing_cols and self.config.features:
            from ..stages.window import normalize_features, window_aggregate

            interval_ms_v = self.config.interval_s * 1000
            if recent.size == 0:
                issues.append("no data in the input — cannot validate features")
            else:
                # window_end of the latest event, derived from the probe
                hi = (int(recent[-1]) // interval_ms_v + 1) * interval_ms_v
                lo = int(hi) - 64 * interval_ms_v  # recent sample only — never the full table
                sample = window_aggregate(self._ds(pruned=True), self.config, ts_col=self.ts_col,
                                          time_range_ms=(lo, int(hi)))
                feats = self.config.feature_names()
                sample = sample.map_batches(
                    lambda b: normalize_features(b, feats), batch_format="pyarrow", zero_copy_batch=True
                ).to_pandas()
                for f in feats:
                    rate = float(np.isnan(sample[f]).mean()) if len(sample) else 1.0
                    feature_nan_rate[f] = round(rate, 4)
                    if rate > 0.9:
                        issues.append(f"feature {f!r} is >90% missing over the last 64 intervals")
        density = self.shingle_density(coarse_groups=coarse_groups)
        weak = [e for e, d in density.items() if d < 0.25]
        if weak:
            issues.append(f"sparse shingles (<25% full windows) for {len(weak)} entities")
        return {
            "ok": not issues,
            "issues": issues,
            "suggested_interval_s": suggested,
            "window_delay_s": int(self.config.interval_s * (WINDOW_DELAY_RATIO - 1.0)),
            "shingle_density": density,
            "feature_nan_rate": feature_nan_rate,
        }

    def shingle_density(self, coarse_groups: int | None = None) -> dict[str, float]:
        """Fraction of fully-populated shingle windows per entity (B4) —
        computed per entity inside map_groups (one tiny row per entity
        reaches the driver; round-1 pulled every distinct (entity,
        window) pair driver-side). With category fields the pass rides
        the coarse-keyed exchange (``_per_entity_map_groups``)."""
        interval_ms = self.config.interval_s * 1000
        s = self.config.shingle_size
        cats = list(self.config.category_fields)
        ds = self._ds(columns=cats + [self.ts_col]).map_batches(
            lambda b: add_window_columns(b, self.ts_col, interval_ms),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        cols = cats + ["window_start_ms"]

        def entity_density(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({"entity": pd.Series(dtype=object),
                                     "density": pd.Series(dtype=np.float64)})
            a = np.unique(g["window_start_ms"].to_numpy())
            lo = np.searchsorted(a, a - (s - 1) * interval_ms, side="left")
            full = int(((np.arange(a.size) - lo + 1) == s).sum())
            key = str(tuple(str(g[c].iloc[0]) for c in cats))
            return pd.DataFrame({"entity": [key], "density": [full / max(1, a.size)]})

        if cats:
            dens = _per_entity_map_groups(
                ds.select_columns(cols), cats, entity_density, coarse_groups
            )
            # empty input → map_groups yields a columnless empty frame
            return (dict(zip(dens["entity"], dens["density"]))
                    if "entity" in dens.columns else {})
        # no categories: distinct windows computed DISTRIBUTED; the driver
        # receives one row per distinct window (bounded by
        # time-range/interval), not one per event
        from ray.data.aggregate import Count as _Count

        a = np.sort(
            ds.select_columns(["window_start_ms"])
            .groupby("window_start_ms")
            .aggregate(_Count(alias_name="__n"))
            .select_columns(["window_start_ms"])
            .to_pandas()["window_start_ms"]
            .to_numpy()
        )
        lo = np.searchsorted(a, a - (s - 1) * interval_ms, side="left")
        return {"()": float(((np.arange(a.size) - lo + 1) == s).sum() / max(1, a.size))}

    # ---- _preview (deterministic, D7 stride sampling + B6 interpolation) ----

    def preview(self, max_entities: int = 5) -> pd.DataFrame:
        """Deterministic preview: top entities by count, stride-sampled
        features linearly re-interpolated, scored by a fresh fixed-seed
        model — the ``AnomalyDetectorRunner`` path (§3.3)."""
        from ..functions.imputation import linear_uniform_impute
        from ..state.model import TRCFModel
        from ..stages.window import window_aggregate

        feats = self.config.feature_names()
        cats = list(self.config.category_fields)
        agg_ds = window_aggregate(self._ds(pruned=True), self.config, ts_col=self.ts_col)
        if cats:
            # top-k entities FIRST, distributed (q_top_entities shape), then
            # filter before collecting — preview never materializes the full
            # (entity, window) aggregate on the driver (at the reference's
            # 1M-entity scale that would be ~10⁹ rows for a 5-entity preview)
            from ray.data.aggregate import Count

            top_pd = (
                agg_ds.groupby(cats)
                .aggregate(Count(alias_name="__n"))
                .sort(["__n", *cats], descending=[True] + [False] * len(cats))
                .limit(max_entities)
                .to_pandas()
            )
            top = set(top_pd[cats].itertuples(index=False, name=None))

            def _keep_top(df: pd.DataFrame) -> pd.DataFrame:
                if not len(df):
                    return df
                mask = np.fromiter(
                    (t in top for t in zip(*(df[c] for c in cats))), bool, len(df)
                )
                return df[mask]

            agg = agg_ds.map_batches(_keep_top, batch_format="pandas").to_pandas()
        else:
            agg = agg_ds.to_pandas()
        out = []
        for ent, g in agg.groupby(cats) if cats else [((), agg)]:
            g = g.sort_values("window_start_ms")
            sampled = g.iloc[:: max(1, len(g) // 300 * 4 and 4)]  # stride ≈ preview sampling
            vals = linear_uniform_impute(sampled[feats].to_numpy(), len(g))
            model = TRCFModel(self.config, f"preview_{ent}")
            # batch scorer (bit-identical to per-point process() — the
            # forest's chunked scoring is batching-independent, pytest-
            # proven); windows are sorted so nothing is dropped
            ends = g["window_end_ms"].to_numpy(dtype=np.int64)
            r = model.process_many(vals, ends)
            keep = r["keep"]
            df = pd.DataFrame({
                "window_end_ms": ends[keep],
                "anomaly_score": r["anomaly_score"][keep],
                "anomaly_grade": r["anomaly_grade"][keep],
            })
            for c, v in zip(cats, ent if isinstance(ent, tuple) else (ent,)):
                df[c] = v
            out.append(df)
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame()

    # ---- _run / job tick ----

    def run_once(self, results_dir: str | None = None, checkpoint_dir: str | None = None,
                 write_mode: str = "replace", time_range_ms=None, task_store=None,
                 piece_intervals: int = 1000):
        """One batch run. With ``task_store`` (a
        :class:`..state.taskstore.TaskStore`), the run is tracked as an
        ADTask-style doc: CREATED → RUNNING → FINISHED(n_result_rows) /
        FAILED(error); a rerun of a FINISHED (config, range) task is a
        no-op returning the finished doc (the reference refuses to
        restart finished historical tasks).

        A TRACKED run over an explicit ``time_range_ms`` processes the
        range in pieces of ``piece_intervals`` detector intervals,
        updating ``task_progress`` / ``init_progress`` and the
        current-piece resume marker after each piece — the reference's
        per-piece ADTask updates (``ADBatchTaskRunner.java:1271-1301``,
        pieceSize = 1000 points). Models continue across pieces through
        checkpoints (piece-split ≡ single-run is the checkpointed-split
        invariant the state tests prove), so a user polling a long
        historical run sees windows-scored progress, not a blind wait.
        ``n_result_rows`` counts THIS run's written rows only."""
        from .detector import detect
        from ..stages.sink import write_results

        task = None
        if task_store is not None:
            task = task_store.create(self.config.config_id, "historical",
                                     time_range_ms=time_range_ms)
            if task["state"] == "FINISHED":
                return task
            task_store.transition(task["_id"], "RUNNING")
        try:
            if task is not None and time_range_ms is not None:
                return self._run_pieces(task, task_store, results_dir, checkpoint_dir,
                                        write_mode, tuple(time_range_ms), piece_intervals)
            res = detect(self._ds(pruned=True), self.config, ts_col=self.ts_col,
                         checkpoint_dir=checkpoint_dir, time_range_ms=time_range_ms)
            if results_dir:
                n = write_results(res, results_dir, mode=write_mode)
                if task is not None:
                    task_store.transition(task["_id"], "FINISHED", n_result_rows=n)
                return results_dir
            if task is not None:
                res = res.materialize()
                task_store.transition(task["_id"], "FINISHED", n_result_rows=res.count())
            return res
        except Exception as e:
            if task is not None:
                task_store.transition(task["_id"], "FAILED", error=repr(e))
            raise

    def _run_pieces(self, task, task_store, results_dir, checkpoint_dir,
                    write_mode, time_range_ms, piece_intervals: int):
        """Piece loop of a tracked historical run (see run_once)."""
        from .detector import detect
        from ..stages.sink import write_results

        import shutil

        interval_ms = self.config.interval_s * 1000
        lo, hi = time_range_ms
        piece_ms = max(1, int(piece_intervals)) * interval_ms
        # model continuity across pieces rides the checkpoint store; a
        # task-private directory when the caller didn't bring one
        ckpt = checkpoint_dir or os.path.join(task_store.root, f"{task['_id']}_ckpt")
        if checkpoint_dir is None:
            # restart-from-scratch (the reference resets non-finished
            # historical tasks): a crashed attempt's task-private
            # checkpoints would make the rerun drop already-seen windows
            # as out-of-order and emit a partial result set
            shutil.rmtree(ckpt, ignore_errors=True)
        if results_dir and write_mode == "replace":
            # clear this range's day partitions — later pieces APPEND, so
            # a crashed attempt's partial rows in those days would
            # otherwise duplicate on the rerun
            for day in range(lo // 86_400_000, hi // 86_400_000 + 1):
                shutil.rmtree(os.path.join(results_dir, f"result_date={day}"),
                              ignore_errors=True)
        out_after = self.config.model_output_after()
        total_rows = 0
        outs = []
        plo, first = lo, True
        while plo < hi:
            phi = min(hi, plo + piece_ms)
            task_store.update_progress(task["_id"], current_piece=(plo, phi))
            res = detect(self._ds(pruned=True), self.config, ts_col=self.ts_col,
                         checkpoint_dir=ckpt, time_range_ms=(plo, phi),
                         cold_start_history=first)
            if results_dir:
                total_rows += write_results(
                    res, results_dir, mode=(write_mode if first else "append"))
            else:
                res = res.materialize()
                total_rows += res.count()
                outs.append(res)
            task_store.update_progress(
                task["_id"],
                task_progress=(phi - lo) / max(1, hi - lo),
                init_progress=((phi - lo) / interval_ms) / max(1, out_after),
            )
            plo, first = phi, False
        task_store.transition(task["_id"], "FINISHED", n_result_rows=total_rows)
        if results_dir:
            return results_dir
        return outs[0] if len(outs) == 1 else outs[0].union(*outs[1:])

    def start_job(self, results_dir: str, checkpoint_dir: str):
        """One realtime tick: continue checkpointed models over whatever
        new windows the input now holds (idempotent — overlapping windows
        are dropped as out-of-order). Results APPEND: a tick emits only
        its new windows, so earlier same-day partitions must survive."""
        return self.run_once(results_dir=results_dir, checkpoint_dir=checkpoint_dir,
                             write_mode="append")

    # ---- forecast side (forecast/rest/*: _run once, job start/stop) ----

    def forecast_run_once(self, horizon: int = 24, period: int = 0,
                          results_dir: str | None = None,
                          checkpoint_dir: str | None = None,
                          write_mode: str = "replace"):
        """One forecast pass (``forecast/rest`` _run): per-entity
        Holt-Winters streams over all windows, emitting per-horizon rows
        (ForecastResult semantics). With ``results_dir`` the rows land in
        the date-partitioned forecast sink."""
        from ..stages.sink import write_forecast_results
        from .forecast import forecast

        res = forecast(self._ds(pruned=True), self.config, horizon=horizon, period=period,
                       ts_col=self.ts_col, checkpoint_dir=checkpoint_dir)
        if results_dir:
            return write_forecast_results(res, results_dir, mode=write_mode)
        return res

    def forecast_start_job(self, results_dir: str, checkpoint_dir: str,
                           horizon: int = 24, period: int = 0):
        """One realtime forecast tick: continue checkpointed forecaster
        streams over whatever new windows the input now holds
        (idempotent — overlapping windows drop as out-of-order). Results
        APPEND so same-day ticks accumulate."""
        return self.forecast_run_once(horizon=horizon, period=period,
                                      results_dir=results_dir,
                                      checkpoint_dir=checkpoint_dir,
                                      write_mode="append")

    MAX_SHINGLE_SIZE = 128              # TimeSeriesSettings.java:22
    HORIZON_SHINGLE_RATIO = 3           # Forecaster.java:108

    def forecast_validate(self, horizon: int | None = None, period: int = 0) -> dict:
        """Forecast-side _validate (``RestValidateForecasterAction.java:
        1-116`` routes into the same validation surface as the detector;
        ``forecast/rest/handler/*``): the detector checks (feature source
        columns exist, recent-window NaN rate, interval sanity vs the
        suggested interval) plus the forecaster-specific rules —
        ``invalidHorizon`` (``Forecaster.java:235-238``: 1 ≤ horizon ≤
        MAX_SHINGLE_SIZE × 3), the suggested horizon (``suggestHorizon``
        = shingle × 3, ``Forecaster.java:561-563``) and a seasonality
        suggestion from the windowed feature autocorrelation."""
        base = self.validate()            # shared detector-side surface
        issues = list(base["issues"])
        suggested_horizon = self.config.shingle_size * self.HORIZON_SHINGLE_RATIO
        if horizon is not None and not (
            1 <= horizon <= self.MAX_SHINGLE_SIZE * self.HORIZON_SHINGLE_RATIO
        ):
            issues.append(
                f"horizon {horizon} outside [1, "
                f"{self.MAX_SHINGLE_SIZE * self.HORIZON_SHINGLE_RATIO}]"
            )
        if len(self.config.features) != 1:
            issues.append("forecasting expects exactly one feature")
        suggested_period = 0
        if not issues or all("horizon" in i or "feature" in i for i in issues):
            # only probe data when the config shape itself is sane
            suggested_period = self.suggest_period()
            if period and suggested_period and period != suggested_period:
                issues.append(
                    f"configured period {period} differs from detected "
                    f"seasonality {suggested_period}"
                )
        return {
            **base,
            "ok": not issues,
            "issues": issues,
            "suggested_horizon": suggested_horizon,
            "suggested_period": suggested_period,
        }

    def top_forecasts(self, k: int = 5, build_in_query: str = "MAX_VALUE_WITHIN_THE_HORIZON",
                      horizon: int = 24, period: int = 0, threshold: float | None = None,
                      relation: str = "GREATER_THAN"):
        """_topForecasts (``SearchTopForecastResultTransportAction``):
        run the forecast and rank entities by the built-in sub-agg."""
        from .forecast import forecast, top_forecast_results

        fc = forecast(self._ds(pruned=True), self.config, horizon=horizon, period=period,
                      ts_col=self.ts_col)
        return top_forecast_results(
            fc, self.config, k=k, build_in_query=build_in_query,
            horizon=horizon, threshold=threshold, relation=relation,
        ).to_pandas()

    # ---- _profile / _stats / _topAnomalies ----

    def profile(self, checkpoint_dir: str | None = None, entity: dict | None = None) -> dict:
        """Detector profile (``ProfileRunner.java:271,301``): entity
        counts + (with a checkpoint dir) per-model state — init progress
        (n_points / output_after), model size in bytes, last seen window.
        ``entity`` narrows to one entity (``EntityProfileRunner``)."""
        import glob as _glob
        import json as _json

        from ray.data.aggregate import Count

        cats = list(self.config.category_fields)
        n_entities = self._ds().groupby(cats).aggregate(Count(alias_name="n")).count() if cats else 1
        out = {
            "config_id": self.config.config_id,
            "n_entities": int(n_entities),
            "interval_s": self.config.interval_s,
            "shingle_size": self.config.shingle_size,
            "features": self.config.feature_names(),
        }
        if checkpoint_dir:
            from ..functions.hashing import entity_model_id

            metas = []
            for mp in sorted(_glob.glob(os.path.join(checkpoint_dir, "*", "*.pkl.json"))):
                try:
                    with open(mp) as f:
                        metas.append(_json.load(f))
                except (OSError, ValueError):
                    continue
            output_after = self.config.model_output_after()
            models = [
                {
                    "model_id": m["model_id"],
                    "n_points": m.get("n_points"),
                    "init_progress": round(min(1.0, (m.get("n_points") or 0) / output_after), 3),
                    "model_size_bytes": m.get("bytes"),
                    "last_window_end_ms": m.get("last_window_end"),
                }
                for m in metas
            ]
            out["n_models"] = len(models)
            out["total_model_bytes"] = int(sum(m["model_size_bytes"] or 0 for m in models))
            out["init_progress"] = round(
                float(np.mean([m["init_progress"] for m in models])) if models else 0.0, 3
            )
            if entity is not None:
                mid = entity_model_id(self.config.config_id, {k: str(v) for k, v in entity.items()})
                out["entity"] = entity
                out["entity_model"] = next((m for m in models if m["model_id"] == mid), None)
                out["entity_state"] = (
                    "RUNNING" if out["entity_model"] and out["entity_model"]["init_progress"] >= 1.0
                    else "INIT" if out["entity_model"] else "NOT_STARTED"
                )
                # EntityProfileRunner.java:305-324 data/model recency:
                # is_active = the entity's model is materialized (our
                # checkpoint store is the cache analogue),
                # last_active_ms = the model's last processed window,
                # last_sample_ms = the latest raw sample for the entity
                # in the (filter_query-scoped) source
                em = out["entity_model"]
                out["is_active"] = em is not None
                out["last_active_ms"] = em["last_window_end_ms"] if em else None
                out["last_sample_ms"] = self._entity_last_sample_ms(entity)
            else:
                out["models"] = models[:100]
        return out

    def task_profile(self, task_store, time_range_ms=None,
                     checkpoint_dir: str | None = None) -> dict:
        """_profile of a historical run — ``ADTaskProfileRunner.java:36-66``
        assembling ``ADTaskProfile.java``: the task doc (state,
        task_progress/init_progress, current piece, result count) plus
        model-side totals gathered from the checkpoint store (the
        reference polls each data node's task cache): model count, byte
        total, and ``rcf_total_updates`` (max points any model consumed).
        ``checkpoint_dir`` defaults to the piece-runner's task-private
        directory under the task store root."""
        import glob as _glob
        import json as _json

        tid = task_store.task_id(self.config.config_id, time_range_ms)
        doc = task_store.get(tid)
        ckpt = checkpoint_dir or os.path.join(task_store.root, f"{tid}_ckpt")
        metas = []
        for mp in sorted(_glob.glob(os.path.join(ckpt, "*", "*.pkl.json"))):
            try:
                with open(mp) as f:
                    metas.append(_json.load(f))
            except (OSError, ValueError):
                continue
        return {
            "task": doc,
            "n_models": len(metas),
            "total_model_bytes": int(sum(m.get("bytes") or 0 for m in metas)),
            "rcf_total_updates": int(max((m.get("n_points") or 0 for m in metas), default=0)),
            "shingle_size": self.config.shingle_size,
        }

    def _entity_last_sample_ms(self, entity: dict) -> int | None:
        """Latest raw-sample timestamp (epoch ms) for one entity — the
        EntityProfileRunner's last-sample search (a max-ts agg over the
        entity's term filter), distributed: per-batch filter + max, tiny
        driver-side reduce."""
        import pyarrow as pa
        import pyarrow.compute as pc

        ts_col = self.ts_col
        items = [(k, str(v)) for k, v in entity.items()]

        def keep(b: pa.Table) -> pa.Table:
            m = None
            for k, v in items:
                mm = pc.equal(pc.cast(b[k], pa.string()), v)
                m = mm if m is None else pc.and_(m, mm)
            return b.filter(m).select([ts_col])

        mx = self._ds(pruned=True).map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        ).max(ts_col)
        if mx is None:
            return None
        if isinstance(mx, (int, np.integer)):
            return int(mx)
        return int(pa.scalar(mx, pa.timestamp("ms")).cast(pa.int64()).as_py())

    def top_anomalies(self, k: int = 10) -> pd.DataFrame:
        from .detector import detect, top_anomaly_results

        res = detect(self._ds(pruned=True), self.config, ts_col=self.ts_col)
        return top_anomaly_results(res, self.config, k=k).to_pandas()
