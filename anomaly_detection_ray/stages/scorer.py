"""Stateful scoring stage — SURVEY.md §2.C1/C2/C4.

``ScoreGroups`` is the callable-class for
``groupby(hash(model_id) % n_coarse).map_groups(...)``: one group = a
BOUNDED set of models' full time-ordered slices (detect() keys the
shuffle coarsely so the exchange never creates one Ray group per model
— the per-group-overhead cliff at the reference's 1M-entity HC scale).
The coarse hash partitioning replaces the reference's consistent-hash
ring + per-model locks (``HashRing.java:61-199``,
``RealTimeInferencer.java:225-238``) — a model's samples always land in
one group, processed by one actor, in window order (one group-wide sort
on (model_id, window_end) = the §2.F ordering requirement; ordering
across models is irrelevant, models are independent).

With a ``checkpoint_dir`` the stage restores each model before
processing and saves it after — a later pipeline run over new windows
continues the same streams (realtime micro-batch semantics, one run per
interval tick); without it every run is a cold start over its input
range (historical/preview semantics, ``ADBatchTaskRunner`` /
``AnomalyDetectorRunner``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DetectorConfig
from ..state.checkpoint import CheckpointStore

RESULT_COLUMNS = ["anomaly_score", "anomaly_grade", "confidence", "is_anomaly"]


def to_nested_results(results_ds, config: DetectorConfig, schema_version: int = 7):
    """B10: project flat result rows into the reference's fixed nested
    result schema (``src/main/resources/mappings/anomaly-results.json``:
    ``_meta.schema_version: 7``, ``feature_data: list<struct<feature_id,
    feature_name, data>>``, entity as list<struct<name, value>>,
    epoch-millis time fields). The flat layout stays the engine-native
    one; this is the compatibility projection (the reference's custom-
    index "flattening" run in reverse)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    feats = list(config.feature_names())
    cats = list(config.category_fields)
    config_id = config.config_id
    k = len(feats)

    def _interleave_float(b: pa.Table, cols: list[str]) -> pa.Array:
        """Row-major interleave of float columns → flat values array for a
        list<struct> of one entry per column per row (vectorized — the
        round-1 per-row dict comprehension was a Python loop in the hot
        path)."""
        mats = [pc.cast(b[c], pa.float64()).to_numpy(zero_copy_only=False) for c in cols]
        return pa.array(np.column_stack(mats).ravel())

    def _feature_list(b: pa.Table, cols: list[str], names: list[str]) -> pa.ListArray:
        n = b.num_rows
        fid = pa.array(feats * n, type=pa.string())
        data = _interleave_float(b, cols)
        struct = pa.StructArray.from_arrays([fid, data], names=names)
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * k, pa.int32())
        return pa.ListArray.from_arrays(offs, struct)

    def project(b: pa.Table) -> pa.Table:
        n = b.num_rows
        # explicit types: a zero-row batch would otherwise infer null-typed
        # arrays whose struct schema disagrees with non-empty blocks'
        fid = pa.array(feats * n, type=pa.string())
        fd_struct = pa.StructArray.from_arrays(
            [fid, fid, _interleave_float(b, feats)],
            names=["feature_id", "feature_name", "data"],
        )
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * k, pa.int32())
        fd = pa.ListArray.from_arrays(offs, fd_struct)
        if cats:
            svals = np.column_stack(
                [pc.cast(b[c], pa.string()).to_numpy(zero_copy_only=False) for c in cats]
            ).ravel()
            ent_struct = pa.StructArray.from_arrays(
                [pa.array(cats * n, type=pa.string()), pa.array(svals, type=pa.string())], names=["name", "value"]
            )
            ent = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * len(cats), pa.int32()), ent_struct
            )
        else:
            ent = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
                pa.array([], type=pa.struct([("name", pa.string()), ("value", pa.string())])),
            )
        out = {
            "detector_id": pa.array([config_id] * n, type=pa.string()),
            "schema_version": pa.array([schema_version] * n, pa.int32()),
            "model_id": b["model_id"],
            "entity": ent,
            "feature_data": fd,
            "data_start_time": b["window_start_ms"],
            "data_end_time": b["window_end_ms"],
            "anomaly_score": b["anomaly_score"],
            "anomaly_grade": b["anomaly_grade"],
            "confidence": b["confidence"],
        }
        # enrichment fields (anomaly-results.json:93-157) when the scorer
        # ran detailed: relevant_attribution, expected_values (one
        # candidate whose likelihood = confidence), past_values
        if f"{feats[0]}_attribution" in b.column_names:
            out["relevant_attribution"] = _feature_list(
                b, [f"{f}_attribution" for f in feats], ["feature_id", "data"]
            )
            out["past_values"] = _feature_list(
                b, [f"{f}_past" for f in feats], ["feature_id", "data"]
            )
            inner = _feature_list(b, [f"{f}_expected" for f in feats], ["feature_id", "data"])
            ev_struct = pa.StructArray.from_arrays(
                [pc.cast(b["confidence"], pa.float64()).combine_chunks(), inner],
                names=["likelihood", "value_list"],
            )
            out["expected_values"] = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32), pa.int32()), ev_struct
            )
        return pa.table(out)

    return results_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


class ScoreGroups:
    """groupby(model_id).map_groups callable. ``detailed=True`` adds the
    reference's result-row enrichment (``ThresholdingResult.java:323-374``,
    ``ModelUtil.java:96-133``): per-feature ``{f}_expected`` (forest
    leaf-consensus normal value), ``{f}_attribution`` (share of the
    anomaly score, normalized to sum 1 like relevant_attribution) and
    ``{f}_past`` (previous window's actual). When ``config.rules`` is
    non-empty the suppression rules (B9, ``IgnoreSimilarExtractor``)
    are applied against the expected values: grades within the rule
    margin of expected are zeroed and flagged ``suppressed_by_rule``."""

    def __init__(self, config: DetectorConfig, checkpoint_dir: str | None = None,
                 detailed: bool = False, max_cached_models: int = 1024,
                 fused: bool = False, chunk_rows: int = 65536):
        from ..state.cache import ModelCache

        self.config = config
        self.store = CheckpointStore(checkpoint_dir) if checkpoint_dir else None
        self.detailed = bool(detailed) or bool(config.rules)
        self.fused = fused  # group rows are map-side partials → merge here
        # in-run chunking: one group = one model's FULL history, so the
        # derived work arrays (feature matrix, score/attribution outputs,
        # result copies) are bounded by chunk_rows instead of the history
        # length — years of 1-min intervals stream through the same model
        # object in fixed-size pieces (split ≡ whole is the same streaming
        # invariant the checkpointed split-run tests prove)
        self.chunk_rows = max(1, int(chunk_rows))
        # PriorityCache analogue (C5): at most max_cached_models TRCF
        # models live in this actor; LRU victims evict to the checkpoint
        # store (or a private spill dir) and restore on re-touch.
        self.cache = ModelCache(config, self.store, max_models=max_cached_models)

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        # The group may hold MANY models (coarse-keyed shuffle: detect()
        # hash-partitions on hash(model_id) % n_coarse so the exchange
        # produces a BOUNDED number of groups instead of one Ray group
        # per model — at the reference's HC scale of 10^6 entities
        # (SearchFeatureDao.java:316-322) per-model groups hit the
        # per-group-overhead cliff). Models are scored independently, in
        # stable model_id order, each in window order.
        c = self.config
        if "_coarse" in group.columns:
            group = group.drop(columns=["_coarse"])
        if self.fused:
            # ONE vectorized finalize for the whole coarse group (all
            # models at once) — a per-model finalize was ~45% of the
            # per-model wall at HC scale
            from .window import finalize_partials_multi

            carry = [col for col in c.category_fields if col in group.columns]
            if "model_id" in group.columns:
                carry.append("model_id")
            group = finalize_partials_multi(group, c, carry)
        # one stable sort for the whole group; pandas groupby preserves
        # intra-group row order, so each model's slice arrives sorted
        group = group.sort_values(["model_id", "window_end_ms"], kind="stable")
        parts = [
            self._score_model(str(mid), sub)
            for mid, sub in group.groupby("model_id", sort=True)
        ]
        if not parts:
            # empty group (Ray's map_groups never produces one, but a
            # retried/replayed task could): emit the RESULT schema, not
            # the input schema — a block-schema mismatch here would
            # poison the downstream block stream
            return self._empty_result(group)
        # keep empty per-model frames: they carry the result columns, so
        # an all-empty group still emits the right schema
        return parts[0] if len(parts) == 1 else pd.concat(parts)

    def _empty_result(self, group: pd.DataFrame) -> pd.DataFrame:
        """Zero-row frame with the same columns ``_score_chunk`` emits."""
        res = group.iloc[0:0].copy()
        for col in ("anomaly_score", "anomaly_grade", "confidence"):
            res[col] = np.array([], dtype=np.float64)
        res["is_anomaly"] = np.array([], dtype=bool)
        if self.detailed:
            for f in self.config.feature_names():
                for suf in ("_expected", "_attribution", "_past"):
                    res[f + suf] = np.array([], dtype=np.float64)
            if self.config.rules:
                res["suppressed_by_rule"] = np.array([], dtype=bool)
        return res

    def _score_model(self, model_id: str, group: pd.DataFrame) -> pd.DataFrame:
        c = self.config
        group = group.reset_index(drop=True)  # pre-sorted by __call__

        model = self.cache.get(model_id)

        fnames = list(c.feature_names())
        parts = [
            self._score_chunk(model, group.iloc[lo:lo + self.chunk_rows], fnames)
            for lo in range(0, len(group), self.chunk_rows)
        ]

        self.cache.checkpoint(model_id)
        if not parts:
            return group
        return parts[0] if len(parts) == 1 else pd.concat(parts)

    def _score_chunk(self, model, sub: pd.DataFrame, fnames: list[str]) -> pd.DataFrame:
        feats = sub[fnames].to_numpy(dtype=np.float64)
        ends = sub["window_end_ms"].to_numpy(dtype=np.int64)
        out = model.process_many(feats, ends, detailed=self.detailed)

        keep = out["keep"]
        res = sub.loc[keep].copy()
        res["anomaly_score"] = out["anomaly_score"][keep]
        res["anomaly_grade"] = out["anomaly_grade"][keep]
        res["confidence"] = out["confidence"][keep]
        res["is_anomaly"] = out["is_anomaly"][keep]
        if self.detailed:
            score = out["anomaly_score"][keep]
            attr = out["attribution"][keep]
            with np.errstate(invalid="ignore", divide="ignore"):
                attr_norm = np.where(score[:, None] > 0, attr / np.where(score[:, None] > 0, score[:, None], 1.0), 0.0)
            for k, f in enumerate(fnames):
                res[f"{f}_expected"] = out["expected"][keep][:, k]
                res[f"{f}_attribution"] = attr_norm[:, k]
                res[f"{f}_past"] = out["past"][keep][:, k]
            if self.config.rules:
                from ..functions.rules import apply_rules

                res = apply_rules(res, list(self.config.rules), {f: f"{f}_expected" for f in fnames})
        return res
