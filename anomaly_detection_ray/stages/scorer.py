"""Stateful scoring stage — SURVEY.md §2.C1/C2/C4.

``ScoreGroups`` is the callable-class for
``groupby(model_id).map_groups(...)``: one group = one model's
(entity's) full time-ordered slice. Ray's hash partitioning on model_id
replaces the reference's consistent-hash ring + per-model locks
(``HashRing.java:61-199``, ``RealTimeInferencer.java:225-238``) — a
model's samples always land in one group, processed by one actor, in
window order (per-group sort = the §2.F ordering requirement; ordering
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
from ..state.model import TRCFModel

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

    feats = list(config.feature_names())
    cats = list(config.category_fields)
    config_id = config.config_id

    def project(b: pa.Table) -> pa.Table:
        n = b.num_rows
        fd = [
            [
                {"feature_id": f, "feature_name": f, "data": float(b[f][i].as_py())}
                for f in feats
            ]
            for i in range(n)
        ]
        ent = [
            [{"name": c, "value": str(b[c][i].as_py())} for c in cats]
            for i in range(n)
        ]
        return pa.table(
            {
                "detector_id": pa.array([config_id] * n),
                "schema_version": pa.array([schema_version] * n, pa.int32()),
                "model_id": b["model_id"],
                "entity": pa.array(ent, type=pa.list_(pa.struct([("name", pa.string()), ("value", pa.string())]))),
                "feature_data": pa.array(
                    fd,
                    type=pa.list_(pa.struct([
                        ("feature_id", pa.string()), ("feature_name", pa.string()), ("data", pa.float64()),
                    ])),
                ),
                "data_start_time": b["window_start_ms"],
                "data_end_time": b["window_end_ms"],
                "anomaly_score": b["anomaly_score"],
                "anomaly_grade": b["anomaly_grade"],
                "confidence": b["confidence"],
            }
        )

    return results_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


class ScoreGroups:
    def __init__(self, config: DetectorConfig, checkpoint_dir: str | None = None):
        self.config = config
        self.store = CheckpointStore(checkpoint_dir) if checkpoint_dir else None

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        c = self.config
        group = group.sort_values("window_end_ms", kind="stable").reset_index(drop=True)
        model_id = str(group["model_id"].iloc[0])

        model = self.store.load(model_id) if self.store else None
        if model is None:
            model = TRCFModel(c, model_id)

        feats = group[list(c.feature_names())].to_numpy(dtype=np.float64)
        ends = group["window_end_ms"].to_numpy(dtype=np.int64)
        out = np.zeros((len(group), 3), dtype=np.float64)
        keep = np.ones(len(group), dtype=bool)
        is_anom = np.zeros(len(group), dtype=bool)
        for i in range(len(group)):
            r = model.process(feats[i], int(ends[i]))
            if r is None:  # out-of-order duplicate (e.g. re-run overlap) → drop row
                keep[i] = False
                continue
            out[i] = (r["anomaly_score"], r["anomaly_grade"], r["confidence"])
            is_anom[i] = r["is_anomaly"]

        if self.store:
            self.store.save(model)

        res = group.loc[keep].copy()
        res["anomaly_score"] = out[keep, 0]
        res["anomaly_grade"] = out[keep, 1]
        res["confidence"] = out[keep, 2]
        res["is_anomaly"] = is_anom[keep]
        return res
