"""ADTask-style task docs: state machine + run_once wiring."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomaly_detection_ray.state.taskstore import TaskStore


def test_state_machine(tmp_path):
    store = TaskStore(str(tmp_path))
    doc = store.create("det-1", time_range_ms=(0, 1000))
    tid = doc["_id"]
    assert doc["state"] == "CREATED" and doc["seq"] == 0
    # deterministic id: same (config, range) → same task
    assert store.task_id("det-1", (0, 1000)) == tid
    assert store.task_id("det-1", (0, 2000)) != tid
    store.transition(tid, "RUNNING")
    with pytest.raises(ValueError, match="illegal transition"):
        store.transition(tid, "INIT")
    d = store.transition(tid, "FINISHED", n_result_rows=42)
    assert d["state"] == "FINISHED" and d["n_result_rows"] == 42 and d["seq"] == 2
    with pytest.raises(ValueError):
        store.transition(tid, "RUNNING")  # terminal
    # idempotent create: FINISHED stays finished …
    assert store.create("det-1", time_range_ms=(0, 1000))["state"] == "FINISHED"
    # … but a non-finished task resets (the reference restarts those)
    t2 = store.create("det-2")["_id"]
    store.transition(t2, "FAILED", error="boom")
    assert store.create("det-2")["state"] == "CREATED"
    assert [d["_id"] for d in store.list(state="FINISHED")] == [tid]
    assert len(store.list(config_id="det-1")) == 1


def test_run_once_tracks_task(ray_session, tmp_path):
    from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
    from anomaly_detection_ray.pipelines.api import DetectorAPI

    n = 3000
    tbl = pa.table(
        {
            "ts": pa.array((1_704_067_200_000 + np.arange(n) * 60_000).astype("int64")),
            "event_type": pa.array(["a"] * n),
            "value": pa.array(np.sin(np.arange(n) / 7.0) + 3.0),
        }
    )
    src = str(tmp_path / "events.parquet")
    pq.write_table(tbl, src)
    cfg = DetectorConfig(config_id="task-det", interval_s=600,
                         category_fields=("event_type",),
                         features=(FeatureSpec("value_avg", "value", "avg"),))
    api = DetectorAPI(cfg, src)
    store = TaskStore(str(tmp_path / "tasks"))
    results = str(tmp_path / "results")
    api.run_once(results_dir=results, task_store=store)
    docs = store.list(config_id="task-det")
    assert len(docs) == 1 and docs[0]["state"] == "FINISHED"
    assert docs[0]["n_result_rows"] and docs[0]["n_result_rows"] > 0
    # rerunning a FINISHED task is a no-op returning the doc
    again = api.run_once(results_dir=results, task_store=store)
    assert isinstance(again, dict) and again["state"] == "FINISHED"
    # a failing run lands in FAILED with the error recorded
    bad = DetectorAPI(
        DetectorConfig(config_id="bad-det", interval_s=600,
                       features=(FeatureSpec("nope_avg", "missing_col", "avg"),)),
        src,
    )
    with pytest.raises(Exception):
        bad.run_once(results_dir=str(tmp_path / "r2"), task_store=store)
    fdoc = store.list(config_id="bad-det")[0]
    assert fdoc["state"] == "FAILED" and fdoc["error"]
