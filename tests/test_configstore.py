"""Config/job CRUD semantics vs the reference's transport-action rules."""


import pytest

from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
from anomaly_detection_ray.state.configstore import (
    ConfigStore,
    ConflictError,
    JobRunningError,
    config_from_json,
    config_to_json,
)


def _cfg(cid="events-detector", interval=600):
    return DetectorConfig(
        config_id=cid,
        interval_s=interval,
        features=(FeatureSpec(name="value_avg", column="value", agg="avg"),),
        category_fields=("event_type",),
    )


def test_config_json_roundtrip():
    from anomaly_detection_ray.functions.rules import Rule

    cfg = DetectorConfig(
        config_id="x",
        features=(FeatureSpec(name="f", column="v", agg="percentile", percentile=0.9),),
        rules=(Rule(feature_name="f", threshold_type="actual_over_expected_ratio", value=0.2),),
    )
    back = config_from_json(config_to_json(cfg))
    assert back == cfg


def test_crud_roundtrip_and_name_uniqueness(tmp_path):
    store = ConfigStore(str(tmp_path))
    doc = store.create("prod-events", _cfg())
    assert doc["seq_no"] == 0 and doc["_id"].startswith("config-")
    assert store.get_config(doc["_id"]) == _cfg()
    # duplicate name rejected regardless of id
    with pytest.raises(ValueError, match="already exists"):
        store.create("prod-events", _cfg(), config_id="other-id")
    # duplicate id rejected
    store.create("second", _cfg("second"), config_id="fixed-id")
    with pytest.raises(ValueError):
        store.create("third", _cfg("third"), config_id="fixed-id")


def test_update_optimistic_concurrency(tmp_path):
    store = ConfigStore(str(tmp_path))
    doc = store.create("d", _cfg())
    cid = doc["_id"]
    d2 = store.update(cid, _cfg(interval=300), if_seq_no=0)
    assert d2["seq_no"] == 1
    assert store.get_config(cid).interval_s == 300
    with pytest.raises(ConflictError):
        store.update(cid, _cfg(interval=60), if_seq_no=0)  # stale
    # without if_seq_no: last-write-wins (the REST default)
    assert store.update(cid, _cfg(interval=60))["seq_no"] == 2


def test_job_gates_update_and_delete(tmp_path):
    store = ConfigStore(str(tmp_path))
    cid = store.create("gated", _cfg())["_id"]
    store.start_job(cid, tick=5)
    assert store.job_enabled(cid)
    with pytest.raises(JobRunningError):
        store.update(cid, _cfg(interval=120))
    with pytest.raises(JobRunningError):
        store.delete(cid)
    store.stop_job(cid, tick=9)
    assert not store.job_enabled(cid)
    store.update(cid, _cfg(interval=120))
    store.delete(cid)
    with pytest.raises(FileNotFoundError):
        store.get(cid)


def test_delete_cascades_results_and_checkpoints(tmp_path):
    store = ConfigStore(str(tmp_path))
    cid = store.create("cascade", _cfg())["_id"]
    results = tmp_path / "results"
    ckpt = tmp_path / "ckpt"
    results.mkdir(), ckpt.mkdir()
    (results / "part-0.parquet").write_bytes(b"x")
    (ckpt / "model.pkl").write_bytes(b"y")
    store.delete(cid, results_dir=str(results), checkpoint_dir=str(ckpt))
    assert not results.exists() and not ckpt.exists()


def test_search(tmp_path):
    store = ConfigStore(str(tmp_path))
    store.create("alpha-events", _cfg("a"))
    store.create("alpha-logs", _cfg("b", interval=60))
    store.create("beta-events", _cfg("c"))
    assert {d["name"] for d in store.search(name_contains="alpha")} == {
        "alpha-events", "alpha-logs",
    }
    assert [d["name"] for d in store.search(interval_s=60)] == ["alpha-logs"]
    assert store.search(name_contains="alpha", interval_s=60)[0]["name"] == "alpha-logs"
    assert store.search(name_contains="nope") == []


def test_run_ticks_halts_when_job_disabled(tmp_path):
    """The scheduler loop exits when another process flips the job doc
    off (JobProcessor stop semantics) — pure loop test, no Ray."""
    from anomaly_detection_ray.tick import run_ticks

    store = ConfigStore(str(tmp_path))
    cid = store.create("loop", _cfg())["_id"]
    store.start_job(cid)

    class FakeAPI:
        config = _cfg()
        events_path = "unused"
        calls = 0

        def start_job(self, results_dir, checkpoint_dir):
            FakeAPI.calls += 1
            if FakeAPI.calls == 2:
                store.stop_job(cid)

    n = run_ticks(
        FakeAPI(), "r", "c", n_ticks=10, interval_s=0,
        sleep=lambda s: None, clock=lambda: 0.0,
        should_run=lambda: store.job_enabled(cid),
    )
    assert FakeAPI.calls == 2 and n == 2


def test_job_doc_fields_and_idempotence(tmp_path):
    store = ConfigStore(str(tmp_path))
    cid = store.create("jobdoc", _cfg())["_id"]
    j = store.start_job(cid, tick=3)
    assert j == {"_id": cid, "enabled": True, "enabled_tick": 3, "disabled_tick": None}
    assert store.start_job(cid, tick=3) == j  # idempotent
    s = store.stop_job(cid, tick=7)
    assert s["enabled"] is False and s["enabled_tick"] == 3 and s["disabled_tick"] == 7
    with pytest.raises(FileNotFoundError):
        store.start_job("missing-id")


def test_update_rejects_duplicate_name(tmp_path):
    """update(name=...) re-checks name uniqueness like create() — the
    reference's update handler refuses duplicate detector names too."""
    import pytest

    from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
    from anomaly_detection_ray.state.configstore import ConfigStore

    store = ConfigStore(str(tmp_path))
    cfg = DetectorConfig(config_id="x", interval_s=600,
                         features=(FeatureSpec("f", "value", "avg"),))
    a = store.create("det-a", cfg)
    store.create("det-b", cfg)
    with pytest.raises(ValueError, match="already exists"):
        store.update(a["_id"], cfg, name="det-b")
    # renaming to an unused name (and keeping one's own name) still works
    store.update(a["_id"], cfg, name="det-a")
    d = store.update(a["_id"], cfg, name="det-c")
    assert d["name"] == "det-c"
