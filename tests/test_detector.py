"""Layer-B tests: RCF, thresholder, imputation, end-to-end detection.

Quality floors mirror the reference's e2e assertion
(`SingleStreamModelPerfIT.java:47-53`: precision ≥ 0.4, window recall
≥ 0.7 on labeled synthetic data) plus exact determinism (preview's
randomSeed(0) promise)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
from anomaly_detection_ray.functions.imputation import (
    batch_shingle,
    fill_missing,
    linear_uniform_impute,
    shingle_fill_nearest,
)
from anomaly_detection_ray.state.checkpoint import CheckpointStore
from anomaly_detection_ray.state.model import TRCFModel
from anomaly_detection_ray.state.rcf import RCForest
from anomaly_detection_ray.state.threshold import ThresholdModel


# ---------- imputation (goldens vs LinearUniformImputer.java) ----------

def test_linear_uniform_impute_matches_reference_semantics():
    # n=1 → constant fill
    assert np.allclose(linear_uniform_impute([[2.0]], 4), [[2.0]] * 4)
    # stretch 2→5: endpoints pinned, linear between
    out = linear_uniform_impute([[0.0], [4.0]], 5)
    assert np.allclose(out.ravel(), [0, 1, 2, 3, 4])
    # integer-sensitive rounding (IntegerSensitiveLinearUniformImputerTests)
    out = linear_uniform_impute([[0.0], [3.0]], 4, integer_sensitive=True)
    assert np.array_equal(out.ravel(), np.rint(np.asarray([0, 1, 2, 3.0])))
    # multi-feature stretch 3→5
    out = linear_uniform_impute([[0.0, 10.0], [2.0, 20.0], [4.0, 30.0]], 5)
    assert np.allclose(out[:, 0], [0, 1, 2, 3, 4])
    assert np.allclose(out[:, 1], [10, 15, 20, 25, 30])


def test_fill_missing_policies():
    v = np.array([[1.0], [np.nan], [3.0]])
    assert np.allclose(fill_missing(v, "zero")[1], 0.0)
    assert np.allclose(fill_missing(v, "fixed", 9.0)[1], 9.0)
    assert np.allclose(fill_missing(v, "previous")[1], 1.0)
    assert np.allclose(fill_missing(v, "linear")[1], 2.0)


def test_batch_shingle_shape():
    pts = np.arange(10, dtype=float).reshape(5, 2)
    sh = batch_shingle(pts, 3)
    assert sh.shape == (3, 6)
    assert np.allclose(sh[0], [0, 1, 2, 3, 4, 5])


def test_shingle_fill_nearest():
    w = [np.array([1.0]), None, np.array([3.0]), np.array([4.0])]
    filled = shingle_fill_nearest(w, max_missing_rate=0.26, max_neighbor_distance=2)
    assert filled is not None and filled[1] == 3.0  # tie dist=1 → ceiling neighbor
    # too many missing → None
    assert shingle_fill_nearest([None, None, np.array([1.0]), None]) is None


# ---------- RCF ----------

def test_forest_build_invariants():
    """Every tree's root mass equals the sample size; leaf masses sum to
    it; bboxes nest (child within parent)."""
    rng = np.random.default_rng(0)
    f = RCForest(num_trees=8, sample_size=64, seed=1)
    for p in rng.normal(size=(200, 3)):
        f.observe(p)
    assert f._built and f._built_size == 64
    for r in f._roots:
        assert f._count[r] == 64
    leaf = f._left < 0
    assert f._count[leaf].sum() == 8 * 64
    internal = np.flatnonzero(~leaf)
    for n in internal[:200]:
        for ch in (f._left[n], f._right[n]):
            assert (f._lo[ch] >= f._lo[n] - 1e-12).all()
            assert (f._hi[ch] <= f._hi[n] + 1e-12).all()
        assert f._count[n] == f._count[f._left[n]] + f._count[f._right[n]]


def test_reservoir_time_decay_semantics():
    """The time-decayed reservoir (λ = time_decay) keeps a recency-biased
    sample with mean age ≈ 1/λ — retaining points older than the sample
    size (impossible for round-1's sliding window) while still turning
    over after a regime change."""
    f = RCForest(num_trees=1, sample_size=128, seed=0, time_decay=1 / 1024)
    n = 10_000
    for i in range(n):
        f.observe(np.array([float(i % 7)]))
    ages = n - np.asarray(sorted(f._res))
    assert ages.max() > 128            # older than any sliding window
    assert 300 < ages.mean() < 3000    # ≈ 1/λ = 1024
    # regime change: after 2·(1/λ) more points, most of the sample is new
    for i in range(n, n + 2048):
        f.observe(np.array([100.0]))
    frac_new = np.mean(np.asarray(sorted(f._res)) >= n)
    assert frac_new > 0.5
    # λ=0 → uniform reservoir over the whole stream (no recency bias)
    g = RCForest(num_trees=1, sample_size=128, seed=0, time_decay=0.0)
    for i in range(n):
        g.observe(np.array([float(i)]))
    assert np.mean(n - np.asarray(sorted(g._res))) > n / 4


def test_batch_scoring_identical_to_per_point():
    """score_then_observe_batch must be bit-identical to per-point
    score_and_update regardless of batch split (the chunk boundaries are
    the absolute rebuild schedule, not call boundaries)."""
    pts = np.random.default_rng(5).normal(size=(300, 4))
    f1, f2, f3 = (RCForest(10, 64, seed=1) for _ in range(3))
    a = np.asarray([f1.score_and_update(p) for p in pts])
    b = f2.score_then_observe_batch(pts)
    c = np.concatenate([f3.score_then_observe_batch(pts[:50]),
                        f3.score_then_observe_batch(pts[50:57]),
                        f3.score_then_observe_batch(pts[57:])])
    assert np.array_equal(a, b) and np.array_equal(a, c)


def test_forest_scores_spike_higher():
    rng = np.random.default_rng(3)
    f = RCForest(num_trees=20, sample_size=128, seed=7)
    normal_scores, spike_score = [], None
    for i in range(300):
        x = np.array([np.cos(i / 8.0), np.sin(i / 8.0)])
        normal_scores.append(f.score_and_update(x))
    spike_score = f.score_and_update(np.array([25.0, -25.0]))
    assert spike_score > 3 * np.mean(normal_scores[-50:])


def test_forest_deterministic():
    pts = np.random.default_rng(5).normal(size=(100, 2))
    s1 = [RCForest(10, 64, seed=1).score_and_update for _ in range(1)][0]
    f1, f2 = RCForest(10, 64, seed=1), RCForest(10, 64, seed=1)
    a = [f1.score_and_update(p) for p in pts]
    b = [f2.score_and_update(p) for p in pts]
    assert a == b


# ---------- thresholder ----------

def test_threshold_grade_semantics():
    m = ThresholdModel(min_score=0.4, p=0.995)
    for s in np.linspace(0.5, 1.0, 1000):
        m.update(s)
    assert m.grade(0.3) == 0.0          # below MIN_SCORE
    assert m.grade(0.6) == 0.0          # low rank
    assert m.grade(2.0) == pytest.approx(1.0)  # above everything
    assert 0.0 < m.grade(0.9999) <= 1.0 or m.grade(0.9999) == 0.0
    assert m.confidence() == 0.99


def test_threshold_downsample_deterministic():
    m1, m2 = ThresholdModel(max_size=100), ThresholdModel(max_size=100)
    for s in np.linspace(0, 1, 1000):
        m1.update(s)
        m2.update(s)
    assert m1.rank(0.5) == m2.rank(0.5)
    m1._flush()
    assert m1._sorted.size <= 200


# ---------- model + checkpoint ----------

def _run_stream(model, n=120, spike_at=(100,), seed=11):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        v = 100 + 50 * np.cos(2 * np.pi * i / 24) + rng.uniform(-2, 2)
        if i in spike_at:
            v *= 5
        r = model.process(np.array([v]), (i + 1) * 600_000)
        out.append(r)
    return out


def test_model_detects_spike_and_orders():
    cfg = DetectorConfig(config_id="d1", interval_s=600, shingle_size=8,
                         features=(FeatureSpec("f0", "value", "avg"),), num_trees=20, sample_size=128)
    m = TRCFModel(cfg, "d1_model")
    out = _run_stream(m, 120, spike_at=(100,))
    scores = [r["anomaly_score"] for r in out]
    assert max(scores[:31]) == 0.0  # warm-up (first output_after−1 points) emits zero scores
    # the spike dominates: every top-6 score sits inside the spike's
    # shingle window [100, 100+s), and the spike window itself scores
    # far above the post-warm-up median (post-spike shingles contain the
    # spike, so they legitimately score comparably high)
    arr = np.asarray(scores)
    top6 = np.argsort(-arr)[:6]
    assert all(100 <= i < 100 + 8 for i in top6), top6
    assert arr[100] > 4 * np.median(arr[32:])
    # out-of-order drop
    assert m.process(np.array([1.0]), 600_000) is None
    assert m.n_dropped_ooo == 1


def test_model_gap_reset_and_impute():
    cfg = DetectorConfig(config_id="d1", features=(FeatureSpec("f0", "value", "avg"),),
                         num_trees=5, sample_size=32)
    m = TRCFModel(cfg, "x")
    m.process(np.array([1.0]), 600_000)
    m.process(np.array([1.0]), 600_000 * 5)  # gap of 3 → imputed internally
    assert m.n_points == 1 + 3 + 1
    m.process(np.array([1.0]), 600_000 * 20_000)  # giant gap → reset
    assert m.n_points == 1


def test_checkpoint_roundtrip_identical_scoring(tmp_path):
    """FIXTURES.md F5 checkpoint_roundtrip: serialize → restore →
    identical scores on the next windows (analogue of the reference's
    golden checkpoint BWC tests)."""
    cfg = DetectorConfig(config_id="d1", features=(FeatureSpec("f0", "value", "avg"),),
                         num_trees=10, sample_size=64)
    m = TRCFModel(cfg, "m1")
    _run_stream(m, 80)
    store = CheckpointStore(str(tmp_path))
    meta = store.save(m)
    assert meta["n_points"] == 80 and len(meta["sha256"]) == 64
    m2 = store.load("m1")
    cont1 = [m.process(np.array([500.0 + i]), (81 + i) * 600_000) for i in range(10)]
    cont2 = [m2.process(np.array([500.0 + i]), (81 + i) * 600_000) for i in range(10)]
    assert [r["anomaly_score"] for r in cont1] == [r["anomaly_score"] for r in cont2]


# ---------- end-to-end detector pipeline ----------

@pytest.fixture(scope="module")
def stream_table():
    from anomaly_detection_ray.sources.streams import generate_interval_stream

    return generate_interval_stream(
        n_entities=8, n_windows=300, interval_s=600, seed=42,
        anomaly_prob=0.01, spike_factor=5.0, events_per_window=2,
    )


def _detector_cfg():
    return DetectorConfig(
        config_id="det-e2e",
        interval_s=600,
        shingle_size=8,
        features=(FeatureSpec("value_avg", "value", "avg"),),
        category_fields=("entity",),
        num_trees=20,
        sample_size=128,
    )


def test_detect_end_to_end_quality(ray_session, stream_table):
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = _detector_cfg()
    ds = rd.from_arrow(stream_table)
    res = detect(ds, cfg, ts_col="ts", concurrency=2).to_pandas()
    assert {"model_id", "anomaly_score", "anomaly_grade", "window_end_ms"} <= set(res.columns)

    truth = stream_table.to_pandas()
    ts_ms = truth["ts"].astype("datetime64[ms]").astype("int64")
    truth["window_end_ms"] = ts_ms // 600_000 * 600_000 + 600_000
    label = truth.groupby(["entity", "window_end_ms"])["is_anomaly_truth"].any().reset_index()
    spikes = label[label["is_anomaly_truth"]]
    assert len(spikes) > 0
    res = res[res["anomaly_score"] > 0]  # past warm-up
    flagged = res[res["anomaly_grade"] > 0]

    # window-tolerant evaluation, like the reference's labeled anomaly
    # WINDOWS (`SingleStreamModelPerfIT.java:107-135`): a flag is a true
    # positive if within `shingle_size` windows after a labeled spike
    # (post-spike shingles legitimately contain the anomaly); a spike is
    # recalled if any flag lands within 2 windows of it.
    w = 600_000
    tol = cfg.shingle_size * w

    def near(row, within):
        s = spikes[spikes["entity"] == row["entity"]]
        return bool(((row["window_end_ms"] - s["window_end_ms"]).between(0, within)).any())

    tp = flagged.apply(lambda r: near(r, tol), axis=1)
    precision = tp.mean() if len(flagged) else 0.0
    recalled = spikes.apply(
        lambda s: bool(
            (
                (flagged["entity"] == s["entity"])
                & (flagged["window_end_ms"] - s["window_end_ms"]).between(0, 2 * w)
            ).any()
        ),
        axis=1,
    )
    recall = recalled.mean()
    assert precision >= 0.4, f"precision {precision}"
    assert recall >= 0.7, f"recall {recall}"


def test_detect_quality_independent_labeled_fixture(ray_session):
    """Detector quality on a labeled series family the training/spike
    generator (``sources.streams.generate_interval_stream`` — cosine +
    multiplicative spikes) NEVER produces: two superimposed seasonal
    periods (24 and 168 windows) + linear trend + additive point
    anomalies of alternating sign + a CONTEXTUAL anomaly (the value of
    the opposite seasonal phase — globally in-range, wrong for its
    position) + a persistent level shift. Floors are the reference's own
    labeled-data gates (``SingleStreamModelPerfIT.java:47-53``:
    precision ≥ 0.4, window-tolerant recall ≥ 0.7). Deterministic from
    the fixed seed — detect() itself is seeded from config.seed ⊕
    murmur3(model_id)."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    W = 600_000
    T0 = 1704067200000
    n_windows, mag = 900, 300.0
    rng = np.random.default_rng(7)
    frames, labels = [], []
    for e in range(3):
        i = np.arange(n_windows, dtype=np.float64)
        phase = rng.uniform(0, 2 * np.pi)
        vals = (500.0 + 0.05 * i
                + 80.0 * np.sin(2 * np.pi * i / 24 + phase)
                + 40.0 * np.sin(2 * np.pi * i / 168 + phase / 2)
                + rng.normal(0, 3.0, n_windows))
        lab = np.zeros(n_windows, dtype=bool)
        pts = rng.choice(np.arange(350, n_windows - 40), size=8, replace=False)
        pts.sort()
        keep = [pts[0]]  # ≥30 windows apart so label windows never merge
        for p in pts[1:]:
            if p - keep[-1] >= 30:
                keep.append(p)
        for k, p in enumerate(keep):
            vals[p] += mag if k % 2 == 0 else -mag
            lab[p] = True
        c = int(keep[0] + 15)  # contextual: phase-opposite, globally in-range
        vals[c] = (500.0 + 0.05 * c
                   + 80.0 * np.sin(2 * np.pi * c / 24 + phase + np.pi)
                   + 40.0 * np.sin(2 * np.pi * c / 168 + phase / 2 + np.pi))
        lab[c] = True
        s = int(keep[-1] + 20)  # level shift, labeled at the shift window
        vals[s:] += 70.0
        lab[s] = True
        ts = T0 + (np.arange(n_windows, dtype=np.int64) + 1) * W
        frames.append(pd.DataFrame({"entity": f"ent{e}", "ts": ts, "value": vals}))
        labels.append(pd.DataFrame({"entity": f"ent{e}", "window_end_ms": ts, "truth": lab}))
    ev = pd.concat(frames, ignore_index=True)
    ev["ts"] = ev["ts"].astype("datetime64[ms]")
    spikes = pd.concat(labels, ignore_index=True)
    spikes = spikes[spikes["truth"]]
    tbl = pa.Table.from_pandas(ev, preserve_index=False)

    cfg = _detector_cfg()
    res = detect(rd.from_arrow(tbl), cfg, ts_col="ts", concurrency=2).to_pandas()
    res = res[res["anomaly_score"] > 0]
    flagged = res[res["anomaly_grade"] > 0]
    tol = cfg.shingle_size * W

    def near(row, within):
        s = spikes[spikes["entity"] == row["entity"]]
        return bool(((row["window_end_ms"] - s["window_end_ms"]).between(0, within)).any())

    tp = flagged.apply(lambda r: near(r, tol), axis=1)
    precision = tp.mean() if len(flagged) else 0.0
    recalled = spikes.apply(
        lambda s: bool(((flagged["entity"] == s["entity"])
                        & (flagged["window_end_ms"] - s["window_end_ms"]).between(0, 2 * W)).any()),
        axis=1,
    )
    recall = recalled.mean()
    assert precision >= 0.4, f"precision {precision}"
    assert recall >= 0.7, f"recall {recall}"


def test_detect_deterministic(ray_session, stream_table):
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = _detector_cfg()
    sort_cols = ["model_id", "window_end_ms"]
    a = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2).to_pandas().sort_values(sort_cols).reset_index(drop=True)
    b = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2).to_pandas().sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_detect_coarse_plan_bit_identical(ray_session, stream_table):
    """Coarse-keyed scoring exchange (hash(model_id) % n groups, many
    models per group) must be bit-identical to the legacy one-group-per-
    model plan — models are independent and each is still processed in
    window order. coarse_groups=3 forces multiple models per group (8
    entities); both fused plans are covered since mergeable(cfg) is True,
    and force_fused=False covers the raw two-shuffle plan too."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = _detector_cfg()
    sort_cols = ["model_id", "window_end_ms"]

    def run(**kw):
        return (detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2, **kw)
                .to_pandas().sort_values(sort_cols).reset_index(drop=True))

    legacy = run(coarse_groups=0)
    coarse = run(coarse_groups=3)
    assert "_coarse" not in coarse.columns
    pd.testing.assert_frame_equal(coarse, legacy)
    coarse_raw = run(coarse_groups=3, force_fused=False)
    legacy_raw = run(coarse_groups=0, force_fused=False)
    pd.testing.assert_frame_equal(coarse_raw, legacy_raw)


def test_forecast_coarse_plan_bit_identical(ray_session, stream_table):
    import ray.data as rd

    from anomaly_detection_ray.pipelines.forecast import forecast

    cfg = _detector_cfg()
    sort_cols = ["entity", "horizon_index"]

    def run(**kw):
        return (forecast(rd.from_arrow(stream_table), cfg, horizon=6, concurrency=2, **kw)
                .to_pandas().sort_values(sort_cols).reset_index(drop=True)
                [["entity", "horizon_index", "forecast_value", "forecast_lower",
                  "forecast_upper", "confidence", "forecast_window_start_ms",
                  "forecast_window_end_ms"]])

    legacy = run(coarse_groups=0)
    coarse = run(coarse_groups=3)
    pd.testing.assert_frame_equal(coarse, legacy)


def test_process_many_identical_to_process():
    """The batched model path must be bit-identical to per-point process()
    across gaps, NaN features and imputation."""
    cfg = DetectorConfig(config_id="pm", interval_s=600, shingle_size=8,
                         features=(FeatureSpec("f0", "value", "avg"),),
                         num_trees=10, sample_size=64, imputation="linear")
    rng = np.random.default_rng(7)
    n = 300
    vals = 100 + 50 * np.cos(2 * np.pi * np.arange(n) / 24) + rng.uniform(-2, 2, n)
    vals[80] *= 5
    vals[150] = np.nan
    ends = (np.arange(n) + 1) * 600_000
    ends[200:] += 5 * 600_000        # gap of 5 windows at 200
    ends = ends.copy()
    m1, m2 = TRCFModel(cfg, "m"), TRCFModel(cfg, "m")
    per_point = [m1.process(np.array([v]), int(e)) for v, e in zip(vals, ends)]
    out = m2.process_many(vals[:, None], ends)
    assert np.array_equal(np.array([r["anomaly_score"] for r in per_point]), out["anomaly_score"])
    assert np.array_equal(np.array([r["anomaly_grade"] for r in per_point]), out["anomaly_grade"])
    assert m1.n_points == m2.n_points
    assert np.array_equal(np.concatenate(m1.shingle), np.concatenate(m2.shingle))
    # detailed pass returns the same scores plus sane enrichment
    m3 = TRCFModel(cfg, "m")
    det = m3.process_many(vals[:, None], ends, detailed=True)
    assert np.array_equal(det["anomaly_score"], out["anomaly_score"])
    i = 80  # the spike: expected value should sit near the normal band
    assert det["anomaly_score"][i] > 2.0
    assert abs(det["expected"][i, 0] - 150) < 120  # normal band is 50..150
    assert det["attribution"][i, 0] == pytest.approx(det["anomaly_score"][i])
    assert det["past"][i, 0] == pytest.approx(vals[79])


def test_detect_with_rules_suppression(ray_session):
    """B9 wired end-to-end: config.rules suppress within-margin anomalies
    using the scorer's own expected values, while real spikes survive
    (IgnoreSimilarExtractor / ADColdStart.java:304-324 semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.functions.rules import Rule
    from anomaly_detection_ray.pipelines.detector import detect

    rng = np.random.default_rng(4)
    n = 260
    vals = 100 + rng.uniform(-1, 1, n)
    vals[200] = 5000.0   # huge spike: must survive any margin rule
    ts = (np.arange(n) + 1) * 600_000
    t = pa.table({
        "entity": ["e0"] * n,
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("ms")),
        "value": vals,
    })
    base_cfg = dict(
        config_id="rules-e2e", interval_s=600, shingle_size=8,
        features=(FeatureSpec("value_avg", "value", "avg"),),
        category_fields=("entity",), num_trees=10, sample_size=64,
    )
    cfg = DetectorConfig(**base_cfg, rules=(Rule("value_avg", "actual_over_expected_margin", 10_000.0),))
    res = detect(rd.from_arrow(t), cfg, concurrency=1).to_pandas().reset_index(drop=True)
    assert {"value_avg_expected", "value_avg_attribution", "value_avg_past", "suppressed_by_rule"} <= set(res.columns)
    spike = res.loc[res["value_avg"].idxmax()]  # the planted 5000 window itself
    spike_we = spike["window_end_ms"]
    # within the absurd 10k margin → suppressed despite the high score
    assert spike["anomaly_score"] > 2.0 and spike["anomaly_grade"] == 0.0 and spike["suppressed_by_rule"]
    # tight margin → the spike survives
    cfg2 = DetectorConfig(**base_cfg, rules=(Rule("value_avg", "actual_over_expected_margin", 5.0),))
    res2 = detect(rd.from_arrow(t), cfg2, concurrency=1).to_pandas()
    spike2 = res2[res2["window_end_ms"] == spike_we].iloc[0]
    assert spike2["anomaly_grade"] > 0.0 and not spike2["suppressed_by_rule"]
    assert not res2["suppressed_by_rule"].iloc[:100].any()


def test_process_many_chunked_equals_whole():
    """VERDICT r1 #7 (chunked stateful scoring): feeding a model's history
    in bounded chunks produces byte-identical results to one call — a
    100x-longer history can stream through in slices without ever
    needing the whole group's scores in flight."""
    cfg = DetectorConfig(config_id="chunks", interval_s=600, shingle_size=8,
                         features=(FeatureSpec("f0", "value", "avg"),),
                         num_trees=10, sample_size=64)
    rng = np.random.default_rng(13)
    n = 500
    vals = (100 + 20 * np.sin(np.arange(n) / 9) + rng.uniform(-1, 1, n))[:, None]
    ends = (np.arange(n) + 1) * 600_000
    m1, m2 = TRCFModel(cfg, "m"), TRCFModel(cfg, "m")
    whole = m1.process_many(vals, ends)
    parts = [m2.process_many(vals[i:i + 97], ends[i:i + 97]) for i in range(0, n, 97)]
    for key in ("anomaly_score", "anomaly_grade", "confidence"):
        assert np.array_equal(whole[key], np.concatenate([p[key] for p in parts])), key


def test_cold_start_history_parity(ray_session, stream_table):
    """C4: a time-range run trains cold models on the preceding history
    windows (ModelColdStart.java:217-339 sample fetch) — scores inside
    the range equal a run that saw the whole stream live."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = DetectorConfig(
        config_id="det-e2e", interval_s=600, shingle_size=8,
        features=(FeatureSpec("value_avg", "value", "avg"),),
        category_fields=("entity",), num_trees=10, sample_size=64,
        history_intervals=160,  # covers every window before the cut
    )
    sort_cols = ["model_id", "window_end_ms"]
    full = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2)\
        .to_pandas().sort_values(sort_cols).reset_index(drop=True)
    w = 600_000
    lo = int(full["window_start_ms"].min() + 150 * w)
    hi = int(full["window_end_ms"].max())
    ranged = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2,
                    time_range_ms=(lo, hi))\
        .to_pandas().sort_values(sort_cols).reset_index(drop=True)
    want = full[full["window_start_ms"] >= lo].reset_index(drop=True)
    pd.testing.assert_frame_equal(ranged, want)
    # without history the same range cold-starts blind: its warm-up
    # re-runs inside the range (zero scores where the full run scored)
    blind = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2,
                   time_range_ms=(lo, hi), cold_start_history=False)\
        .to_pandas().sort_values(sort_cols).reset_index(drop=True)
    head = blind.groupby("model_id").head(20)
    assert (head["anomaly_score"] == 0).all()
    assert (want.groupby("model_id").head(20)["anomaly_score"] > 0).any()


def test_detect_two_categories_two_features(ray_session):
    """HC limit case (reference supports ≤2 category fields) with a
    2-feature detector: one model per (entity, region) combo, per-feature
    expected values + attribution, spike flagged on the right combo and
    attributed to the right feature."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    rng = np.random.default_rng(6)
    rows = []
    n_win = 160
    for e in ("a", "b"):
        for r in ("east", "west"):
            for i in range(n_win):
                v = 50 + (10 if e == "a" else 0) + rng.uniform(-1, 1)
                c = 5 + rng.uniform(-0.5, 0.5)
                if (e, r) == ("b", "west") and i == 120:
                    v = 5000.0  # spike only in feature 1 of one combo
                rows.append((e, r, (i + 1) * 600_000, v, c))
    t = pa.table({
        "entity": [r[0] for r in rows],
        "region": [r[1] for r in rows],
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(pa.timestamp("ms")),
        "value": [r[3] for r in rows],
        "cost": [r[4] for r in rows],
    })
    cfg = DetectorConfig(
        config_id="hc2", interval_s=600, shingle_size=8,
        features=(FeatureSpec("value_avg", "value", "avg"),
                  FeatureSpec("cost_max", "cost", "max")),
        category_fields=("entity", "region"),
        num_trees=10, sample_size=64,
    )
    res = detect(rd.from_arrow(t), cfg, concurrency=2, detailed=True).to_pandas()
    assert res["model_id"].nunique() == 4
    assert {"value_avg_expected", "cost_max_expected", "value_avg_attribution",
            "cost_max_attribution"} <= set(res.columns)
    flagged = res[res["anomaly_grade"] > 0]
    assert len(flagged) > 0
    combos = set(zip(flagged["entity"], flagged["region"]))
    assert combos == {("b", "west")}
    spike = res.loc[res["value_avg"].idxmax()]
    assert spike["entity"] == "b" and spike["region"] == "west"
    assert spike["anomaly_grade"] > 0
    # the offending feature dominates the attribution
    assert spike["value_avg_attribution"] > 0.7 > spike["cost_max_attribution"]
    # determinism across runs with 2 cats + 2 features
    res2 = detect(rd.from_arrow(t), cfg, concurrency=2, detailed=True).to_pandas()
    key = ["model_id", "window_end_ms"]
    pd.testing.assert_frame_equal(
        res.sort_values(key).reset_index(drop=True),
        res2.sort_values(key).reset_index(drop=True),
    )


def test_detect_degenerate_inputs(ray_session):
    """Empty input → empty result; a single window → warm-up zero score;
    an all-NaN feature stream imputes and never alarms."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = DetectorConfig(config_id="degen", interval_s=600, category_fields=("entity",),
                         features=(FeatureSpec("value_avg", "value", "avg"),),
                         num_trees=5, sample_size=32)
    empty = pa.table({"entity": pa.array([], pa.string()),
                      "ts": pa.array([], pa.int64()).cast(pa.timestamp("ms")),
                      "value": pa.array([], pa.float64())})
    assert len(detect(rd.from_arrow(empty), cfg, concurrency=1).to_pandas()) == 0
    one = pa.table({"entity": ["e"], "ts": pa.array([600_000], pa.int64()).cast(pa.timestamp("ms")),
                    "value": [1.0]})
    out = detect(rd.from_arrow(one), cfg, concurrency=1).to_pandas()
    assert len(out) == 1 and out["anomaly_score"].iloc[0] == 0.0
    nan = pa.table({"entity": ["e"] * 40,
                    "ts": pa.array((np.arange(40) + 1) * 600_000, pa.int64()).cast(pa.timestamp("ms")),
                    "value": [float("nan")] * 40})
    out = detect(rd.from_arrow(nan), cfg, concurrency=1).to_pandas()
    assert len(out) == 40 and (out["anomaly_grade"] == 0).all()
    # empty model-level batch is a no-op
    m = TRCFModel(cfg, "m")
    r = m.process_many(np.empty((0, 1)), np.empty(0, dtype=np.int64))
    assert r["keep"].size == 0 and m.n_points == 0


def test_detect_high_cardinality_quality(ray_session):
    """HC-scale shape mirroring the reference's multi-entity cosine
    generator (generate-cosine-data-multi-entity.py defaults scaled
    down): 100 entity models in one run, quality floors per the e2e
    assertion, and every entity's model independent (no cross-entity
    flag leakage)."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect
    from anomaly_detection_ray.sources.streams import generate_interval_stream

    t = generate_interval_stream(n_entities=100, n_windows=160, interval_s=600, seed=21,
                                 anomaly_prob=0.01, spike_factor=5.0, period=24)
    cfg = DetectorConfig(
        config_id="hc100", interval_s=600, shingle_size=8,
        features=(FeatureSpec("value_avg", "value", "avg"),),
        category_fields=("entity",), num_trees=10, sample_size=64,
    )
    res = detect(rd.from_arrow(t), cfg, ts_col="ts", concurrency=4).to_pandas()
    assert res["model_id"].nunique() == 100

    truth = t.to_pandas()
    ts_ms = truth["ts"].astype("datetime64[ms]").astype("int64")
    truth["window_end_ms"] = ts_ms // 600_000 * 600_000 + 600_000
    label = truth.groupby(["entity", "window_end_ms"])["is_anomaly_truth"].any().reset_index()
    spikes = label[label["is_anomaly_truth"]]
    assert len(spikes) > 20  # 100 entities × 160 windows × 1%
    flagged = res[(res["anomaly_grade"] > 0)]
    w = 600_000

    def near(row, within):
        s = spikes[spikes["entity"] == row["entity"]]
        return bool(((row["window_end_ms"] - s["window_end_ms"]).between(0, within)).any())

    tp = flagged.apply(lambda r: near(r, cfg.shingle_size * w), axis=1)
    precision = tp.mean() if len(flagged) else 0.0
    recalled = spikes.apply(
        lambda s: bool(((flagged["entity"] == s["entity"])
                        & (flagged["window_end_ms"] - s["window_end_ms"]).between(0, 2 * w)).any()),
        axis=1,
    )
    assert precision >= 0.4, f"precision {precision}"
    assert recalled.mean() >= 0.7, f"recall {recalled.mean()}"


def test_fused_plan_equals_two_shuffle_plan(ray_session, stream_table):
    """The single-shuffle fused plan (map-side partials) and the
    two-shuffle groupby-aggregate plan must produce identical results
    for mergeable aggs — same windows, same feature values, same scores."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = _detector_cfg()
    key = ["model_id", "window_end_ms"]
    fused = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2)\
        .to_pandas().sort_values(key).reset_index(drop=True)
    two = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2,
                 force_fused=False).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fused[sorted(fused.columns)], two[sorted(two.columns)],
                                  check_like=True)


def test_chunked_scoring_byte_identical(ray_session):
    """In-run chunked stateful scoring: one entity with a long history
    scored under a tiny chunk cap must be byte-identical to the unchunked
    path (bounds per-group work-array memory — VERDICT r2 item #2)."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect
    from anomaly_detection_ray.sources.streams import generate_interval_stream

    t = generate_interval_stream(
        n_entities=2, n_windows=1200, interval_s=600, seed=9,
        anomaly_prob=0.01, spike_factor=5.0, events_per_window=2,
    )
    cfg = DetectorConfig(
        config_id="chunk", interval_s=600, shingle_size=8,
        features=(FeatureSpec("value_avg", "value", "avg"),
                  FeatureSpec("value_max", "value", "max")),
        category_fields=("entity",), num_trees=10, sample_size=64,
    )
    key = ["model_id", "window_end_ms"]
    whole = detect(rd.from_arrow(t), cfg, ts_col="ts", concurrency=1, detailed=True,
                   chunk_rows=10**9).to_pandas().sort_values(key).reset_index(drop=True)
    chunked = detect(rd.from_arrow(t), cfg, ts_col="ts", concurrency=1, detailed=True,
                     chunk_rows=97).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, chunked)
    assert len(whole) > 1000  # the history actually spanned many chunks


def test_detect_percentile_feature_two_shuffle(ray_session, stream_table):
    """A percentile feature is non-mergeable → detect silently uses the
    two-shuffle plan end-to-end (the fallback path stays exercised)."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.detector import detect

    cfg = DetectorConfig(
        config_id="pct", interval_s=600, shingle_size=8,
        features=(FeatureSpec("value_p90", "value", "percentile", percentile=0.9),),
        category_fields=("entity",), num_trees=5, sample_size=32,
    )
    res = detect(rd.from_arrow(stream_table), cfg, ts_col="ts", concurrency=2).to_pandas()
    assert len(res) > 0 and "value_p90" in res.columns
    assert res["anomaly_score"].max() > 0  # scored past warm-up


def test_read_events_formats_equivalent(ray_session, tmp_path):
    """CSV / JSONL / parquet event logs normalize to one schema and give
    identical detect() results (the multi-format ingest surface)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from anomaly_detection_ray.pipelines.detector import detect
    from anomaly_detection_ray.sources.files import read_events

    rng = np.random.default_rng(3)
    n = 200
    ts_ms = (np.arange(n) + 1) * 600_000 + 1_700_000_000_000
    rows = [{"entity": f"e{i % 2}", "ts": int(ts_ms[i]), "value": round(float(rng.normal(100, 5)), 6)}
            for i in range(n)]
    pqp = str(tmp_path / "ev.parquet")
    t = pa.table({
        "entity": [r["entity"] for r in rows],
        "ts": pa.array([r["ts"] for r in rows], pa.int64()).cast(pa.timestamp("ms")),
        "value": [r["value"] for r in rows],
    })
    pq.write_table(t, pqp)
    csvp = str(tmp_path / "ev.csv")
    with open(csvp, "w") as f:
        f.write("entity,ts,value\n")
        for r in rows:
            f.write(f"{r['entity']},{r['ts']},{r['value']}\n")
    jlp = str(tmp_path / "ev.jsonl")
    with open(jlp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    cfg = DetectorConfig(config_id="fmt", interval_s=600, category_fields=("entity",),
                         features=(FeatureSpec("value_avg", "value", "avg"),),
                         num_trees=5, sample_size=32)
    key = ["model_id", "window_end_ms"]
    outs = {}
    for name, path in [("parquet", pqp), ("csv", csvp), ("jsonl", jlp)]:
        ds = read_events(path)
        outs[name] = detect(ds, cfg, concurrency=1).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["parquet"], outs["csv"])
    pd.testing.assert_frame_equal(outs["parquet"], outs["jsonl"])
    # epoch-SECONDS timestamps auto-detect (magnitude heuristic)
    csv2 = str(tmp_path / "ev_s.csv")
    with open(csv2, "w") as f:
        f.write("entity,ts,value\n")
        for r in rows:
            f.write(f"{r['entity']},{r['ts'] // 1000},{r['value']}\n")
    secs = detect(read_events(csv2), cfg, concurrency=1).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["parquet"], secs)


def test_normalize_ts_float_epochs(ray_session, tmp_path):
    """Fractional epoch-seconds (float CSV timestamps) must not crash the
    int64 cast and must keep sub-second precision after the ms scaling."""
    import pyarrow as pa

    from anomaly_detection_ray.sources.files import normalize_ts

    t = pa.table({"ts": pa.array([1_700_000_000.25, 1_700_000_001.75, 0.0], pa.float64())})
    out = normalize_ts(t, "ts")
    ms = out["ts"].cast(pa.int64()).to_pylist()
    assert ms == [1_700_000_000_250, 1_700_000_001_750, 0]
    # float epoch-MILLIS stay millis (magnitude auto-detect on floats)
    t2 = pa.table({"ts": pa.array([1_700_000_000_250.0, 1_700_000_001_750.0], pa.float64())})
    assert normalize_ts(t2, "ts")["ts"].cast(pa.int64()).to_pylist() == [
        1_700_000_000_250, 1_700_000_001_750]
