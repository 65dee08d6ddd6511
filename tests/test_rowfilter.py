"""Detector filter_query: row-predicate compilation + detect() wiring."""

import numpy as np
import pyarrow as pa
import pytest

from anomaly_detection_ray.functions.rowfilter import (
    apply_filter_query,
    compile_row_predicate,
)

TBL = pa.table(
    {
        "event_type": pa.array(["click", "view", None, "purchase", "signup"]),
        "value": pa.array([5.0, 150.0, 20.0, 30.0, None]),
        "user": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }
)


def _ids(query):
    expr = compile_row_predicate(query)
    return TBL.filter(expr)["user"].to_pylist() if expr is not None else TBL["user"].to_pylist()


def test_leaves_and_null_semantics():
    assert _ids(None) == [1, 2, 3, 4, 5]
    assert _ids({"match_all": {}}) == [1, 2, 3, 4, 5]
    assert _ids({"term": {"event_type": "click"}}) == [1]
    assert _ids({"terms": {"event_type": ["click", "signup"]}}) == [1, 5]
    assert _ids({"range": {"value": {"gte": 20, "lt": 100}}}) == [3, 4]
    assert _ids({"exists": {"field": "event_type"}}) == [1, 2, 4, 5]
    assert _ids({"prefix": {"event_type": "s"}}) == [5]
    assert _ids({"wildcard": {"event_type": "?lick"}}) == [1]
    assert _ids({"regexp": {"event_type": "(click|view)"}}) == [1, 2]
    # must_not over a null field MATCHES (the inner query didn't) —
    # OpenSearch semantics, not SQL three-valued logic
    assert _ids({"bool": {"must_not": [{"term": {"event_type": "view"}}]}}) == [1, 3, 4, 5]
    with pytest.raises(ValueError, match="analyzed text index"):
        compile_row_predicate({"match": {"event_type": "click"}})


def test_bool_msm_and_nesting():
    q = {
        "bool": {
            "filter": [{"range": {"value": {"lt": 200}}}],
            "should": [
                {"term": {"event_type": "click"}},
                {"range": {"user": {"gte": 4}}},
                {"prefix": {"event_type": "v"}},
            ],
            "minimum_should_match": 2,
        }
    }
    # user 4: purchase, value 30 → should hits: user>=4 only (1) → out;
    # user 5: signup, value null → filter drops; user 2: view, 150 →
    # hits prefix v only (1) → out. Nobody reaches msm=2... loosen:
    assert _ids(q) == []
    q["bool"]["should"].append({"terms": {"event_type": ["purchase", "click"]}})
    # user 1: click+terms = 2 hits ✓; user 4: user>=4 + terms = 2 ✓
    assert _ids(q) == [1, 4]
    # pure should defaults to msm=1
    assert _ids({"bool": {"should": [{"term": {"event_type": "view"}},
                                     {"term": {"user": 5}}]}}) == [2, 5]


def test_predicate_fields_and_pruned_read():
    from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
    from anomaly_detection_ray.functions.rowfilter import predicate_fields
    from anomaly_detection_ray.pipelines.detector import needed_columns

    fq = {
        "bool": {
            "filter": [{"range": {"other_col": {"gte": 1}}}],
            "should": [{"exists": {"field": "maybe"}}, {"match_all": {}}],
            "must_not": [{"term": {"event_type": "x"}}],
        }
    }
    assert predicate_fields(fq) == {"other_col", "maybe", "event_type"}
    assert predicate_fields(None) == set()
    cfg = DetectorConfig(
        config_id="c", category_fields=("event_type",),
        features=(FeatureSpec("value_avg", "value", "avg"),), filter_query=fq,
    )
    # the pruned read keeps every filter column
    assert set(needed_columns(cfg)) == {"ts", "event_type", "value", "other_col", "maybe"}


def test_api_surfaces_see_filtered_stream(ray_session, tmp_path):
    """suggest/validate/preview read the SAME filtered stream as detect
    (Config.filterQuery wraps every feature query in the reference)."""
    import pyarrow.parquet as pq_

    from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
    from anomaly_detection_ray.pipelines.api import DetectorAPI

    n = 2000
    tbl = pa.table(
        {
            "ts": pa.array((1_704_067_200_000 + np.arange(n) * 60_000).astype("int64")),
            "event_type": pa.array([["a", "b"][i % 2] for i in range(n)]),
            "value": pa.array(np.linspace(1, 20, n)),
        }
    )
    src = str(tmp_path / "events.parquet")
    pq_.write_table(tbl, src)
    base = dict(config_id="fq2", interval_s=600, category_fields=("event_type",),
                features=(FeatureSpec("value_avg", "value", "avg"),))
    fq = {"term": {"event_type": "a"}}
    api = DetectorAPI(DetectorConfig(**base, filter_query=fq), src)
    prev = api.preview(max_entities=5)
    assert set(prev["event_type"]) == {"a"}
    v = api.validate()
    # only entity 'a' survives the filter into the density probe
    assert list(v["shingle_density"]) == ["('a',)"]


def test_detect_filter_query_equals_prefilter(ray_session, tmp_path):
    """detect(config.filter_query) ≡ detect over the pre-filtered
    Dataset, row for row."""
    import ray.data as rd

    from anomaly_detection_ray.config import DetectorConfig, FeatureSpec
    from anomaly_detection_ray.pipelines.detector import detect

    rng = np.random.default_rng(5)
    n = 4000
    tbl = pa.table(
        {
            "ts": pa.array((1_704_067_200_000 + np.arange(n) * 60_000).astype("int64")),
            "event_type": pa.array([["a", "b"][i % 2] for i in range(n)]),
            "value": pa.array(rng.normal(10, 2, n)),
        }
    )
    fq = {"bool": {"filter": [{"term": {"event_type": "a"}},
                              {"range": {"value": {"lt": 14}}}]}}
    cfg = dict(config_id="fq", interval_s=600, category_fields=("event_type",),
               features=(FeatureSpec("value_avg", "value", "avg"),))
    with_filter = detect(rd.from_arrow(tbl), DetectorConfig(**cfg, filter_query=fq),
                         ts_col="ts").to_pandas()
    pre = apply_filter_query(rd.from_arrow(tbl), fq)
    manual = detect(pre, DetectorConfig(**cfg), ts_col="ts").to_pandas()
    key = ["event_type", "window_end_ms"]
    with_filter = with_filter.sort_values(key).reset_index(drop=True)
    manual = manual.sort_values(key).reset_index(drop=True)
    assert with_filter.equals(manual)
    assert set(with_filter["event_type"]) == {"a"}
