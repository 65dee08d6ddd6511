"""The ray-job CLI: build → query → delete → extend → compact, end to end."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from anomaly_detection_ray.cli import main


def _run(capsys, *argv) -> dict:
    assert main(list(argv)) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_lifecycle_end_to_end(ray_session, tiny_corpus, tmp_path_factory, capsys):
    base = tmp_path_factory.mktemp("cli")
    idx = str(base / "idx")

    out = _run(capsys, "build", "--input", tiny_corpus["dir"], "--index", idx,
               "--mode", "code", "--slices", "2", "--num-partitions", "4")
    assert out["n_docs"] == 200 and out["slices"] == 2

    out = _run(capsys, "stats", "--index", idx)
    assert out["n_docs"] == 200 and out["n_deleted"] == 0

    out = _run(capsys, "query", "--index", idx, "--bm25", "merge sort", "--k", "5")
    assert len(out["hits"]) == 5
    top = out["hits"][0]["doc_id"]

    out = _run(capsys, "query", "--index", idx, "--dsl",
               json.dumps({"term": {"lang": "python"}}))
    assert out["n_hits"] > 0

    out = _run(capsys, "query", "--index", idx, "--search", json.dumps({
        "query": {"match": {"content": "merge sort"}}, "size": 3,
        "aggs": {"langs": {"terms": {"field": "lang", "size": 2}}},
    }))
    assert len(out["hits"]["hits"]) == 3 and out["hits"]["total"]["value"] > 0
    assert out["hits"]["hits"][0]["_id"] == top
    assert len(out["aggregations"]["langs"]["buckets"]) == 2

    out = _run(capsys, "delete", "--index", idx, "--ids", str(top))
    assert out["n_deleted_total"] == 1
    out = _run(capsys, "query", "--index", idx, "--bm25", "merge sort", "--k", "5")
    assert top not in [h["doc_id"] for h in out["hits"]]

    add = pa.table({"doc_id": pa.array([9001], pa.int64()),
                    "content": pa.array(["zzclidoc fresh content"])})
    add_src = str(base / "add.parquet")
    pq.write_table(add, add_src)
    out = _run(capsys, "extend", "--index", idx, "--files", add_src)
    assert out["slices"] == 3

    out = _run(capsys, "delete", "--index", idx, "--query",
               json.dumps({"term": {"content": "zzclidoc"}}))
    assert out["requested"] == 1

    out = _run(capsys, "compact", "--index", idx, "--gc")
    assert out["merged"] and out["slices"] == 1 and out["n_docs"] == 199

    out = _run(capsys, "stats", "--index", idx)
    assert out["n_docs"] == 199 and out["n_deleted"] == 0 and out["n_slices"] == 1

    # tiered compact under the cap is a no-op
    out = _run(capsys, "compact", "--index", idx, "--max-slices", "4")
    assert out["merged"] is False
