"""Unit tests for pure functions: analyzer, varint, hashing, bm25."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_ray.functions.analyzer import Analyzer
from anomaly_detection_ray.functions.bm25 import idf, tf_norm, topk_order
from anomaly_detection_ray.functions.hashing import (
    entity_model_id,
    hash_strings,
    murmur3_x64_128,
    normalize_entity,
    sha256_hex,
)
from anomaly_detection_ray.functions.varint import (
    decode_postings,
    decode_varint,
    delta_decode,
    delta_encode,
    encode_postings,
    encode_varint,
)


# ---------- analyzer (golden cases per FIXTURES.md F5 analyzer_cases) ----------

SIMPLE_CASES = [
    ("Hello, World!", ["hello", "world"]),
    ("foo_bar baz99", ["foo", "bar", "baz99"]),
    ("", []),
    ("...", []),
    ("MiXeD CaSe", ["mixed", "case"]),
]

CODE_CASES = [
    ("fooBar", ["foo", "bar"]),
    ("foo_bar", ["foo", "bar"]),
    ("HTTPServer", ["http", "server"]),
    ("parseHTTPResponse", ["parse", "http", "response"]),
    ("utf8Decode", ["utf8", "decode"]),
    ("snake_case_longer_name", ["snake", "case", "longer", "name"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("value2", ["value2"]),
    ("__init__", ["init"]),
    ("a.b(c)", ["a", "b", "c"]),
]


@pytest.mark.parametrize("text,expected", SIMPLE_CASES)
def test_simple_analyzer(text, expected):
    assert Analyzer("simple").tokens(text) == expected


@pytest.mark.parametrize("text,expected", CODE_CASES)
def test_code_analyzer(text, expected):
    assert Analyzer("code").tokens(text) == expected


def test_stopword_filter():
    a = Analyzer("code", stopwords={"import", "return"})
    assert a.tokens("import foo return bar") == ["foo", "bar"]


def test_simple_matches_duckdb_regexp():
    """The simple analyzer must equal its SQL twin exactly."""
    import duckdb

    texts = ["Hello, World!", "foo_bar baz99", "MiXeD CaSe 123abc", "a--b__c"]
    con = duckdb.connect()
    for t in texts:
        (sql_toks,) = con.execute(
            "select regexp_extract_all(lower(?), '[a-z0-9]+')", [t]
        ).fetchone()
        assert Analyzer("simple").tokens(t) == sql_toks


# ---------- varint / delta ----------

def test_varint_roundtrip_golden():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63], dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(vals)), vals)
    # LEB128 golden bytes
    assert encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varint(np.array([1], dtype=np.uint64)) == b"\x01"
    assert encode_varint(np.array([0], dtype=np.uint64)) == b"\x00"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 100, 10_000_000], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 5], dtype=np.uint64))


def test_postings_roundtrip():
    ids = np.array([1, 5, 6, 900], dtype=np.uint64)
    tfs = np.array([2, 1, 7, 3], dtype=np.uint64)
    db, tb = encode_postings(ids, tfs)
    rid, rtf = decode_postings(db, tb)
    assert np.array_equal(rid, ids) and np.array_equal(rtf, tfs)


# ---------- hashing ----------

def test_murmur3_golden():
    # Public test vectors for murmur3 x64 128, seed 0 (h1, h2 as u64).
    assert murmur3_x64_128(b"") == (0, 0)
    assert murmur3_x64_128(b"hello") == (0xCBD8A7B341BD9B02, 0x5B1E906A48AE1D19)
    assert murmur3_x64_128(b"The quick brown fox jumps over the lazy dog") == (
        0xE34BBC7BBC071B6C,
        0x7A433CA9C49A9347,
    )


def test_entity_model_id_shape():
    mid = entity_model_id("det1", {"host": "h1", "process": "p2"})
    assert mid.startswith("det1_entity_")
    assert normalize_entity({"b": "2", "a": "1"}) == "a=1,b=2"
    # deterministic
    assert mid == entity_model_id("det1", {"process": "p2", "host": "h1"})


def test_hash_strings_deterministic():
    h1 = hash_strings(["foo", "bar", "foo"])
    assert h1[0] == h1[2] and h1[0] != h1[1]
    assert h1.dtype == np.uint64


def test_sha256():
    assert sha256_hex("abc") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )


# ---------- bm25 ----------

def test_bm25_math():
    # single term, single doc at avgdl: tf_norm(1) = (1*(k1+1))/(1+k1) = 1
    assert tf_norm(1, 10, 10.0) == pytest.approx(1.0)
    assert float(idf(1, 2)) == pytest.approx(np.log(1 + (2 - 1 + 0.5) / 1.5))
    scores = np.array([1.0, 2.0, 2.0, 0.5])
    dids = np.array([9, 7, 3, 1])
    order = topk_order(scores, dids, 3)
    assert list(dids[order]) == [3, 7, 9]  # tie → lower doc_id first


def test_calendar_floor_matches_duckdb_date_trunc():
    """Calendar-interval window floors (week/month/quarter/year) agree
    with DuckDB date_trunc across five decades of random timestamps —
    the parity the calendar_week_agg oracle twin rides on (weeks start
    Monday; ends are the next calendar boundary)."""
    import duckdb
    import numpy as np

    from anomaly_detection_ray.stages.window import calendar_floor_ms

    rng = np.random.default_rng(7)
    ms = rng.integers(0, 2_000_000_000_000, 200)  # 1970..2033
    con = duckdb.connect()
    for unit, trunc in [("1w", "week"), ("1M", "month"),
                        ("1q", "quarter"), ("1y", "year")]:
        starts, ends = calendar_floor_ms(ms, unit)
        exp = [con.execute(
            f"SELECT CAST(epoch_ms(date_trunc('{trunc}', "
            f"make_timestamp({int(m)} * 1000))) AS BIGINT)").fetchone()[0]
            for m in ms]
        assert list(starts) == exp, unit
        assert (ends > starts).all()
        # each end is the NEXT bucket's start
        s2, _ = calendar_floor_ms(ends, unit)
        assert (s2 == ends).all()
    with pytest.raises(ValueError, match="calendar_interval"):
        calendar_floor_ms(ms, "1fortnight")
