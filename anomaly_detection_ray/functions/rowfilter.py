"""Detector ``filter_query`` → Arrow dataset expression.

The reference wraps EVERY feature query in the user's ``filterQuery``
(`/root/reference/src/main/java/org/opensearch/timeseries/model/Config.java:99`;
``ParseUtils.generateInternalFeatureQuery`` builds
``bool(filter_query ∧ time range)`` around each aggregation,
`ParseUtils.java:314-331`). On the events table — a plain Parquet
table, not an inverted index — the same JSON DSL compiles to ONE
``pyarrow.dataset`` expression evaluated per batch (and pushable into
a parquet scan): no per-row Python, no driver materialization.

Supported kinds mirror the metadata half of ``index/queryast.py``
(term / terms / range / exists / prefix / wildcard / regexp / bool
with minimum_should_match); ``match``/``match_phrase`` need an
analyzed text index and raise here.
"""

from __future__ import annotations

import pyarrow.compute as pc


def predicate_fields(query: dict | None) -> set[str]:
    """Every column a filter_query touches (for read-time projection)."""
    out: set[str] = set()

    def walk(q):
        if not q:
            return
        kind, body = next(iter(q.items()))
        if kind == "match_all":
            return
        if kind == "bool":
            for key in ("must", "filter", "should", "must_not"):
                for clause in body.get(key, ()):
                    walk(clause)
            return
        if kind == "exists":
            out.add(body["field"])
            return
        ((field, _),) = body.items()
        out.add(field)

    walk(query)
    return out


def compile_row_predicate(query: dict | None):
    """query AST → pyarrow Expression (None/match_all → None)."""
    if not query or "match_all" in query:
        return None
    return _compile(query)


def _compile(query: dict):
    kind, body = next(iter(query.items()))
    if kind == "match_all":
        return pc.scalar(True)
    if kind == "term":
        ((field, value),) = body.items()
        return pc.equal(pc.field(field), value)
    if kind == "terms":
        ((field, values),) = body.items()
        return pc.field(field).isin(list(values))
    if kind == "range":
        ((field, conds),) = body.items()
        ops = {"gte": pc.greater_equal, "gt": pc.greater,
               "lte": pc.less_equal, "lt": pc.less}
        expr = None
        for op, v in conds.items():
            e = ops[op](pc.field(field), v)
            expr = e if expr is None else (expr & e)
        return expr
    if kind == "exists":
        return pc.field(body["field"]).is_valid()
    if kind == "prefix":
        ((field, value),) = body.items()
        return pc.starts_with(pc.field(field), pattern=str(value))
    if kind == "wildcard":
        ((field, pattern),) = body.items()
        from ..index.termscan import wildcard_to_regex

        return pc.match_substring_regex(pc.field(field), wildcard_to_regex(str(pattern)))
    if kind == "regexp":
        ((field, pattern),) = body.items()
        return pc.match_substring_regex(pc.field(field), f"^(?:{pattern})$")
    if kind == "bool":
        return _compile_bool(body)
    raise ValueError(
        f"filter_query kind {kind!r} needs an analyzed text index — "
        "unsupported on a plain events table"
    )


def _compile_bool(body: dict):
    import pyarrow as pa

    expr = None
    for clause in list(body.get("must", ())) + list(body.get("filter", ())):
        e = _compile(clause)
        expr = e if expr is None else (expr & e)
    shoulds = list(body.get("should", ()))
    if shoulds:
        msm = body.get("minimum_should_match")
        if msm is None:
            msm = 1 if expr is None else 0
        msm = int(msm)
        if msm == 1:
            any_expr = None
            for clause in shoulds:
                e = _compile(clause)
                any_expr = e if any_expr is None else (any_expr | e)
            expr = any_expr if expr is None else (expr & any_expr)
        elif msm > 1:
            # count of matching should clauses ≥ msm, as an int sum
            total = None
            for clause in shoulds:
                e = pc.coalesce(_compile(clause), pa.scalar(False)).cast(pa.int32())
                total = e if total is None else pc.add(total, e)
            ge = pc.greater_equal(total, msm)
            expr = ge if expr is None else (expr & ge)
    for clause in body.get("must_not", ()):
        e = pc.coalesce(_compile(clause), False)
        ne = ~e
        expr = ne if expr is None else (expr & ne)
    if expr is None:
        expr = pc.scalar(True)
    return expr


def apply_filter_query(ds, query: dict | None):
    """Apply a compiled filter_query to a Ray Dataset (one vectorized
    Arrow filter per batch; a no-op for match_all)."""
    expr = compile_row_predicate(query)
    if expr is None:
        return ds

    def filt(b):
        return b.filter(expr)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
