"""Multi-field search: per-field indexes + multi_match.

Lucene models each field as its own term space with its own statistics
(df, avgdl) inside a segment; OpenSearch's ``multi_match`` then scores
a query against several fields and combines per-field BM25 scores —
``best_fields`` takes the max (dis_max), ``most_fields`` sums. The
input_hint's corpus shape (``repo, path, content``) makes this a
first-class need: "find this identifier in file PATHS or file BODIES".

Rebuilt as composition, not surgery: one standard index per field
(same doc ids, each with its own exact global stats — precisely
Lucene's per-field statistics), a :class:`MultiFieldEngine` that merges
per-field score maps vectorized. Build cost is proportional to each
field's text (path/repo fields are tiny next to content); every
single-field capability (phrase, prefix, lifecycle…) keeps working on
the per-field engines unchanged.

Reference tie-in: the plugin's own result/config searches routinely
query multiple fields (`ParseUtils.java:308-431` builds bool queries
over field sets); the engine side of that is this module.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .build import build_index
from .query import QueryEngine, _topk_with_ties

MULTI_MANIFEST = "multifield.json"


def build_multifield_index(
    input_files: list[str],
    out_dir: str,
    fields: list[str],
    *,
    id_col: str = "doc_id",
    mode: str = "code",
    keep_cols=("repo", "path", "commit", "lang"),
    **kwargs,
) -> dict:
    """One index per field under ``out_dir/field-<name>``; metadata
    keep_cols ride only the FIRST field's docmap (they are per-doc, not
    per-field)."""
    os.makedirs(out_dir, exist_ok=True)
    sub = {}
    for i, f in enumerate(fields):
        sub[f] = build_index(
            input_files,
            os.path.join(out_dir, f"field-{f}"),
            text_col=f,
            id_col=id_col,
            mode=mode,
            keep_cols=keep_cols if i == 0 else (),
            **kwargs,
        )
    manifest = {
        "format": "anomaly_detection_ray.multifield/v1",
        "fields": list(fields),
        "n_docs": sub[fields[0]]["n_docs"],
        "analyzer_mode": mode,
    }
    path = os.path.join(out_dir, MULTI_MANIFEST)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, path)
    return manifest


class MultiFieldEngine:
    """Serves ``multi_match`` over the per-field indexes. Field engines
    load lazily; ``engine(field)`` exposes them for every single-field
    operation (phrase on content, prefix on path, …)."""

    def __init__(self, index_dir: str, **engine_kwargs):
        with open(os.path.join(index_dir, MULTI_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.index_dir = index_dir
        self.fields: list[str] = self.manifest["fields"]
        self._engines: dict[str, QueryEngine] = {}
        self._engine_kwargs = engine_kwargs

    def engine(self, field: str) -> QueryEngine:
        if field not in self.fields:
            raise KeyError(f"unknown field {field!r} (have {self.fields})")
        if field not in self._engines:
            self._engines[field] = QueryEngine(
                os.path.join(self.index_dir, f"field-{field}"), **self._engine_kwargs
            )
        return self._engines[field]

    def multi_match(
        self,
        query: str,
        k: int = 10,
        fields: list[str] | None = None,
        match_type: str = "best_fields",
        boosts: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k over combined per-field BM25: ``best_fields`` = max of
        the (boosted) field scores per doc (Lucene dis_max with
        tie_breaker 0), ``most_fields`` = their sum. Boost syntax
        mirrors ``fields: ["path^3", ...]`` via the ``boosts`` dict."""
        if match_type not in ("best_fields", "most_fields", "cross_fields"):
            raise ValueError(f"unknown multi_match type {match_type!r}")
        fields = list(fields) if fields is not None else list(self.fields)
        boosts = boosts or {}
        if match_type == "cross_fields":
            return self._cross_fields(query, k, fields, boosts)
        per_field = []
        for f in fields:
            docs, scores = self.engine(f).bm25_scores(query)
            if docs.size:
                per_field.append((docs, scores * float(boosts.get(f, 1.0))))
        if not per_field:
            return []
        all_docs = np.concatenate([d for d, _ in per_field])
        all_scores = np.concatenate([s for _, s in per_field])
        uniq, inv = np.unique(all_docs, return_inverse=True)
        if match_type == "most_fields":
            combined = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(combined, inv, all_scores)
        else:
            combined = np.full(uniq.size, -np.inf, dtype=np.float64)
            np.maximum.at(combined, inv, all_scores)
        return _topk_with_ties(uniq, combined, k)

    def _cross_fields(self, query: str, k: int, fields: list[str],
                      boosts: dict[str, float]) -> list[tuple[int, float]]:
        """Term-centric blending (Lucene BlendedTermQuery's shape): the
        fields act as ONE combined field per term — each term takes a
        BLENDED df (the max across fields, Lucene's blend) and its
        per-doc contribution is the best boosted field occurrence scored
        with that blended idf; a doc's score sums its terms. Fixes
        best/most_fields' failure on data split across fields ("will
        smith" with first/last names in different columns)."""
        from ..functions.bm25 import idf as bm25_idf
        from ..functions.bm25 import tf_norm

        engines = [self.engine(f) for f in fields]
        terms = sorted({t for e in engines for t in e.query_terms(query)})
        n_docs = max(e.n_docs for e in engines)
        acc_docs, acc_scores = [], []
        for t in terms:
            dfs = [e.df(t) for e in engines]
            blended_idf = float(bm25_idf(max(dfs), n_docs))
            if max(dfs) == 0:
                continue
            docs_parts, val_parts = [], []
            for e, f in zip(engines, fields):
                docs_t, tfs_t, dls_t = e.term_arrays(t)
                if docs_t.size == 0:
                    continue
                docs_parts.append(docs_t)
                val_parts.append(
                    float(boosts.get(f, 1.0)) * tf_norm(tfs_t, dls_t, e.avgdl)
                )
            docs = np.concatenate(docs_parts)
            vals = np.concatenate(val_parts)
            uniq, inv = np.unique(docs, return_inverse=True)
            best = np.full(uniq.size, -np.inf)
            np.maximum.at(best, inv, vals)
            acc_docs.append(uniq)
            acc_scores.append(blended_idf * best)
        if not acc_docs:
            return []
        docs = np.concatenate(acc_docs)
        scores = np.concatenate(acc_scores)
        uniq, inv = np.unique(docs, return_inverse=True)
        total = np.zeros(uniq.size)
        np.add.at(total, inv, scores)
        return _topk_with_ties(uniq, total, k)

    def query_string_docs(self, q: str, fields: list[str] | None = None,
                          default_operator: str = "or") -> np.ndarray:
        """Multi-field ``query_string`` in FILTER context (Lucene's
        MultiFieldQueryParser rewrite): every unscoped text leaf expands
        to the union of its per-field evaluations — ``"a AND b"`` over
        fields [f1, f2] matches docs where a appears in ANY field and b
        appears in ANY field — while ``field:leaf`` scoping pins a leaf
        to one field; the boolean structure (AND/OR/NOT, parens,
        precedence) is preserved across the expansion. Phrases,
        prefixes, wildcards and fuzzy leaves expand the same way (each
        per-field engine evaluates its own positional/dictionary
        machinery). Scoring context is served by :meth:`multi_match`;
        this is the filter-context evaluator the DSL embeds."""
        from .querystring import parse_query_string

        fields = list(fields) if fields is not None else list(self.fields)
        sentinel = "\x00default"
        ast = parse_query_string(q, sentinel, default_operator=default_operator,
                                 text_fields=frozenset(self.fields))
        return self._eval_multi(ast, fields, sentinel)

    _QS_LEAF_KINDS = ("match", "term", "prefix", "wildcard", "fuzzy",
                      "match_phrase", "match_bool_prefix")

    def _eval_multi(self, node: dict, fields: list[str], sentinel: str) -> np.ndarray:
        kind, body = next(iter(node.items()))
        if kind == "bool":
            result = None
            for clause in body.get("must", ()):
                docs = self._eval_multi(clause, fields, sentinel)
                result = docs if result is None else np.intersect1d(
                    result, docs, assume_unique=True)
                if result.size == 0:
                    break
            shoulds = body.get("should", ())
            if shoulds and (result is None or result.size):
                per = [self._eval_multi(c, fields, sentinel) for c in shoulds]
                matched = np.unique(np.concatenate(per)) if per else \
                    np.empty(0, dtype=np.int64)
                result = matched if result is None else np.intersect1d(
                    result, matched, assume_unique=True)
            if result is None:
                result = self._all_docs(fields)
            for clause in body.get("must_not", ()):
                result = np.setdiff1d(
                    result, self._eval_multi(clause, fields, sentinel),
                    assume_unique=True)
                if result.size == 0:
                    break
            return result
        if kind == "ids":
            values = [int(v) for v in body["values"]]
            if not values:
                return np.empty(0, dtype=np.int64)
            alld = self._all_docs(fields)
            return alld[np.isin(alld, np.asarray(values, dtype=np.int64))]
        if kind == "exists":
            f = body["field"]
            return self._all_docs([f] if f in self.fields else fields) \
                if (f in self.fields or f == sentinel) else np.empty(0, np.int64)
        if kind in self._QS_LEAF_KINDS:
            ((f, spec),) = body.items()
            targets = fields if f == sentinel else [f]
            parts = []
            for t in targets:
                eng = self.engine(t)
                docs = eng.execute_filter({kind: {t: spec}})
                if docs.size:
                    parts.append(docs)
            if not parts:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate(parts))
        raise ValueError(f"multi-field query_string does not support {kind!r}")

    def _all_docs(self, fields: list[str]) -> np.ndarray:
        # every per-field index covers the same documents
        return self.engine(fields[0]).execute_filter({"match_all": {}})

    def match_any_docs(self, query: str, fields: list[str] | None = None) -> np.ndarray:
        """Filter-context multi_match (operator=or): docs where ANY
        query term matches ANY of the fields."""
        fields = list(fields) if fields is not None else list(self.fields)
        parts = []
        for f in fields:
            eng = self.engine(f)
            parts.append(eng.union_docs(eng.query_terms(query)))
        cat = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        return np.unique(cat).astype(np.int64)
