"""Brute-force in-memory reference scorer — the correctness oracle.

Plays the role OpenSearch/Lucene plays for the reference plugin: the
ground truth the distributed engine must match rank-identically
(SURVEY.md §7.3). Pure Python/numpy, single process, no Ray. Exact
term frequencies, exact document frequencies, float64 BM25 with the
shared tie-break (score desc, doc_id asc) from functions/bm25.py.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from ..functions.analyzer import Analyzer
from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import tf_norm


class BruteForceIndex:
    def __init__(self, doc_ids, texts, analyzer: Analyzer):
        self.analyzer = analyzer
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        self.doc_tokens: dict[int, list[str]] = {}
        for did, text in zip(doc_ids, texts):
            did = int(did)
            toks = analyzer.tokens(text)
            self.doc_tokens[did] = toks
            tfs = Counter(toks)
            self.doc_len[did] = sum(tfs.values())
            for t, tf in tfs.items():
                self.postings[t][did] = tf
        self.n_docs = len(self.doc_len)
        self.avgdl = (sum(self.doc_len.values()) / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = sorted(set(self.analyzer.tokens(query)))
        scores: dict[int, float] = defaultdict(float)
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = float(bm25_idf(len(plist), self.n_docs))
            for did, tf in plist.items():
                scores[did] += w * float(tf_norm(tf, self.doc_len[did], self.avgdl))
        if not scores:
            return []
        dids = np.fromiter(scores.keys(), dtype=np.int64)
        vals = np.fromiter(scores.values(), dtype=np.float64)
        order = np.lexsort((dids, -vals))[:k]
        return [(int(dids[i]), float(vals[i])) for i in order]

    def conjunctive(self, query: str) -> list[int]:
        terms = sorted(set(self.analyzer.tokens(query)))
        if not terms:
            return []
        sets = [set(self.postings.get(t, {})) for t in terms]
        out = set.intersection(*sets) if sets else set()
        return sorted(out)

    def prefix(self, prefix: str) -> list[int]:
        """Docs containing any term that starts with ``prefix``."""
        out: set[int] = set()
        for t, plist in self.postings.items():
            if t.startswith(prefix):
                out.update(plist)
        return sorted(out)

    def phrase(self, query: str) -> list[int]:
        """Docs whose token stream contains the query tokens consecutively
        (naive scan — the match_phrase ground truth)."""
        terms = self.analyzer.tokens(query)
        if not terms:
            return []
        k = len(terms)
        out = []
        for did in self.conjunctive(query):
            toks = self.doc_tokens[did]
            if any(toks[i : i + k] == terms for i in range(len(toks) - k + 1)):
                out.append(did)
        return sorted(out)

    def phrase_prefix(self, query: str) -> list[int]:
        """match_phrase_prefix ground truth (no expansion cap): first
        k−1 tokens match consecutively, the k-th starts with the last
        query token."""
        terms = self.analyzer.tokens(query)
        if not terms:
            return []
        head, pre = terms[:-1], terms[-1]
        k = len(terms)
        out = []
        for did, toks in self.doc_tokens.items():
            if any(
                toks[i : i + k - 1] == head and toks[i + k - 1].startswith(pre)
                for i in range(len(toks) - k + 1)
            ):
                out.append(did)
        return sorted(out)
