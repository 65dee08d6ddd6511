"""Multi-term dictionary expansion: wildcard, regexp, fuzzy.

Lucene's MultiTermQuery family (WildcardQuery, RegexpQuery, FuzzyQuery)
rewrites a pattern into the set of matching dictionary terms and unions
their postings. The reference plugin exposes this whole surface through
the arbitrary ``filter_query`` it forwards to OpenSearch
(`/root/reference/src/main/java/org/opensearch/timeseries/model/Config.java:99`
ships the user's query straight into the search request). Rebuilt here
over the term-SORTED Arrow dictionary the index already stores:

- wildcard/regexp: bound the scan with the pattern's literal prefix
  (binary search over the sorted dictionary — Lucene walks the FST the
  same way), then ONE vectorized RE2 match over the bounded Arrow slice
  (``pc.match_substring_regex``), no per-term Python loop.
- fuzzy: Lucene FuzzyQuery semantics — AUTO fuzziness by term length,
  ``prefix_length`` sharing, optional transpositions (OSA), closest-
  first ``max_expansions`` — via a Levenshtein DP vectorized ACROSS
  candidate terms: one numpy update per candidate character column over
  the whole (n_candidates × query_len) distance matrix, instead of one
  DP per term. Candidates are pre-filtered by shared prefix (dictionary
  range) and |len - query_len| ≤ max_edits, so the DP only ever sees a
  sliver of the vocabulary.

Scale note (10^12-doc corpora): the dictionary is the SMALL side — it
lives in Arrow buffers per serving actor and is already range-sharded
by the term sort. Prefix-bounded scans are sublinear whenever the
pattern has a literal head; a leading-wildcard pattern degrades to one
vectorized pass over the vocabulary (exactly Lucene's documented
behavior and warning for leading wildcards).
"""

from __future__ import annotations

import re

import numpy as np

_WILDCARD_SPECIALS = "*?"
# regex metacharacters that end a literal prefix
_REGEX_META = set(".^$*+?{}[]()|\\")


def wildcard_to_regex(pattern: str) -> str:
    """Lucene WildcardQuery pattern → anchored RE2 regex.

    ``*`` matches any run (including empty), ``?`` exactly one char;
    everything else is literal (Lucene's ``\\`` escape is honored).
    """
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "\\" and i + 1 < n:
            out.append(re.escape(pattern[i + 1]))
            i += 1
        else:
            out.append(re.escape(c))
        i += 1
    return "^(?:" + "".join(out) + ")$"


def wildcard_prefix(pattern: str) -> str:
    """Literal head of a wildcard pattern (scan lower bound)."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c in _WILDCARD_SPECIALS:
            break
        if c == "\\" and i + 1 < n:
            out.append(pattern[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def regexp_prefix(pattern: str) -> str:
    """Literal head of a regex usable as a dictionary scan bound.

    Conservative: only leading plain characters count, and any top-level
    alternation (``|``) disables the prefix entirely (the other branch
    may start differently). A wrong-but-safe empty prefix just means a
    full-vocabulary vectorized scan.
    """
    if "|" in pattern:
        return ""
    out = []
    for i, c in enumerate(pattern):
        if c in _REGEX_META:
            # a quantifier after the first literal makes IT optional too
            if c in "*?{" and out:
                out.pop()
            break
        out.append(c)
    return "".join(out)


def auto_fuzziness(term: str) -> int:
    """Lucene/OpenSearch ``fuzziness=AUTO``: 0 edits below 3 chars,
    1 for 3-5, 2 for 6+ (AUTO:3,6)."""
    n = len(term)
    if n < 3:
        return 0
    if n < 6:
        return 1
    return 2


def levenshtein_batch(
    query: str, terms: list[str], transpositions: bool = False
) -> np.ndarray:
    """Edit distance from ``query`` to EVERY term, vectorized across terms.

    Standard Wagner-Fischer over the query axis with the candidate axis
    as a numpy vector: for each character column j of the candidates we
    update all n distance rows at once. ``transpositions=True`` adds the
    OSA (restricted Damerau) adjacent-swap case — the variant Lucene's
    transposing automaton accepts. O(maxlen × len(query)) numpy ops
    total, independent of candidate count.
    """
    n = len(terms)
    m = len(query)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    if m == 0:
        return lens.astype(np.int32)
    L = int(lens.max())
    result = np.empty(n, dtype=np.int32)
    result[lens == 0] = m
    if L == 0:
        return result
    # (n, L) zero-padded char-code matrix, built without a per-term loop
    joined = "".join(terms)
    codes = np.fromiter(map(ord, joined), dtype=np.int32, count=len(joined))
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = np.arange(len(joined), dtype=np.int64) - np.repeat(offs[:-1], lens)
    mat = np.zeros((n, L), dtype=np.int32)
    mat[rows, cols] = codes
    q = np.fromiter(map(ord, query), dtype=np.int32, count=m)

    prev = np.broadcast_to(np.arange(m + 1, dtype=np.int32), (n, m + 1)).copy()
    prevprev: np.ndarray | None = None
    prev_char: np.ndarray | None = None
    for j in range(1, L + 1):
        cj = mat[:, j - 1]
        sub = (cj[:, None] != q[None, :]).astype(np.int32)
        cur = np.empty_like(prev)
        cur[:, 0] = j
        for i in range(1, m + 1):
            cur[:, i] = np.minimum(
                np.minimum(cur[:, i - 1] + 1, prev[:, i] + 1),
                prev[:, i - 1] + sub[:, i - 1],
            )
            if transpositions and j > 1 and i > 1:
                swap = (cj == q[i - 2]) & (prev_char == q[i - 1])
                np.minimum(
                    cur[:, i],
                    np.where(swap, prevprev[:, i - 2] + 1, cur[:, i]),
                    out=cur[:, i],
                )
        done = lens == j
        if done.any():
            result[done] = cur[done, m]
        prevprev, prev, prev_char = prev, cur, cj
    return result


def bounded_distances_arrow(
    query: str, arr, max_edits: int, transpositions: bool = False
) -> np.ndarray:
    """Edit distances CLIPPED at ``max_edits + 1``, computed straight off
    the Arrow string buffers (no Python string materialization) with an
    alive-set bounded DP: after each candidate character column, rows
    whose running row-minimum already exceeds ``max_edits`` are dropped
    from the computation (edit distance is non-decreasing along the DP),
    so with the Lucene-typical max_edits ≤ 2 almost every vocabulary
    term dies within the first few columns. This is the serving-path
    fuzzy scan; the exact ``levenshtein_batch`` stays as its test twin.

    Falls back to the exact path for non-ASCII data (where UTF-8 bytes
    ≠ characters)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    cap = np.int32(max_edits + 1)
    ascii_ok = query.isascii() and (
        pc.sum(pc.utf8_length(a)).as_py() == pc.sum(pc.binary_length(a)).as_py()
    )
    if not ascii_ok:
        d = levenshtein_batch(query, a.to_pylist(), transpositions=transpositions)
        return np.minimum(d, cap)
    bufs = a.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[a.offset : a.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = np.diff(off)
    m = len(query)
    result = np.full(n, cap, dtype=np.int32)
    result[lens == 0] = min(m, int(cap))
    L = int(lens.max()) if n else 0
    if L == 0 or m == 0:
        if m == 0:
            return np.minimum(lens, cap).astype(np.int32)
        return result
    # zero-padded (n, L) char matrix directly from the UTF-8 data buffer
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)))[:-1], lens
    )
    mat = np.zeros((n, L), dtype=np.int32)
    mat[rows, cols] = data[off[0] : off[-1]].astype(np.int32)
    q = np.frombuffer(query.encode(), dtype=np.uint8).astype(np.int32)

    idx = np.arange(n)  # alive-row → original-row map
    prev = np.broadcast_to(np.arange(m + 1, dtype=np.int32), (n, m + 1)).copy()
    prevprev: np.ndarray | None = None
    prev_char: np.ndarray | None = None
    alens = lens
    for j in range(1, L + 1):
        if idx.size == 0:
            break
        cj = mat[idx, j - 1]
        sub = (cj[:, None] != q[None, :]).astype(np.int32)
        cur = np.empty((idx.size, m + 1), dtype=np.int32)
        cur[:, 0] = j
        for i in range(1, m + 1):
            cur[:, i] = np.minimum(
                np.minimum(cur[:, i - 1] + 1, prev[:, i] + 1),
                prev[:, i - 1] + sub[:, i - 1],
            )
            if transpositions and j > 1 and i > 1:
                swap = (cj == q[i - 2]) & (prev_char == q[i - 1])
                np.minimum(
                    cur[:, i],
                    np.where(swap, prevprev[:, i - 2] + 1, cur[:, i]),
                    out=cur[:, i],
                )
        done = alens == j
        if done.any():
            result[idx[done]] = np.minimum(cur[done, m], cap)
        # prune: the DP row minimum never decreases, so rows already past
        # the budget can never come back under it
        keep = (~done) & (cur.min(axis=1) <= max_edits)
        if not keep.all():
            idx, alens, cur = idx[keep], alens[keep], cur[keep]
            prev = prev[keep]
            if transpositions:
                cj = cj[keep]
        prevprev, prev, prev_char = prev, cur, cj
    return result


def fuzzy_select(
    query: str,
    terms: list[str],
    max_edits: int,
    transpositions: bool = False,
    max_expansions: int | None = None,
) -> list[str]:
    """Terms within ``max_edits`` of ``query``, closest-first then term
    order (Lucene FuzzyQuery keeps the ``max_expansions`` highest-boost
    = smallest-distance expansions)."""
    if not terms:
        return []
    dist = levenshtein_batch(query, terms, transpositions=transpositions)
    return _rank_matches(dist, max_edits, terms, max_expansions)


def _rank_matches(dist, max_edits, terms, max_expansions):
    sel = np.flatnonzero(dist <= max_edits)
    ranked = sorted(sel.tolist(), key=lambda i: (int(dist[i]), terms[i]))
    if max_expansions is not None:
        ranked = ranked[:max_expansions]
    return [terms[i] for i in ranked]
