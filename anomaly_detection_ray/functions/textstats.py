"""Text analysis: token stats, quality scoring, language-ID heuristic.

Every function here has an exact SQL twin over the simple analyzer
(see ``analyzer.SQL_SIMPLE_TOKENS``) so the driver's DuckDB oracle can
verify it value-for-value. Vectorized per batch; stopword profiles are
module constants (loaded once per worker import, SURVEY.md §2.C7).
"""

from __future__ import annotations

import numpy as np

from .analyzer import Analyzer

# Tiny per-language stopword profiles for the n-gram/stopword-hit
# language-ID heuristic. Deterministic tie-break = this ordering.
LANG_PROFILES: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den")),
    ("fr", ("le", "la", "les", "et", "est", "un", "une", "des", "pour", "que")),
    ("es", ("el", "la", "los", "las", "y", "es", "un", "una", "por", "para")),
    ("zh", ("de", "shi", "bu", "le", "wo", "ni", "ta", "men", "zai", "you")),
]

QUALITY_STOPWORDS = frozenset(LANG_PROFILES[0][1])

_simple = Analyzer("simple")


def token_stats(texts: list[str]) -> dict[str, np.ndarray]:
    """n_tokens, n_distinct, mean token length, stopword ratio — the
    quality-scoring basics (length/stopword heuristics à la C4/Gopher
    quality filters)."""
    n = len(texts)
    out = {
        "n_tokens": np.zeros(n, dtype=np.int64),
        "n_distinct": np.zeros(n, dtype=np.int64),
        "mean_token_len": np.zeros(n, dtype=np.float64),
        "stopword_ratio": np.zeros(n, dtype=np.float64),
    }
    for i, t in enumerate(texts):
        toks = _simple.tokens(t or "")
        out["n_tokens"][i] = len(toks)
        out["n_distinct"][i] = len(set(toks))
        if toks:
            out["mean_token_len"][i] = sum(map(len, toks)) / len(toks)
            out["stopword_ratio"][i] = sum(t in QUALITY_STOPWORDS for t in toks) / len(toks)
    return out


def lang_id(texts: list[str]) -> list[str]:
    """argmax of per-language stopword hit counts (token multiset);
    ties → first profile in LANG_PROFILES order; zero hits → 'und'."""
    sets = [(lang, frozenset(words)) for lang, words in LANG_PROFILES]
    out = []
    for t in texts:
        toks = _simple.tokens(t or "")
        best_lang, best_hits = "und", 0
        for lang, words in sets:
            hits = sum(tok in words for tok in toks)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        out.append(best_lang)
    return out
