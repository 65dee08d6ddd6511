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


# BPE-style pre-tokenizer (the GPT-2 split pattern, ASCII-adapted and
# with the trailing-space lookahead dropped so the IDENTICAL pattern
# runs under both Python re and DuckDB's RE2 — verified match-for-match
# on the sf corpora). Counting these splits is the standard cheap
# "how many tokens will the tokenizer emit" budget estimate: each split
# piece becomes >= 1 BPE token, and for ASCII English prose the piece
# count tracks real BPE counts closely.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

import re as _re

_bpe_split = _re.compile(BPE_SPLIT_PATTERN)


def bpe_token_counts(texts: list[str]) -> np.ndarray:
    """Per-text count of BPE pre-tokenizer pieces (token-budget
    estimator). Exact SQL twin: ``len(regexp_extract_all(text,
    BPE_SPLIT_PATTERN))``."""
    return np.fromiter(
        (len(_bpe_split.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
    )


# Gopher-style quality-filter rule bounds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", appendix A1.1 — public heuristics),
# adapted to the simple tokenizer so every rule has an exact SQL twin.
GOPHER_BOUNDS = dict(
    min_tokens=50,
    max_tokens=100_000,
    min_mean_len=3.0,
    max_mean_len=10.0,
    min_distinct_ratio=0.3,     # repetition filter: distinct/total tokens
    max_symbol_ratio=0.25,      # non-alphanumeric, non-whitespace chars
    min_stopword_hits=2,        # distinct english stopwords present
)

_SYMBOL_RE = None


def quality_flags(texts: list[str], **overrides) -> dict[str, np.ndarray]:
    """Gopher-rule quality filter: per-doc metrics + the keep decision.
    Columns: n_tokens, mean_token_len, distinct_ratio, stopword_hits,
    symbol_ratio, keep. Every metric/rule is SQL-expressible (oracle in
    ``__ray_entry__._quality_filter_sql``)."""
    import re

    global _SYMBOL_RE
    if _SYMBOL_RE is None:
        _SYMBOL_RE = re.compile(r"[^A-Za-z0-9\s]")
    b = dict(GOPHER_BOUNDS, **overrides)
    n = len(texts)
    out = {
        "n_tokens": np.zeros(n, dtype=np.int64),
        "mean_token_len": np.zeros(n, dtype=np.float64),
        "distinct_ratio": np.zeros(n, dtype=np.float64),
        "stopword_hits": np.zeros(n, dtype=np.int64),
        "symbol_ratio": np.zeros(n, dtype=np.float64),
    }
    for i, t in enumerate(texts):
        t = t or ""
        toks = _simple.tokens(t)
        nt = len(toks)
        out["n_tokens"][i] = nt
        if nt:
            out["mean_token_len"][i] = sum(map(len, toks)) / nt
            distinct = set(toks)
            out["distinct_ratio"][i] = len(distinct) / nt
            out["stopword_hits"][i] = len(distinct & QUALITY_STOPWORDS)
        if t:
            out["symbol_ratio"][i] = len(_SYMBOL_RE.findall(t)) / len(t)
    out["keep"] = (
        (out["n_tokens"] >= b["min_tokens"])
        & (out["n_tokens"] <= b["max_tokens"])
        & (out["mean_token_len"] >= b["min_mean_len"])
        & (out["mean_token_len"] <= b["max_mean_len"])
        & (out["distinct_ratio"] >= b["min_distinct_ratio"])
        & (out["symbol_ratio"] <= b["max_symbol_ratio"])
        & (out["stopword_hits"] >= b["min_stopword_hits"])
    )
    return out


def repetition_signals(texts: list[str]) -> dict[str, np.ndarray]:
    """Gopher-style REPETITION signals (Rae et al. 2021 appendix A1.2 —
    the n-gram-repetition filter family), adapted to the simple
    tokenizer and to COUNT fractions so every signal has an exact SQL
    twin (the paper's char-weighted variants need only a weight change):

    - ``top_word_frac``   — most frequent token's share of all tokens
      (the paper's "top 1-gram" signal);
    - ``dup_word_frac``   — share of tokens that are repeats of an
      earlier token (1 − distinct/total);
    - ``top_bigram_frac`` — most frequent word 2-gram's share of all
      2-grams (the "top 2-gram" signal; 0 when fewer than 2 tokens).

    Per-doc numpy (unique/counts over the token array); stateless, so
    the Dataset stage is a plain task-pool ``map_batches``."""
    n = len(texts)
    out = {
        "n_tokens": np.zeros(n, dtype=np.int64),
        "top_word_frac": np.zeros(n, dtype=np.float64),
        "dup_word_frac": np.zeros(n, dtype=np.float64),
        "top_bigram_frac": np.zeros(n, dtype=np.float64),
    }
    for i, t in enumerate(texts):
        toks = _simple.tokens(t or "")
        nt = len(toks)
        out["n_tokens"][i] = nt
        if nt == 0:
            continue
        arr = np.asarray(toks)
        _, counts = np.unique(arr, return_counts=True)
        out["top_word_frac"][i] = counts.max() / nt
        out["dup_word_frac"][i] = (nt - counts.size) / nt
        if nt >= 2:
            bigrams = np.char.add(np.char.add(arr[:-1], " "), arr[1:])
            _, bc = np.unique(bigrams, return_counts=True)
            out["top_bigram_frac"][i] = bc.max() / (nt - 1)
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


def chunk_windows(texts: list[str], chunk_tokens: int = 128,
                  overlap: int = 16) -> dict[str, object]:
    """Fixed-size token-window chunking with overlap — the standard LM
    pretraining chunker (split every document into ``chunk_tokens``-token
    windows advancing by ``chunk_tokens - overlap``; the final window is
    shorter, never empty, and a document is never split mid-token).
    Token-less documents emit no chunks.

    Returns parallel lists/arrays per CHUNK: ``row`` (index into
    ``texts``), ``chunk_idx`` (0-based within the doc), ``n_tokens``,
    ``chunk_text`` (space-joined simple-analyzer tokens — the exact SQL
    twin is ``array_to_string(tokens[start : end], ' ')`` over
    ``SQL_SIMPLE_TOKENS``).
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _simple.tokens_batch([t or "" for t in texts])
    rows: list[int] = []
    idxs: list[int] = []
    lens: list[int] = []
    out_text: list[str] = []
    for di, t in enumerate(toks):
        n = len(t)
        if n == 0:
            continue
        n_chunks = 1 if n <= chunk_tokens else -((n - chunk_tokens) // -stride) + 1
        for i in range(n_chunks):
            lo = i * stride
            hi = min(lo + chunk_tokens, n)
            rows.append(di)
            idxs.append(i)
            lens.append(hi - lo)
            out_text.append(" ".join(t[lo:hi]))
    return {
        "row": np.asarray(rows, dtype=np.int64),
        "chunk_idx": np.asarray(idxs, dtype=np.int64),
        "n_tokens": np.asarray(lens, dtype=np.int64),
        "chunk_text": out_text,
    }
