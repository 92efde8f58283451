"""Text-analysis functions for training-data pipelines (SURVEY mandate):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen); only the winnowing fingerprint uses a vectorized
pandas UDF (rolling hash over byte arrays in numpy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic marker vocabularies per language (tiny n-gram heuristic)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " ist "],
    "fr": [" le ", " la ", " est "],
    "es": [" el ", " los ", " es "],
    "zh": ["的", "是", "了"],
}


def occurrences(col: F.Column, needle: str) -> F.Column:
    """Count of non-overlapping occurrences — pure length arithmetic,
    deterministic across engines."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def token_count(col: F.Column) -> F.Column:
    """Whitespace token count via length arithmetic (single-space
    tokenized corpora); deterministic and oracle-friendly."""
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        (F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit("")))).cast("long")
        + F.lit(1)
    )


def token_count_regex(col: F.Column) -> F.Column:
    """BPE-ish token counting: words, numbers, and punctuation runs each
    count as tokens (regexp-based, JVM-side)."""
    words = F.size(
        F.filter(F.split(col, r"[^A-Za-z0-9_]+"), lambda t: F.length(t) > 0)
    )
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9_\s]+", ""))
    return (words + punct).cast("long")


def lang_id(col: F.Column) -> F.Column:
    """Marker-count language ID: argmax of per-language marker hits,
    'und' when nothing matches. CASE-cascade = deterministic ties."""
    scores = {
        lang: sum(
            (occurrences(col, m) for m in markers), start=F.lit(0.0)
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(_LANG_MARKERS)):  # earlier langs win ties
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: F.Column) -> F.Column:
    """Composite quality score from length / mean word length /
    stopword ratio — all arithmetic on deterministic integer counts."""
    n_chars = F.length(col).cast("double")
    n_tokens = token_count(col).cast("double")
    mean_word = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    stop_hits = (
        occurrences(col, " the ") + occurrences(col, " and ") + occurrences(col, " a ")
    )
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_term = F.when((mean_word >= 3) & (mean_word <= 10), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round(
        length_term * F.lit(0.4) + word_term * F.lit(0.3) + stop_ratio * F.lit(10) * F.lit(0.3),
        6,
    )


def fingerprint_md5(col: F.Column) -> F.Column:
    """Whole-document fingerprint (exact-dup key)."""
    return F.md5(col)


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprints(texts: pd.Series) -> pd.Series:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling polynomial hash over k-grams, minimum per window — the
    robust near-dup fingerprint set. Vectorized numpy per document."""
    K, W, BASE = 8, 16, np.uint64(1000003)
    out = []
    # powers BASE^(K-1-j), j=0..K-1, mod 2^64 (uint64 wraparound)
    powers = np.ones(K, dtype=np.uint64)
    for j in range(K - 2, -1, -1):
        powers[j] = powers[j + 1] * BASE
    for t in texts:
        if t is None or len(t) < K:
            out.append([])
            continue
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        # polynomial k-gram hash, fully vectorized (mod 2^64 wraps)
        win_b = np.lib.stride_tricks.sliding_window_view(b, K)
        h = (win_b * powers).sum(axis=1, dtype=np.uint64)
        if len(h) <= W:
            fps = {int(h.min())}
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, W)
            fps = set(win.min(axis=1).astype(np.int64).tolist())
        out.append(sorted(int(np.int64(np.uint64(f))) for f in fps))
    return pd.Series(out)
