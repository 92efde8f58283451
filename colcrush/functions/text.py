"""Text-analysis functions for training-data pipelines (SURVEY mandate):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — including the winnowing fingerprint, which is
pure Catalyst array expressions (transform/filter over shingle hashes;
no Python UDF anywhere in this module).
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


def _md5_long(c: F.Column) -> F.Column:
    """First 8 hex chars of md5 as a bigint — BOTH Spark and DuckDB
    print identical md5 hex, so fingerprint oracles reproduce values
    bit-for-bit. The verification hash, not the production default."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def _gram_hash(c: F.Column, hash: str) -> F.Column:
    if hash == "md5":
        return _md5_long(c)
    if hash == "xxhash64":
        return F.xxhash64(c)
    raise ValueError(f"hash must be 'xxhash64' or 'md5', got {hash!r}")


def winnow_fingerprints(
    col: F.Column, k: int = 8, w: int = 16, hash: str = "xxhash64"
) -> F.Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every k-gram, take the minimum per sliding window of w hashes,
    distinct — the robust near-dup fingerprint set. Pure Spark
    expressions (transform / sequence / slice / array_min): whole-stage
    codegen'd, no Python — the round-1 version was a per-doc numpy UDF.
    Empty array for texts shorter than k.

    ``hash``: 'xxhash64' (default — one JVM hash per k-gram, the right
    cost at 100 TB) or 'md5' (DuckDB-recomputable; what the driver
    oracle runs). Fingerprint VALUES differ between modes; the derived
    near-dup structure is equivalent (pinned by test).

    The window min is computed by SPARSE-TABLE DOUBLING (r9): with
    m_d[i] = min(h[i..i+d-1]), each round zips m with its d-shifted
    self (m_2d[i] = least(m_d[i], m_d[i+d])), so the width-w window
    mins cost ceil(log2(w)) O(n) zip_with passes instead of one O(w)
    slice + array_min per window. Higher-order functions are
    interpreted (never codegen'd), so the O(n*w) -> O(n*log w) cut is
    a measured ~3x CPU drop on the bench corpus, value-identical on
    both hash modes. Each round's input is bound once via the
    1-element-array transform scope — referencing a growing expression
    directly would re-evaluate the whole gram-hash chain per round
    (the O(n^2) rebind trap; measured 98s vs 0.3s on 500 docs).
    zip_with null-pads the shorter side, so the tail entries hold
    PARTIAL-window mins until the final slice truncates to the
    n-w+1 full windows."""
    n_g = F.length(col) - (k - 1)
    grams_h = F.transform(
        F.sequence(F.lit(1), n_g),
        lambda p: _gram_hash(F.substr(col, p, F.lit(k)), hash),
    )

    def _round(d: int):
        return lambda mm: F.zip_with(
            mm,
            F.slice(mm, d + 1, F.greatest(F.size(mm) - d, F.lit(0))),
            lambda x, y: F.least(x, y),
        )

    def _mins(hs: F.Column) -> F.Column:
        m = hs
        d = 1
        while d * 2 <= w:
            m = F.element_at(F.transform(F.array(m), _round(d)), 1)
            d *= 2
        if d < w:
            m = F.element_at(F.transform(F.array(m), _round(w - d)), 1)
        full = F.slice(m, 1, F.size(hs) - (w - 1))
        return F.array_distinct(
            F.when(F.size(hs) >= w, full).otherwise(
                F.array(F.array_min(hs))
            )
        )

    mins = F.element_at(F.transform(F.array(grams_h), _mins), 1)
    return F.when(F.length(col) >= k, F.array_sort(mins)).otherwise(
        F.expr("CAST(array() AS array<bigint>)")
    )
