"""Deterministic (content-addressed) sampling for training-data
curation.

A 100 TB curation pipeline needs samples that are REPRODUCIBLE across
runs, engines, cluster sizes, and resumed jobs — `df.sample()` draws
from per-partition RNG state, so adding an executor changes the
sample. Hash-based Bernoulli sampling fixes the membership decision to
the ROW: keep a row iff the first 4 hex chars of md5(key) fall below a
threshold derived from the rate. The same rule is expressible in any
engine with md5 (the DuckDB oracle recomputes it bit-for-bit), and a
row's fate never depends on what else is in the dataset — stable under
incremental appends.

Stratified rates (e.g. keep 50% of low-resource languages, 5% of
`en`) are per-stratum thresholds on the same hash — one scan, no
shuffle, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BUCKETS = 16**4  # first 4 md5 hex chars: 65536 even buckets


def _threshold_hex(rate: float) -> str:
    """Exclusive upper bound on the kept 4-hex-char prefixes for
    ``rate``. rate=1.0 maps to 'g': every hex char sorts below 'g', so
    the comparison keeps all rows (a 5-char '10000' would LOSE the
    fixed-width lexicographic == numeric property)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(rate * _BUCKETS)
    return "g" if n >= _BUCKETS else format(n, "04x")


_NULL_SENTINEL = "\x00null"


def sample_bucket(key: F.Column) -> F.Column:
    """The row's 4-hex-char sample bucket (string, lexicographic
    compare == numeric compare on fixed-width hex). Null keys hash a
    sentinel: they all share ONE bucket, so a given rate either keeps
    every null-key row or none — deterministic, and rate=1.0 keeps
    them (md5(NULL) is NULL, which a bare comparison would silently
    drop)."""
    return F.substring(
        F.md5(F.coalesce(key.cast("string"), F.lit(_NULL_SENTINEL))), 1, 4
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    strata: dict[str, float] | None = None,
    strata_col: str | None = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (by ``key_col``
    hash), or per-stratum rates via ``strata``: {stratum value: rate}
    over ``strata_col`` with ``default_rate`` for unlisted values.

    Pure filter expression — vectorized JVM md5, no shuffle, no UDF;
    Catalyst pushes it into the scan where the source allows.

    ``key_col`` must be integral, string, or date typed: float/boolean
    string renderings differ between engines ('1.0E-7' vs '1e-07' —
    the same divergence engine/encoder.py's group_key_expr documents),
    which would break the cross-engine reproducibility this module
    promises. Cast or format such keys explicitly first.
    """
    from pyspark.sql import types as T

    if rate is not None and strata is not None:
        raise ValueError(
            "rate and strata are mutually exclusive — use default_rate "
            "for rows outside the listed strata"
        )
    kt = df.schema[key_col].dataType
    if not isinstance(
        kt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.StringType, T.DateType)
    ):
        raise TypeError(
            f"deterministic_sample key {key_col!r} is {kt.simpleString()}: "
            "only integral/string/date keys render identically across "
            "engines; cast or format the key explicitly"
        )
    bucket = sample_bucket(F.col(key_col))
    if strata is not None:
        if strata_col is None:
            raise ValueError("strata requires strata_col")
        cond = F.lit(_threshold_hex(default_rate))
        expr = None
        for value, r in sorted(strata.items()):
            c = F.col(strata_col) == F.lit(value)
            expr = F.when(c, F.lit(_threshold_hex(r))) if expr is None else (
                expr.when(c, F.lit(_threshold_hex(r)))
            )
        threshold = expr.otherwise(cond) if expr is not None else cond
    elif rate is not None:
        threshold = F.lit(_threshold_hex(rate))
    else:
        raise ValueError("provide rate or strata")
    return df.where(bucket < threshold)
