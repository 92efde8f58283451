"""String-stat chunk pruning: truncate/truncate-and-increment bounds
must stay SOUND (never drop a matching chunk) and still prune."""

from __future__ import annotations

import pyspark.sql.functions as F

from colcrush.engine import pruned_chunk_count, scan, write_encoded
from colcrush.engine.encoder import _stat_str_max


def test_stat_str_max_is_upper_bound():
    long = "m" * 100 + "zz"
    b = _stat_str_max(long)
    assert b is not None and b >= long and len(b) <= 64
    assert _stat_str_max("short") == "short"
    hi = chr(0x10FFFF) * 100
    assert _stat_str_max(hi) is None  # genuinely unbounded
    edge = "a" * 63 + chr(0x10FFFF) + "tail"
    be = _stat_str_max(edge)
    assert be is not None and be >= edge


def test_string_chunk_pruning_sound_and_effective(spark, tmp_path):
    p = str(tmp_path / "ds")
    df = spark.range(2000).select(
        F.concat(F.lit("key_"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    write_encoded(df, p, range_cols=["k"], target_chunk_rows=256)
    alive, total = pruned_chunk_count(spark, p, [("k", "<", "key_000100")])
    assert total >= 7 and alive < total
    got = scan(spark, p, filters=[("k", "<", "key_000100")])
    assert got.count() == 100

    # equality with a 100-char value against 64-char-truncated stats
    df2 = spark.range(500).select(
        F.concat(
            F.lit("x" * 80),
            F.lpad(F.col("id").cast("string"), 6, "0"),
        ).alias("k"),
        F.col("id").alias("v"),
    )
    p2 = str(tmp_path / "ds2")
    write_encoded(df2, p2, range_cols=["v"], target_chunk_rows=64)
    target = "x" * 80 + "000123"
    got = scan(spark, p2, filters=[("k", "==", target)])
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["v"] == 123  # soundness under truncation
