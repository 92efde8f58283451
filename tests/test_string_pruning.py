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
    # a truncated prefix ending in U+10FFFF records an unbounded max
    # (never a SHORTENED one, which column_min_max couldn't tell apart
    # from an exact short value)
    edge = "a" * 63 + chr(0x10FFFF) + "tail"
    assert _stat_str_max(edge) is None
    # the bound never shortens: it's the 64-char prefix, last char +1
    b2 = _stat_str_max("b" * 200)
    assert len(b2) == 64 and b2 == "b" * 63 + "c"


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


def test_column_min_max_returns_actual_long_string_values(spark, tmp_path):
    """parquet4s Stats.min/max returns ACTUAL column values
    (Stats.scala:34-58). Long-string stats are truncated at encode
    time, so the engine must detect suspect (>=64-char / unbounded)
    stats rows and fold decoded extremes for just those chunks —
    round-2 returned bare 64-char bounds with no way to detect it."""
    from colcrush.engine.scan import column_min_max

    rows = [
        (0, "aaa-short-min"),                       # the true min (short)
        (1, "m" * 100 + "MIDDLE"),                  # long, middle
        (2, "z" * 80 + "-the-true-max-" + "q" * 40),  # long, true max
        (3, "z" * 80 + "-the-true-max-" + "p" * 40),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    path = str(tmp_path / "ds")
    write_encoded(df, path, mode="overwrite", group_cols=["id"])
    mn, mx = column_min_max(spark, path, "s")
    texts = {r[1] for r in rows}
    assert mn == "aaa-short-min"
    assert mx in texts and mx == max(texts)  # an actual value, the max

    # true min ALSO long (> 64 chars): min side folds too
    rows2 = [(0, "A" * 100 + "first"), (1, "A" * 100 + "second")]
    df2 = spark.createDataFrame(rows2, "id long, s string")
    p2 = str(tmp_path / "ds2")
    write_encoded(df2, p2, mode="overwrite", group_cols=["id"])
    mn2, mx2 = column_min_max(spark, p2, "s")
    assert mn2 == rows2[0][1] and mx2 == rows2[1][1]

    # short-string dataset: pure metadata path returns exact values
    rows3 = [(0, "apple"), (1, "zebra")]
    p3 = str(tmp_path / "ds3")
    write_encoded(spark.createDataFrame(rows3, "id long, s string"), p3,
                  mode="overwrite", group_cols=["id"])
    assert column_min_max(spark, p3, "s") == ("apple", "zebra")


def test_column_min_max_covers_stats_skipped_chunks(spark, tmp_path):
    """Stats are SKIPPED entirely for long-string chunks (avg > 256B:
    codecs/column.py gate) — null min_s/max_s with live rows. Such
    chunks must be decoded by column_min_max, not silently ignored
    (review finding: the true extreme could live only in them)."""
    from colcrush.engine.scan import column_min_max

    # group 0: short strings (exact stats); group 1: 300B strings whose
    # stats are skipped and which hold BOTH true extremes
    rows = [
        (0, "apple"),
        (0, "zebra"),
        (1, "AAA-true-min-" + "a" * 300),
        (1, "zzz-true-max-" + "z" * 300),
    ]
    df = spark.createDataFrame(rows, "g long, s string")
    path = str(tmp_path / "skipped")
    write_encoded(df, path, mode="overwrite", group_cols=["g"])
    mn, mx = column_min_max(spark, path, "s")
    assert mn == rows[2][1]  # beats 'apple', found only by decoding
    assert mx == rows[3][1]  # beats 'zebra'

    # ALL chunks skipped: no stats anywhere, still actual values
    rows2 = [(0, "A-min-" + "b" * 300), (1, "z-max-" + "y" * 300)]
    p2 = str(tmp_path / "all_skipped")
    write_encoded(spark.createDataFrame(rows2, "g long, s string"), p2,
                  mode="overwrite", group_cols=["g"])
    assert column_min_max(spark, p2, "s") == (rows2[0][1], rows2[1][1])

    # all-null column: (None, None), no decode crash
    rows3 = [(0, None), (1, None)]
    p3 = str(tmp_path / "all_null")
    write_encoded(spark.createDataFrame(rows3, "g long, s string"), p3,
                  mode="overwrite", group_cols=["g"])
    assert column_min_max(spark, p3, "s") == (None, None)
