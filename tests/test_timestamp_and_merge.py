"""Timestamp-format variants + merged-schema reads (reference parity:
TimeEncodingInt96/Int64 compat specs and Schema.scala:34-52)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from colcrush.sources.parquet import read_merged, write_with_timestamp_format


def test_timestamp_format_variants_roundtrip(spark, tmp_path):
    ts = [
        (1, datetime.datetime(1969, 12, 31, 23, 59, 59)),
        (2, datetime.datetime(2024, 2, 29, 12, 34, 56, 789000)),
    ]
    df = spark.createDataFrame(ts, ["id", "ts"])
    for fmt in ("INT96", "TIMESTAMP_MICROS", "TIMESTAMP_MILLIS"):
        p = str(tmp_path / fmt)
        write_with_timestamp_format(df, p, fmt=fmt)
        back = {r["id"]: r["ts"] for r in spark.read.parquet(p).collect()}
        assert back[1] == ts[0][1] and back[2] == ts[1][1], fmt


def test_read_merged_schema_union(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1, "x")], ["id", "s"]).write.parquet(a)
    spark.createDataFrame([(2, 3.5)], ["id", "d"]).write.parquet(b)
    got = read_merged(spark, a, b)
    assert set(got.columns) == {"id", "s", "d"}
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["s"] == "x" and rows[1]["d"] is None
    assert rows[2]["d"] == 3.5 and rows[2]["s"] is None
