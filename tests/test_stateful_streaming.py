"""Custom stateful streaming operator (applyInPandasWithState) +
decoder loud-failure contract."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from colcrush.streaming.stateful import sessionize_stream


def test_stateful_sessionization(spark, tmp_path):
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    ev = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 10.5), (1, 12.0)], ["user_id", "ts_sec"]
    )
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # first batch ingests events; the inactivity timeout then fires
        # on a later empty batch and emits the closed sessions
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sessions_out").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    by_user = {r["user_id"]: r for r in rows}
    assert by_user[1]["n_events"] == 3
    assert by_user[1]["session_start"] == 10.0
    assert by_user[1]["session_end"] == 12.0
    assert by_user[2]["n_events"] == 1


def test_decoder_fails_loudly_on_incomplete_chunks(spark):
    """assume_colocated misuse must raise, never silently mis-decode."""
    from colcrush.engine import encode_table
    from colcrush.engine.decoder import decode_table

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("k")
    )
    enc = encode_table(df, group_cols=["k"])
    # scramble colocation: repartition round-robin so a chunk's column
    # rows land in different partitions
    scrambled = enc.repartition(8)
    with pytest.raises(Exception, match="incomplete chunks"):
        decode_table(scrambled, df.schema, assume_colocated=True).collect()
