"""Streaming encode sink: stream -> encoded dataset, decodable and
append-consistent across epochs."""

from __future__ import annotations

import pyspark.sql.functions as F

from colcrush.engine import read_decoded, read_manifest
from colcrush.fixtures import source_code_df
from colcrush.streaming.encode_sink import encoded_stream_sink


def test_stream_encodes_to_dataset(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    ds = str(tmp_path / "ds")
    ck = str(tmp_path / "ck")
    df = source_code_df(spark, 600, n_repos=5)
    # two source files -> availableNow processes them (possibly one epoch)
    df.where(F.col("lang") < "m").write.parquet(src_dir)
    df.where(F.col("lang") >= "m").write.mode("append").parquet(src_dir)

    commits = []
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src_dir)
    q = encoded_stream_sink(
        stream,
        ds,
        ck,
        group_cols=["lang"],
        post_commit=lambda e, n: commits.append((e, n)),
        target_chunk_rows=256,
    )
    q.awaitTermination(120)
    assert sum(n for _, n in commits) == 600
    dec = read_decoded(spark, ds)
    assert dec.count() == 600
    assert dec.exceptAll(df).count() == 0 and df.exceptAll(dec).count() == 0
    m = read_manifest(spark, ds)
    assert m.where(F.col("column") == "content").agg(
        F.sum("n_rows")
    ).collect()[0][0] == 600
