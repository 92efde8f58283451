"""Streaming parquet source with a parallelism knob — the analog of
parquet4s's parallel file reading (akkaPekko ParquetSource.scala:257-268
``flatMapMerge(parallelism, ...)``; fs2 reader.scala:275-281).

Structured Streaming mapping: ``max_files_per_trigger`` bounds how many
files each micro-batch ingests (the reference's merge width bounds how
many files are open at once), and ``parallelism`` repartitions the
batch so downstream stages fan out across that many tasks regardless of
the source file count (small files don't serialize the pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    df = r.parquet(path)
    if parallelism is not None:
        df = df.repartition(int(parallelism))
    return df
