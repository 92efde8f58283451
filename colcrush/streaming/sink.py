"""Streaming partitioned rotating sink — Structured Streaming analog of
parquet4s's ParquetPartitioningFlow
(/root/reference/akkaPekko/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetPartitioningFlow.scala:18-27,319-530).

Mapping (SURVEY.md §2.8):
- dynamic Hive partitioning of a stream -> writeStream.partitionBy
- rotation by count (maxCount, :503-507)   -> maxRecordsPerFile
- rotation by time (maxDuration, :483-487) -> trigger interval
- defaultPartition for nulls (:344-349)    -> coalesce(col, default)
- preWriteTransformation (1->N)            -> transform callback
- postWriteHandler / PostWriteState        -> foreachBatch commit hook
  (modified partitions reported per epoch — the manifest checkpoint)
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def via_parquet(
    stream_df: DataFrame,
    path: str,
    partition_by: list[str],
    checkpoint: str,
    max_records_per_file: int = 100_000,
    trigger_seconds: int | None = None,
    default_partition: str | None = None,
    pre_write: Callable[[DataFrame], DataFrame] | None = None,
    post_write: Callable[[DataFrame, int, list], None] | None = None,
):
    """Start the rotating partitioned sink; returns the StreamingQuery."""
    df = stream_df
    if pre_write is not None:
        df = pre_write(df)
    if default_partition is not None:
        for c in partition_by:
            df = df.withColumn(
                c, F.coalesce(F.col(c).cast("string"), F.lit(default_partition))
            )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*partition_by)
            .parquet(path)
        )
        if post_write is not None:
            parts = [
                tuple(r)
                for r in batch_df.select(*partition_by).distinct().collect()
            ]
            post_write(batch_df, epoch_id, parts)

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
