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

import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, functions as F


@dataclass
class PostWriteState:
    """Post-write hook state — parquet4s PostWriteState parity
    (ParquetPartitioningFlow.scala:303-316): processed counts, the last
    record of the epoch, modified partitions, and a manual ``flush()``.

    Flush mapping: in the reference, flush() closes the currently open
    writers so buffered rows become durable mid-stream. Structured
    Streaming commits every epoch's files at epoch end already, so the
    durability part is automatic; what flush() adds here is a durable
    CONSISTENCY MARKER — ``<path>/_flush/<epoch>`` — recording that the
    handler explicitly requested a visibility point at this epoch
    (downstream consumers that only read up to the last flush marker
    get the same semantics reference users built on manual flush)."""

    epoch_id: int
    processed_record_count: int
    last_processed_record: dict | None
    partitions: list
    _path: str
    flushed: bool = field(default=False)

    def flush(self) -> str:
        from ..engine import fsio

        d = fsio.join(self._path, "_flush")
        fsio.makedirs(d)
        marker = fsio.join(d, f"{self.epoch_id:08d}")
        fsio.write_text(marker, str(self.processed_record_count))
        self.flushed = True
        return marker


def last_flushed_epoch(path: str) -> int | None:
    """Largest epoch with a flush marker, or None."""
    from ..engine import fsio

    d = fsio.join(path, "_flush")
    if not fsio.isdir(d):
        return None
    eps = [int(x) for x in fsio.listdir(d) if x.isdigit()]
    return max(eps) if eps else None


def via_parquet(
    stream_df: DataFrame,
    path: str,
    partition_by: list[str],
    checkpoint: str,
    max_records_per_file: int = 100_000,
    trigger_seconds: int | None = None,
    default_partition: str | None = None,
    pre_write: Callable[[DataFrame], DataFrame] | None = None,
    post_write: Callable[[DataFrame, int, PostWriteState], None] | None = None,
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
        # with a hook attached, persist so the micro-batch plan runs
        # ONCE (the write pass materializes the cache) and the hook's
        # stats come from a single aggregate job over the cache — the
        # round-2 version re-ran the whole batch plan three extra times
        # per epoch (distinct/count/tail)
        if post_write is not None:
            batch_df.persist()
        try:
            (
                batch_df.write.mode("append")
                .option("maxRecordsPerFile", max_records_per_file)
                .partitionBy(*partition_by)
                .parquet(path)
            )
            if post_write is not None:
                # max_by over a per-row monotonic id pins "last record"
                # to the final row of the highest partition (what
                # tail(1) returned) — a bare F.last() in a global agg
                # is partial-merge-order-dependent and could surface an
                # arbitrary partition's last row as the watermark
                cols = batch_df.columns
                row = batch_df.withColumn(
                    "__mid", F.monotonically_increasing_id()
                ).agg(
                    F.count(F.lit(1)).alias("n"),
                    F.collect_set(F.struct(*partition_by)).alias("parts"),
                    F.max_by(F.struct(*cols), F.col("__mid")).alias("last"),
                ).collect()[0]
                state = PostWriteState(
                    epoch_id=epoch_id,
                    processed_record_count=int(row["n"]),
                    last_processed_record=(
                        row["last"].asDict() if row["n"] else None
                    ),
                    # None-safe sort: a nullable partition column (rows
                    # routed to the Hive default partition) must not
                    # crash the stream on tuple comparison
                    partitions=sorted(
                        (tuple(p) for p in row["parts"]),
                        key=lambda t: tuple(
                            (v is None, "" if v is None else v) for v in t
                        ),
                    ),
                    _path=path,
                )
                post_write(batch_df, epoch_id, state)
        finally:
            if post_write is not None:
                batch_df.unpersist()

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
