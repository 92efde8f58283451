"""Streaming encode sink: an indefinite stream lands as a resumable
encoded dataset (chunks + manifest appended per epoch).

This is the full north_star composition: the rotating partitioned
sink's semantics (parquet4s ParquetPartitioningFlow — rotation by
count/time, postWriteHandler checkpoint,
/root/reference/akkaPekko/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetPartitioningFlow.scala:303-316,483-507)
with the colcrush codec layer underneath instead of parquet-mr:
every micro-batch is chunk-encoded (dict/RLE/FOR/FSST auto-select),
appended, and manifest-committed — Structured Streaming's checkpoint
plus the manifest give exactly-once-ish resumability (an epoch retried
after a crash rewrites the same deterministic chunk ids).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..engine.dataset import write_encoded


def encoded_stream_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    group_cols: list[str],
    post_commit: Callable[[int, int], None] | None = None,
    trigger_available_now: bool = True,
    **encode_kwargs,
):
    """Start a streaming query that encodes each micro-batch into the
    dataset at ``path`` (append mode). ``post_commit(epoch_id, n_rows)``
    is the postWriteHandler analog. Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        write_encoded(
            batch_df, path, mode="append", group_cols=group_cols, **encode_kwargs
        )
        if post_commit is not None:
            post_commit(epoch_id, n)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
