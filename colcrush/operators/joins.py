"""ETL join parity with parquet4s's in-memory equi-joins.

The reference materializes the right side and hash-groups it — a
broadcast hash join with a streaming left probe
(/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/etl/Join.scala:23-110,
API ParquetIterable.scala:57-125). Spark-first re-expression: a
``broadcast()`` hint on the right side and the built-in join operator —
Catalyst plans BroadcastHashJoin, which is exactly the reference's
physical strategy, minus the single-threaded probe.

At 100 TB the ``broadcast_right=False`` path lets Catalyst/AQE pick
sort-merge or shuffled-hash (with skew-join splitting) instead; the
default mirrors the reference's semantics where the right side is
assumed small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    how: str,
    broadcast_right: bool,
) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    cond = left[on_left] == r[on_right]
    return left.join(r, cond, how)


def inner_join(left, right, on_left, on_right, broadcast_right=True):
    """Join.scala:23-28 (innerJoin)."""
    return _join(left, right, on_left, on_right, "inner", broadcast_right)


def left_join(left, right, on_left, on_right, broadcast_right=True):
    """Join.scala:9-14 — unmatched left rows padded with nulls."""
    return _join(left, right, on_left, on_right, "left", broadcast_right)


def right_join(left, right, on_left, on_right, broadcast_right=True):
    """Join.scala:16-21 — leftovers of the right side emitted last."""
    return _join(left, right, on_left, on_right, "right", broadcast_right)


def full_join(left, right, on_left, on_right, broadcast_right=True):
    """Join.scala:30-36 (fullJoin)."""
    return _join(left, right, on_left, on_right, "full", broadcast_right)


def concat(*dfs: DataFrame) -> DataFrame:
    """UNION ALL, lazy — parquet4s `concat`
    (/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetIterable.scala:164-169)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
