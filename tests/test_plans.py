"""Physical-plan assertions: the Catalyst behaviors SURVEY.md §4 relies
on must actually appear in the plans (pushdown, pruning, broadcast,
codegen, bounded shuffle count). These are the scale guarantees — a
plan that reads all columns or shuffles twice is a 100 TB bug even if
the small-SF result is right."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from colcrush.engine import encode_table
from colcrush.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    spark = df.sparkSession
    jvm = spark._sc._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(QUERIES["scan_filtered"](spark, SF))
    assert "PushedFilters" in p
    assert "GreaterThan(l_discount,0.05)" in p


def test_column_pruning(spark):
    p = _plan(QUERIES["scan_projected"](spark, SF))
    # scan must read only the 3 projected columns
    assert "doc_id" in p and "n_chars" in p
    assert "text" not in p, "projection leaked the heavy text column into the scan"


def test_in_filter_pushdown(spark):
    p = _plan(QUERIES["filter_in"](spark, SF))
    assert "In(l_returnflag" in p


def test_joins_are_broadcast(spark):
    for q in ("join_inner", "tpch_q3"):
        p = _plan(QUERIES[q](spark, SF))
        assert "BroadcastHashJoin" in p, f"{q} did not broadcast"


def test_q1_whole_stage_codegen(spark):
    # AQE's unexecuted AdaptiveSparkPlan hides codegen spans; turn it
    # off for the assertion only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = _plan(QUERIES["tpch_q1"](spark, SF))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # formatted mode marks whole-stage-codegen spans with "[codegen id : N]"
    assert "codegen id" in p, p[:1500]


def test_encode_single_shuffle(spark):
    """The DATA path must shuffle exactly once. Unsalted: 1 exchange
    total. Salted: ALSO 1 data exchange — the tiny size-histogram
    aggregation (whose output is broadcast back, never the data) runs
    once in the bytes-based partition-sizing job and is persist()ed;
    its cached subtree still PRINTS inside the broadcast build side
    (InMemoryTableScan), but reads blocks, not data."""

    def data_exchanges(plan: str) -> int:
        # any shuffle of the data, whatever its partitioning prints as:
        # hashpartitioning normally, SinglePartition when the r9
        # bytes-justified sizing gives a tiny input one partition
        return sum(
            1
            for ln in plan.splitlines()
            if "Exchange" in ln and "BroadcastExchange" not in ln
        )

    df = spark.read.parquet(f"{SF}/documents.parquet")
    p0 = (
        encode_table(df, group_cols=["lang"], salted=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert data_exchanges(p0) == 1, p0[:2000]

    p1 = (
        encode_table(df, group_cols=["lang"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # probe side (everything before the broadcast build) = the data
    # path: exactly one exchange moves the data
    data_side = p1.split("BroadcastExchange")[0]
    assert data_exchanges(data_side) == 1, p1[:2000]
    assert "BroadcastExchange" in p1  # salt plan joins via broadcast
    assert "InMemoryTableScan" in p1  # histogram computed once, cached


def test_salted_encode_splits_mega_group(spark):
    """Skew fix: a dominant group must land in >1 salt (FIXTURES.md F4a)."""
    from colcrush.fixtures import source_code_df

    src = source_code_df(spark, 3000, n_repos=10)
    enc = encode_table(
        src,
        group_cols=["repo"],  # repo-level groups: Zipf head dominates
        target_group_bytes=1 << 20,  # 1 MB -> mega-repo must split
        target_chunk_bytes=1 << 19,
    )
    per_group = (
        enc.where(F.col("column") == "content")
        .groupBy("group_key")
        .agg(F.countDistinct("salt").alias("n_salts"), F.sum("raw_bytes").alias("b"))
        .collect()
    )
    biggest = max(per_group, key=lambda r: r["b"])
    assert biggest["n_salts"] > 1, "mega group was not salted"
    small = [r for r in per_group if r["b"] < (1 << 20)]
    assert all(r["n_salts"] == 1 for r in small), "tiny groups should not salt"


def test_record_filter_no_global_window(spark):
    """record_filter must never funnel the table through one task: the
    window is partitioned by _pid (VERDICT round-1: the unpartitioned
    Window.orderBy forced a single-partition Exchange)."""
    p = _plan(QUERIES["record_filter"](spark, SF))
    assert "Exchange SinglePartition" not in p, "global single-task window"
    assert "Window" in p  # partition-local window still present


def test_encode_with_salt_plan_scans_input_once(spark, tmp_path):
    """With a recorded salt plan, the encode plan must read the INPUT
    exactly once (the broadcast build side scans the tiny plan, not a
    second histogram aggregation over the input) — the property that
    makes sidecar-reusing resume a one-pass job at 100 TB."""
    import pyspark.sql.functions as F

    from colcrush.engine.encoder import plan_salts

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan_df = plan_salts(df, ["lang"], 16 << 20)
    pq = str(tmp_path / "plan")
    plan_df.write.parquet(pq)
    recorded = spark.read.parquet(pq)
    p = (
        encode_table(df, group_cols=["lang"], salt_plan=recorded,
                     num_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("documents.parquet") == 1, p[:2000]
    data_side = p.split("BroadcastExchange")[0]
    assert data_side.count("Exchange hashpartitioning") == 1, p[:2000]
