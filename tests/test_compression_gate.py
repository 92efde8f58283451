"""Compression gate (SURVEY.md §7 step 7, BASELINE.json): total encoded
bytes must be <= the parquet4s-reference compressed size on the same
data. The reference writes parquet with dictionary encoding enabled and
parquet-mr's DEFAULT compression codec = UNCOMPRESSED
(/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetWriter.scala:79-84).
Snappy is additionally reported by bench.py as a stretch reference.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from colcrush.engine import encode_table
from colcrush.fixtures import source_code_df


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


@pytest.fixture(scope="module")
def src(spark):
    df = source_code_df(spark, 2000, n_repos=20).cache()
    df.count()
    return df


def test_beats_parquet4s_reference_size(spark, src, tmp_path):
    enc_bytes = (
        encode_table(src, group_cols=["repo", "lang"])
        .agg(F.sum("enc_bytes"))
        .collect()[0][0]
    )
    ref_dir = str(tmp_path / "ref")
    src.write.option("compression", "uncompressed").parquet(ref_dir)
    ref_bytes = _dir_bytes(ref_dir)
    assert enc_bytes <= ref_bytes, (
        f"encoded {enc_bytes:,} > parquet4s-reference {ref_bytes:,}"
    )
    # we expect to be *well* under, not just at parity
    assert enc_bytes < ref_bytes * 0.5, f"only {enc_bytes/ref_bytes:.2f}x"


def test_tpch_table_beats_reference(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    enc_bytes = (
        encode_table(li, group_cols=["l_returnflag"])
        .agg(F.sum("enc_bytes"))
        .collect()[0][0]
    )
    ref_dir = str(tmp_path / "ref")
    li.write.option("compression", "uncompressed").parquet(ref_dir)
    ref_bytes = _dir_bytes(ref_dir)
    assert enc_bytes <= ref_bytes
