"""Typed dataclass API — the shapeless-derivation parity suite, modeled
on CompatibilityTestCases
(/root/reference/core/src/it/scala/com/github/mjakubowski84/parquet4s/CompatibilityTestCases.scala:12-113):
primitives incl. Decimal, time types, Option, collections, maps, nested
classes — each with empty/edge rows (FIXTURES.md F2)."""

from __future__ import annotations

import datetime
import decimal
from dataclasses import dataclass, field
from typing import Optional

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from colcrush.engine import decode_table, encode_table
from colcrush.sources.typed import read_typed, read_typed_df, schema_for, write_typed


@dataclass(frozen=True)
class Nested:
    x: int
    s: str


@dataclass(frozen=True)
class Full:
    i: int
    f: float
    s: str
    b: bool
    raw: bytes
    dec: decimal.Decimal
    ts: datetime.datetime
    dt: datetime.date
    opt: Optional[int]
    tags: list[str]
    scores: dict[str, float]
    nested: Nested
    nested_opt: Optional[Nested]


ROWS = [
    Full(
        i=0, f=0.0, s="", b=True, raw=b"", dec=decimal.Decimal("0"),
        ts=datetime.datetime(1970, 1, 1), dt=datetime.date(1970, 1, 1),
        opt=None, tags=[], scores={}, nested=Nested(1, "a"), nested_opt=None,
    ),
    Full(
        i=-(2**62), f=-1.5, s="ünïcode λ", b=False, raw=b"\x00\xff",
        dec=decimal.Decimal("12345678901234567890.123456789012345678"),
        ts=datetime.datetime(2024, 2, 29, 23, 59, 59, 999999),
        dt=datetime.date(2200, 12, 31), opt=42,
        tags=["a", "b", "a"], scores={"k": 1.5, "j": -0.25},
        nested=Nested(-7, "zz"), nested_opt=Nested(9, "y"),
    ),
]


def test_schema_derivation():
    s = schema_for(Full)
    by_name = {f.name: f for f in s.fields}
    assert isinstance(by_name["i"].dataType, T.LongType)
    assert isinstance(by_name["dec"].dataType, T.DecimalType)
    assert by_name["dec"].dataType.scale == 18  # DecimalFormat.scala:21-26
    assert by_name["opt"].nullable is True  # Option[T] -> optional
    assert by_name["i"].nullable is False
    assert isinstance(by_name["tags"].dataType, T.ArrayType)
    assert isinstance(by_name["scores"].dataType, T.MapType)
    assert isinstance(by_name["nested"].dataType, T.StructType)


def test_typed_write_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "typed")
    write_typed(ROWS, spark, p)
    back = read_typed(spark, p, Full)
    assert sorted(back, key=lambda r: r.i) == sorted(ROWS, key=lambda r: r.i)


def test_iter_typed_lazy_roundtrip(spark, tmp_path):
    """iter_typed: the bounded-memory analog of the reference's LAZY
    ParquetIterable (ParquetIterable.scala:207-220) — a generator over
    toLocalIterator, never a driver-side list. Yields the same records
    as read_typed; partial consumption just abandons the generator."""
    import inspect

    from colcrush.sources.typed import iter_typed

    p = str(tmp_path / "typed")
    write_typed(ROWS, spark, p)
    it = iter_typed(spark, p, Full)
    assert inspect.isgenerator(it)
    got = list(it)
    assert sorted(got, key=lambda r: r.i) == sorted(ROWS, key=lambda r: r.i)
    # partial consumption: take one record and walk away
    first = next(iter_typed(spark, p, Full))
    assert first in ROWS


def test_typed_projection(spark, tmp_path):
    @dataclass(frozen=True)
    class Proj:
        i: int
        s: str

    p = str(tmp_path / "typed")
    write_typed(ROWS, spark, p)
    projected = read_typed_df(spark, p, Proj)
    assert projected.columns == ["i", "s"]
    got = {r.i for r in read_typed(spark, p, Proj)}
    assert got == {0, -(2**62)}


def test_typed_through_codec_engine(spark, tmp_path):
    """F2 matrix through the ENGINE: every derived type must survive
    the chunk codec round trip (decimal/map/struct go via IPC)."""
    p = str(tmp_path / "typed")
    write_typed(ROWS, spark, p)
    df = spark.read.parquet(p)
    enc = encode_table(df, group_cols=["b"], target_chunk_rows=16)
    dec = decode_table(enc, df.schema)

    def comparable(d):  # set ops reject MAP columns; sort entries instead
        return d.withColumn("scores", F.array_sort(F.map_entries("scores")))

    a, b = comparable(df), comparable(dec)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
