"""Typed read/write: Python-dataclass schema derivation — the analog of
parquet4s's shapeless case-class derivation
(/root/reference/core/src/main/scala-2.13/com/github/mjakubowski84/parquet4s/ParquetSchemaResolver.scala:83-121,
ParquetRecordEncoder.scala:44, ParquetRecordDecoder.scala:51).

`ParquetReader.as[T]` -> ``read_typed(spark, path, MyClass)``
`ParquetWriter.of[T].writeAndClose` -> ``write_typed(items, spark, path)``
`projectedAs[T]`: the derived schema is passed to spark.read.schema, so
column pruning happens exactly like the reference's projection
(ParquetReader.scala:272-274).
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
from typing import Optional, Union, get_args, get_origin, get_type_hints

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

_PRIMITIVES = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    bytearray: T.BinaryType(),
    datetime.datetime: T.TimestampType(),
    datetime.date: T.DateType(),
    # parquet4s decimal default: scale 18 / precision 38, "aligned with
    # default Apache Spark format" (core/.../DecimalFormat.scala:21-26)
    decimal.Decimal: T.DecimalType(38, 18),
}


def _field_type(py_type) -> tuple[T.DataType, bool]:
    """(spark type, nullable). Option[T] -> nullable (Schema.scala:310)."""
    origin = get_origin(py_type)
    if origin is Union:
        args = [a for a in get_args(py_type) if a is not type(None)]
        if len(args) == 1 and type(None) in get_args(py_type):
            inner, _ = _field_type(args[0])
            return inner, True
        raise TypeError(f"unsupported union {py_type}")
    if origin in (list, set, tuple, frozenset):
        (elem,) = get_args(py_type)[:1] or (str,)
        et, en = _field_type(elem)
        return T.ArrayType(et, containsNull=en), False
    if origin is dict:
        kt_py, vt_py = get_args(py_type)
        kt, _ = _field_type(kt_py)  # map keys required (Schema.scala:329)
        vt, vn = _field_type(vt_py)
        return T.MapType(kt, vt, valueContainsNull=vn), False
    if dataclasses.is_dataclass(py_type):
        return schema_for(py_type), False
    if py_type in _PRIMITIVES:
        return _PRIMITIVES[py_type], False
    raise TypeError(f"cannot derive Spark type for {py_type}")


def schema_for(cls) -> T.StructType:
    """Derive a StructType from a dataclass (compile-time schema
    derivation parity)."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    hints = get_type_hints(cls)
    fields = []
    for f in dataclasses.fields(cls):
        st, nullable = _field_type(hints[f.name])
        fields.append(T.StructField(f.name, st, nullable))
    return T.StructType(fields)


def _to_py(v, py_type):
    origin = get_origin(py_type)
    if v is None:
        return None
    if origin is Union:
        args = [a for a in get_args(py_type) if a is not type(None)]
        return _to_py(v, args[0])
    if origin in (list, tuple):
        (elem,) = get_args(py_type)[:1] or (str,)
        out = [_to_py(x, elem) for x in v]
        return tuple(out) if origin is tuple else out
    if origin in (set, frozenset):
        (elem,) = get_args(py_type)[:1] or (str,)
        return {_to_py(x, elem) for x in v}
    if origin is dict:
        kt, vt = get_args(py_type)
        return {_to_py(k, kt): _to_py(x, vt) for k, x in v.items()}
    if dataclasses.is_dataclass(py_type):
        return _row_to_dataclass(v, py_type)
    if py_type in (bytes, bytearray) and isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _row_to_dataclass(row: Row, cls):
    hints = get_type_hints(cls)
    kwargs = {
        f.name: _to_py(row[f.name], hints[f.name]) for f in dataclasses.fields(cls)
    }
    return cls(**kwargs)


def _dataclass_to_tuple(obj):
    out = []
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            v = _dataclass_to_tuple(v)
        elif isinstance(v, (set, frozenset)):
            v = sorted(v)
        elif isinstance(v, tuple):
            v = list(v)
        out.append(v)
    return tuple(out)


def write_typed(items, spark: SparkSession, path: str, mode: str = "error") -> None:
    """ParquetWriter.of[T].writeAndClose parity."""
    if not items:
        raise ValueError("empty dataset; derive schema requires a class — use write with explicit schema")
    cls = type(items[0])
    df = spark.createDataFrame([_dataclass_to_tuple(i) for i in items], schema_for(cls))
    df.write.mode(mode).parquet(path)


def read_typed_df(spark: SparkSession, path: str, cls) -> DataFrame:
    """projectedAs[T]: enforced projection schema -> column pruning."""
    return spark.read.schema(schema_for(cls)).parquet(path)


def read_typed(spark: SparkSession, path: str, cls) -> list:
    """ParquetReader.as[T].read: materialized typed records.

    Collects the WHOLE dataset to the driver — fine for the
    reference-parity convenience case, wrong for large reads; use
    :func:`iter_typed` for a bounded-memory lazy pass."""
    return [_row_to_dataclass(r, cls) for r in read_typed_df(spark, path, cls).collect()]


def iter_typed(spark: SparkSession, path: str, cls):
    """Lazy typed iteration with bounded driver memory.

    The reference's ParquetIterable is a LAZY closeable iterator
    (ParquetIterable.scala:207-220) — ``read_typed`` matches its
    materialized ``.read`` convenience but not its memory profile.
    This generator streams via ``toLocalIterator``, which holds at
    most one partition's rows on the driver at a time, so a 100 TB
    dataset can be consumed record-by-record. Partial consumption
    simply abandons the generator (Spark tears the fetch down); the
    per-partition jobs run sequentially, so prefer the distributed
    DataFrame API when the work itself can run on the cluster."""
    for r in read_typed_df(spark, path, cls).toLocalIterator():
        yield _row_to_dataclass(r, cls)
