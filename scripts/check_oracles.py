"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given SF, compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from colcrush.queries import ORACLES, QUERIES
from colcrush.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def row_key(row, cols_sorted, colidx):
    return tuple(norm(row[colidx[c]]) for c in cols_sorted)


def spark_kind(dtype: str) -> str:
    d = dtype.lower()
    if d.startswith("decimal"):
        return "decimal"
    if d in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if d in ("float", "double"):
        return "float"
    if d.startswith("timestamp"):
        return "ts"
    if d.startswith("array"):
        return "list"
    if d in ("string", "date", "binary", "boolean"):
        return d
    return d


def arrow_kind(t) -> str:
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "boolean"
    return str(t)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            otab = con.execute(ORACLES[name]).arrow()
            ocols = otab.column_names
            orows = [
                tuple(otab.column(i)[j].as_py() for i in range(otab.num_columns))
                for j in range(otab.num_rows)
            ]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue

        msgs = []
        # dtype-kind parity: the driver's value hash is dtype-sensitive
        # (round-1 lesson: DuckDB HUGEINT vs Spark BIGINT hash-mismatched
        # despite identical printed values).
        skinds = {c.lower(): spark_kind(t) for c, t in sdf.dtypes}
        for i, c in enumerate(ocols):
            ok_ = arrow_kind(otab.schema.types[i])
            sk = skinds.get(c.lower())
            if sk is not None and sk != ok_:
                msgs.append(f"dtype kind mismatch on {c}: spark={sk} oracle={ok_}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            msgs.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            msgs.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not msgs:
            cs = sorted(scols, key=str.lower)
            sidx = {c: scols.index(c) for c in scols}
            oidx = {c.lower(): ocols.index(c) for c in ocols}
            a = sorted(row_key(r, cs, sidx) for r in srows)
            b = sorted(
                tuple(norm(r[oidx[c.lower()]]) for c in cs) for r in orows
            )
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if msgs:
            failures.append((name, "; ".join(msgs)))
            print(f"FAIL {name}: {'; '.join(msgs)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, m in failures:
            print(f"  {n}: {m[:300]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
