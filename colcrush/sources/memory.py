"""In-memory parquet round trip — parquet4s InMemoryInputFile /
InMemoryOutputFile parity (/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/InMemoryOutputFile.scala:27-60).

Re-expressed with pyarrow buffers — the same primitive the engine's
chunk encoder uses inside workers (SURVEY.md §2.1: "exactly what our
per-chunk encoder uses")."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def table_to_bytes(tbl: pa.Table, **writer_opts) -> bytes:
    sink = pa.BufferOutputStream()
    pq.write_table(tbl, sink, **writer_opts)
    return sink.getvalue().to_pybytes()


def bytes_to_table(data: bytes, columns=None) -> pa.Table:
    return pq.read_table(pa.BufferReader(data), columns=columns)
