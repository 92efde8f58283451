"""Encode CPU decomposition: machinery floor vs codec cost, pinned.

Settles the >=35 MB/s/cpu exec8 encode question with a measured
decomposition instead of another unpinned wall number:

- FULL  = encode_table plan (scan + salt histogram + shuffle + sort +
          arrow IPC + REAL worker) -> noop sink, tree CPU-seconds.
- NOOP  = the SAME prepared plan with a worker that only counts rows —
          everything the engine pays EXCEPT the codec. This is the
          machinery floor: content_bytes / noop_cpu is the per-CPU
          throughput of a hypothetical ZERO-cost codec.
- The codec's own cost is measured separately, Spark-free, by
  scripts/profile_worker.py replaying the real worker over the real
  prepared stream.

Protocol: interleaved (full, noop) pairs, taskset-pinned to 8 CPUs
(the executor shape), first pair discarded (JIT warm-up), per-pair
ratio + min-CPU summary — single unpinned walls are not comparable on
this hypervisor-bursty host (CLAUDE.md).

Usage: python scripts/encode_cpu_decomp.py [pairs] [rows]
(pins itself via taskset when available). Appends one JSON line to
BENCH/history_decomp.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import pyarrow as pa
import pyspark.sql.functions as F
from colcrush.engine.encoder import encode_prepare, ENCODED_DDL
from colcrush.fixtures import source_code_df
from colcrush.session import get_spark
from bench import _tree_cpu_sec

spark = get_spark("encode-decomp", cores=8, driver_memory="48g")
src = source_code_df(spark, %(rows)d, n_repos=50).cache()
content = src.agg(F.sum(F.octet_length("content"))).collect()[0][0]

def noop(it):
    pa.set_cpu_count(1)
    n = 0
    for b in it:
        n += b.num_rows
    yield pa.record_batch([pa.array([n], type=pa.int64())], names=["n_rows"])

def run(tag):
    cpu0 = _tree_cpu_sec(); t0 = time.time()
    prepared, fn = encode_prepare(src, group_cols=["repo", "lang"])
    worker = fn if tag == "full" else noop
    ddl = ENCODED_DDL if tag == "full" else "n_rows bigint"
    prepared.mapInArrow(worker, ddl).write.format("noop").mode("overwrite").save()
    return _tree_cpu_sec() - cpu0, time.time() - t0

run("full"); run("noop")  # warm-up pair (JIT, worker spawn) — discarded
pairs = []
for _ in range(%(pairs)d):
    fc, fw = run("full")
    nc, nw = run("noop")
    pairs.append({"full_cpu": round(fc, 2), "noop_cpu": round(nc, 2),
                  "full_wall": round(fw, 2), "noop_wall": round(nw, 2)})
    print("PAIR " + __import__("json").dumps(pairs[-1]), flush=True)
print("RESULT " + __import__("json").dumps(
    {"content_bytes": int(content), "pairs": pairs}))
"""


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 120000
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD % {"repo": repo, "rows": rows, "pairs": n_pairs}
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset") and (os.cpu_count() or 0) >= 8:
        cmd = ["taskset", "-c", "0-7"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    rec = None
    for line in out.stdout.splitlines():
        if line.startswith("PAIR "):
            print(line)
        if line.startswith("RESULT "):
            rec = json.loads(line[7:])
    if rec is None:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit("no RESULT line from child")

    content = rec["content_bytes"]
    pairs = rec["pairs"]
    full_min = min(p["full_cpu"] for p in pairs)
    noop_min = min(p["noop_cpu"] for p in pairs)
    ratios = sorted(p["full_cpu"] / p["noop_cpu"] for p in pairs)
    summary = {
        "kind": "encode_cpu_decomp",
        "rows": rows,
        "n_pairs": len(pairs),
        "content_bytes": content,
        "full_cpu_min": full_min,
        "noop_cpu_min": noop_min,
        "full_mbps_per_cpu": round(content / full_min / 1e6, 1),
        # the machinery floor: per-CPU throughput of a ZERO-cost codec
        "machinery_ceiling_mbps_per_cpu": round(content / noop_min / 1e6, 1),
        "codec_cpu_implied": round(full_min - noop_min, 2),
        "full_over_noop_median": round(ratios[len(ratios) // 2], 3),
        "pairs": pairs,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    hist = os.path.join(repo, "BENCH", "history_decomp.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
