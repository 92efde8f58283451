"""Decode CPU decomposition: machinery floor vs codec cost, pinned.

Decode-side twin of scripts/encode_cpu_decomp.py — gives the restated
decode gate (Spark-free worker replay, profile_decode_worker.py) the
same machinery-floor ceiling the encode side has:

- FULL  = decode_table plan over a PERSISTED dataset (manifest scan +
          column pruning + chunk_id shuffle + arrow IPC + REAL decode
          worker incl. checksum verify) -> noop sink, tree CPU-seconds.
- NOOP  = the SAME pruned/shuffled plan with a worker that only counts
          rows — everything the read path pays EXCEPT the decode. raw
          bytes / noop_cpu is the per-CPU throughput of a hypothetical
          ZERO-cost decoder: the machinery ceiling.
- The decoder's own cost is measured separately, Spark-free, by
  scripts/profile_decode_worker.py replaying the real worker over the
  real pruned stream.

The dataset is encoded ONCE per child (setup, not timed); pairs then
interleave (full, noop) on the identical on-disk input. Protocol
matches the encode twin: taskset-pinned to 8 CPUs, first pair
discarded (JIT warm-up), per-pair ratio + min-CPU summary — single
unpinned walls are not comparable on this hypervisor-bursty host
(CLAUDE.md).

COLCRUSH_PROFILE selects the encode profile of the fixture dataset
(default 'balanced'); run with COLCRUSH_PROFILE=archive to measure
what the zstd entropy layer costs at decode time — the other half of
the compression Pareto (VERDICT r7 #1).

Usage: python scripts/decode_cpu_decomp.py [pairs] [rows]
Appends one JSON line to BENCH/history_decode_decomp.jsonl and prints
it.
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
import os, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
import pyarrow as pa
import pyspark.sql.functions as F
from colcrush.engine import write_encoded
from colcrush.engine.dataset import read_chunks, read_schema
from colcrush.engine.decoder import decode_prepare
from colcrush.fixtures import source_code_df
from colcrush.session import get_spark
from bench import _tree_cpu_sec

profile = os.environ.get("COLCRUSH_PROFILE", "balanced")
spark = get_spark("decode-decomp", cores=8, driver_memory="48g")
src = source_code_df(spark, %(rows)d, n_repos=50)
raw = src.agg(F.sum(
    F.octet_length("content") + F.octet_length("repo")
    + F.octet_length("path") + F.octet_length("commit")
    + F.octet_length("lang")
)).collect()[0][0]
tmp = tempfile.mkdtemp(prefix="colcrush_decdecomp_")
ds = os.path.join(tmp, "ds")
# setup (untimed): one persisted dataset, the identical input for
# every (full, noop) pair
write_encoded(src, ds, mode="overwrite", group_cols=["repo", "lang"],
              profile=profile)
schema = read_schema(ds)

def noop(it):
    pa.set_cpu_count(1)
    n = 0
    for b in it:
        n += b.num_rows
    yield pa.record_batch([pa.array([n], type=pa.int64())], names=["n_rows"])

def run(tag):
    cpu0 = _tree_cpu_sec(); t0 = time.time()
    pruned, fn, out_schema = decode_prepare(read_chunks(spark, ds), schema)
    worker = fn if tag == "full" else noop
    ddl = out_schema if tag == "full" else "n_rows bigint"
    pruned.mapInArrow(worker, ddl).write.format("noop").mode("overwrite").save()
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
    {"raw_bytes": int(raw), "profile": profile, "pairs": pairs}))
shutil.rmtree(tmp, ignore_errors=True)
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

    raw = rec["raw_bytes"]
    pairs = rec["pairs"]
    full_min = min(p["full_cpu"] for p in pairs)
    noop_min = min(p["noop_cpu"] for p in pairs)
    ratios = sorted(p["full_cpu"] / p["noop_cpu"] for p in pairs)
    summary = {
        "kind": "decode_cpu_decomp",
        "profile": rec["profile"],
        "rows": rows,
        "n_pairs": len(pairs),
        "raw_bytes": raw,
        "full_cpu_min": full_min,
        "noop_cpu_min": noop_min,
        "full_mbps_raw_per_cpu": round(raw / full_min / 1e6, 1),
        # the machinery floor: per-CPU throughput of a ZERO-cost decoder
        "machinery_ceiling_mbps_per_cpu": round(raw / noop_min / 1e6, 1),
        "decode_cpu_implied": round(full_min - noop_min, 2),
        "full_over_noop_median": round(ratios[len(ratios) // 2], 3),
        "pairs": pairs,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    hist = os.path.join(repo, "BENCH", "history_decode_decomp.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
