"""Spark-free host co-residency contention probe.

Runs the identical FSST encode workload (colcrush kernels over fixture
source-code content) as K concurrent *independent processes* — no
Spark, no shared state, no synchronization — and reports per-copy CPU
seconds at K=1 vs K=8.

Purpose: attribute the 4N-level CPU inflation seen in
scripts/scaling_bench.py. If per-copy CPU inflates when 8 copies
co-run, the inflation is host-level (hypervisor scheduling + shared
memory hierarchy of ONE box), not parallel overhead in the encode job.
On a real cluster the N-vs-4N comparison adds 4x *nodes* — each
executor brings its own memory channels — so this artifact does not
transfer; the sandbox proxy conflates cores-on-one-box with executors.

Measured on this host (2026-08-16): per-copy CPU inflation at K=8 of
x1.01-x1.17 depending on the measurement window, matching the
scaling bench's window-dependent work-efficiency spread (0.84-0.998).

Usage: python scripts/contention_probe.py [trials]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from colcrush.codecs import fsst
from colcrush.fixtures import source_code_table

tab = source_code_table(12000, n_repos=8)
content = b"".join(
    (v or "").encode() for v in tab.column("content").to_pylist()
)
shards = [
    content[i : i + (2 << 20)]
    for i in range(0, min(len(content), 40 << 20), 2 << 20)
]
t = os.times()
cpu0 = t.user + t.system
w0 = time.time()
for blob in shards * 6:
    table = fsst.train(blob)
    fsst.compress(blob, table)
t = os.times()
print(f"cpu={t.user + t.system - cpu0:.2f} wall={time.time() - w0:.2f}")
"""


def run_k(k: int) -> tuple[float, float]:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO}],
            stdout=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )
        for _ in range(k)
    ]
    outs = [p.communicate()[0].strip() for p in procs]
    cpus = [float(o.split()[0].split("=")[1]) for o in outs]
    walls = [float(o.split()[1].split("=")[1]) for o in outs]
    return sum(cpus) / k, sum(walls) / k


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for trial in range(trials):
        c1, w1 = run_k(1)
        c8, w8 = run_k(8)
        print(
            f"trial {trial}: K=1 cpu/copy={c1:.2f} wall={w1:.2f} | "
            f"K=8 cpu/copy={c8:.2f} wall={w8:.2f} | "
            f"cpu inflation x{c8 / c1:.2f}"
        )


if __name__ == "__main__":
    main()
