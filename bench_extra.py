"""Per-query isolation bench (guide §1.4): times individual headline
queries against the noop sink with interleaved repeats, reporting
min/median wall AND process-tree CPU seconds — the throttle-proof pair
this host needs (CLAUDE.md: hypervisor grants swing ~1-8 cores).

Does NOT replace bench.py (the frozen driver contract): this file
exists for optimization work — isolating one query's cost, comparing
before/after within one session, and attributing wall vs CPU.

Usage:
    python bench_extra.py [query ...]          # default: all headline
    COLCRUSH_BENCH_ROUNDS=5 python bench_extra.py simhash_dedup
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, _tree_cpu_sec
from colcrush.queries import QUERIES, bloom_fixture_paths, bloom_lookup_targets
from colcrush.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("COLCRUSH_BENCH_ROUNDS", "3"))
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("colcrush-bench-extra", cores=cpus, driver_memory="48g")

    # same untimed setup as bench.py
    QUERIES["roundtrip_documents_sha"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    bloom_fixture_paths(spark, sf_dir)
    bloom_lookup_targets(spark, sf_dir)

    walls: dict[str, list[float]] = {n: [] for n in names}
    cpus_: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"{name}[{r}]")
            c0 = _tree_cpu_sec()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[name].append(time.time() - t0)
            cpus_[name].append(_tree_cpu_sec() - c0)
    out = {}
    for name in names:
        ws, cs = sorted(walls[name]), sorted(cpus_[name])
        out[name] = {
            "wall_min": round(ws[0], 3),
            "wall_med": round(ws[len(ws) // 2], 3),
            "cpu_min": round(cs[0], 2),
        }
        print(
            f"{name:30s} wall_min={ws[0]:7.3f} wall_med={ws[len(ws)//2]:7.3f} "
            f"cpu_min={cs[0]:7.2f}",
            flush=True,
        )
    print("EXTRA " + json.dumps({"sf": sf_dir, "rounds": rounds, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
