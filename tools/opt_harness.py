#!/usr/bin/env python
"""Optimization harness: time single queries (noop sink,
steady-state min of N runs) and dump formatted plans to plans/<round>/.

Usage:
  python tools/opt_harness.py time <query> [<query>...] [--runs N] [--sf DIR]
  python tools/opt_harness.py explain <query> [...] [--suffix before|after]

Timing methodology matches bench.py (guide §1.4): full compute through
the noop sink, JVM + Python-worker warmup first, min of N runs.
"""

from __future__ import annotations

import argparse
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fluvio_demo_apps_rust_spark.plans import REGISTRY
from fluvio_demo_apps_rust_spark.session import get_spark

PLANS_ROOT = Path(__file__).resolve().parent.parent / "plans"


def session_cpu_seconds() -> float:
    """Sum utime+stime of every live process in THIS login session
    (python driver + the local-mode JVM + pyspark.daemon workers) —
    a co-tenant-steal-resistant measure of work actually done."""
    import os

    sid = os.getsid(0)
    hz = os.sysconf("SC_CLK_TCK")
    total = 0
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # after the comm field: [0]=state, [3]=sid, [11]=utime, [12]=stime
            if int(parts[3]) == sid:
                total += int(parts[11]) + int(parts[12])
        except (OSError, IndexError, ValueError):
            continue
    return total / hz


def warm(spark) -> None:
    spark.range(1000).count()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "explain"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--round", dest="round_dir", default="r14")
    args = ap.parse_args()

    spark = get_spark("opt_harness")
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "explain":
        import re

        plans_dir = PLANS_ROOT / args.round_dir
        plans_dir.mkdir(parents=True, exist_ok=True)
        for name in args.queries:
            df = REGISTRY[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            plan = re.sub(r"#\d+L?", "#x", plan)
            plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
            out = plans_dir / f"{name}_{args.suffix}.txt"
            out.write_text(plan)
            print(f"wrote {out}")
        return 0

    warm(spark)
    results = {}
    for name in args.queries:
        spec = REGISTRY[name]
        runs = []
        cpus = []
        for _ in range(args.runs):
            c0 = session_cpu_seconds()
            t0 = time.perf_counter()
            try:
                spark.sparkContext.setJobDescription(name)
                df = spec.fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
            finally:
                spark.sparkContext.setJobDescription(None)
                df = None
                gc.collect()
            runs.append(time.perf_counter() - t0)
            cpus.append(session_cpu_seconds() - c0)
        results[name] = (runs, cpus)
        print(
            f"{name}: min={min(runs):.3f} cpu_min={min(cpus):.2f}  "
            f"runs={[round(r, 3) for r in runs]} cpu={[round(c, 2) for c in cpus]}",
            flush=True,
        )
    print("== summary ==")
    for name, (runs, cpus) in results.items():
        print(f"{name}: {min(runs):.3f} cpu={min(cpus):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
