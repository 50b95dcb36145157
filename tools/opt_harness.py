#!/usr/bin/env python
"""Round-13 optimization harness: time single queries (noop sink,
steady-state min of N runs) and dump formatted plans to plans/r13/.

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

PLANS_DIR = Path(__file__).resolve().parent.parent / "plans" / "r13"


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
    args = ap.parse_args()

    spark = get_spark("opt_harness")
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "explain":
        import re

        PLANS_DIR.mkdir(parents=True, exist_ok=True)
        for name in args.queries:
            df = REGISTRY[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            plan = re.sub(r"#\d+L?", "#x", plan)
            plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
            out = PLANS_DIR / f"{name}_{args.suffix}.txt"
            out.write_text(plan)
            print(f"wrote {out}")
        return 0

    warm(spark)
    results = {}
    for name in args.queries:
        spec = REGISTRY[name]
        runs = []
        for _ in range(args.runs):
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
        results[name] = runs
        print(f"{name}: min={min(runs):.3f}  runs={[round(r, 3) for r in runs]}",
              flush=True)
    print("== summary ==")
    for name, runs in results.items():
        print(f"{name}: {min(runs):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
