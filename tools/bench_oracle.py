#!/usr/bin/env python
"""DuckDB side of the benchmark: runs each BENCH query's own oracle
SQL (the same statements the correctness gate uses) on the sf0.1
parquet with all host threads, min of 2 runs, and prints one JSON
line — the reproducible source of BASELINE.md's comparison column.

Queries with no oracle (rows-only streaming checks) are skipped.

Usage: python tools/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402
from fluvio_demo_apps_rust_spark.plans import REGISTRY  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "DuckDB oracle wall time for the BENCH queries (min of 2)",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf_dir": sf_dir,
                "threads": os.cpu_count(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
