#!/usr/bin/env python
"""Time the DuckDB oracle SQL for every bench query at the same SF —
the denominator of the bench-vs-baseline ratio. Same adaptive-min
method as bench.py so the two JSON lines are directly comparable."""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from bench import BENCH_QUERIES
from fluvio_demo_apps_rust_spark.plans import REGISTRY

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        # DuckDB binds CREATE VIEW eagerly — skip absent tables so one
        # missing parquet can't abort the whole run before any timing.
        if not Path(f"{sf_dir}/{t}.parquet").exists():
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    times: dict[str, object] = {}
    for name in BENCH_QUERIES:
        # progress to stderr (stdout stays one parseable JSON line):
        # a pathological oracle is findable without killing the run
        print(name, file=sys.stderr, flush=True)
        sql = REGISTRY[name].oracle
        if not sql:
            times[name] = {"err": "no oracle"}
            continue
        runs: list[float] = []
        try:
            while len(runs) < 5:
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
                s = sorted(runs)
                if len(runs) >= 2 and (s[0] < 0.2 or (s[1] - s[0]) / s[0] <= 0.3):
                    break
            times[name] = round(min(runs), 3)
        except Exception as exc:  # noqa: BLE001
            times[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
    ok = {k: v for k, v in times.items() if isinstance(v, float)}
    m = re.search(r"sf([0-9.]+)", sf_dir)
    print(
        json.dumps(
            {
                "metric": "DuckDB oracle wall time, same queries/method as bench.py",
                "value": round(sum(ok.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(m.group(1)) if m else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
