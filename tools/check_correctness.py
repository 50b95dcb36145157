#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
oracle SQL on DuckDB over the same parquet tables; compares row count,
column names, and an order-insensitive value hash (columns sorted by
name, doubles canonicalized). Exit nonzero on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon_cell(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from fluvio_demo_apps_rust_spark.plans import REGISTRY
    from fluvio_demo_apps_rust_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(spec.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            sc, oc = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
            if sc != oc:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sc, oc)) if a != b
                ) if len(sc) == len(oc) else ("-", "-", "-")
                problems.append(f"values differ; first diff {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(s_rows)} rows match oracle")

    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
