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
    """Type-faithful canonicalization, mirroring the driver's hash.

    The r3 driver distinguished float ``3.0`` from int ``3`` (q70) and a
    DuckDB HUGEINT/Decimal from a BIGINT (q77) while this mirror's old
    int-collapsing / 9dp-rounding canon did not — both failures were
    invisible locally. So: floats render as full ``repr`` (never
    collapsed to int, never rounded), Decimals render distinctly from
    both int and float, ints stay bare. Any cross-type agreement must
    now come from the query aligning its types, not from the canon.
    """
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # '3.0' stays '3.0'; full shortest-repr precision
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
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
            # Arrow fetch is the type-faithful path: HUGEINT arrives as
            # decimal128 (q77's driver-only failure class), not a silently
            # int-collapsed fetchall() value.
            o_tbl = res.arrow()
            o_rows = [
                tuple(row[c] for c in o_cols) for row in o_tbl.to_pylist()
            ]
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

    checked = len([n for n in REGISTRY if not only or n in only])
    print(f"\n{checked - len(failures)}/{checked} queries pass"
          + ("" if not only else f" (filtered from {len(REGISTRY)} registered)"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
