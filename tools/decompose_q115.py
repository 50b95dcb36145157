#!/usr/bin/env python
"""Controlled decomposition of q115_column_stats (r11 VERDICT "what's
wrong" #1 / task #2): where do the ~3-4 s go, and does an
unpivot-first two-phase distinct beat the EXPAND x5 multi-distinct?

Stages timed (3 reps each, steady-state min, noop sink):
  A  scan+repartition only (count)           — the floor every variant pays
  B  one agg, NO distincts (n/nn/min/max)    — the cheap half of the stats
  C  CURRENT plan: single agg with 5 count(DISTINCT) (EXPAND x5)
  D  candidate: B + narrow unpivot (cid, v-string) -> two-phase
     distinct -> 5-row NDV join (2 scans, but no EXPAND and no
     22-buffer agg state on the x5-replicated rows)

Usage: python tools/decompose_q115.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.plans import REGISTRY
from fluvio_demo_apps_rust_spark.plans.base import load
from fluvio_demo_apps_rust_spark.session import get_spark


def _time(df_fn, reps: int = 3) -> float:
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("decompose_q115")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    par = spark.sparkContext.defaultParallelism

    def base():
        li = load(spark, sf_dir, "lineitem").repartition(par)
        return li.select(
            "l_orderkey",
            "l_suppkey",
            "l_returnflag",
            "l_extendedprice",
            "l_shipdate",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )

    def stage_a():
        return base().agg(F.count(F.lit(1)).alias("n"))

    def agg_no_distinct(b):
        return b.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("l_orderkey").alias("nn_ok"),
            F.min("l_orderkey").cast("string").alias("mn_ok"),
            F.max("l_orderkey").cast("string").alias("mx_ok"),
            F.count("l_suppkey").alias("nn_sk"),
            F.min("l_suppkey").cast("string").alias("mn_sk"),
            F.max("l_suppkey").cast("string").alias("mx_sk"),
            F.count("l_returnflag").alias("nn_rf"),
            F.min("l_returnflag").alias("mn_rf"),
            F.max("l_returnflag").alias("mx_rf"),
            F.count("l_extendedprice").alias("nn_ep"),
            F.min("cents").cast("string").alias("mn_ep"),
            F.max("cents").cast("string").alias("mx_ep"),
            F.count("l_shipdate").alias("nn_sd"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("mn_sd"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("mx_sd"),
        )

    def stage_b():
        return agg_no_distinct(base())

    def stage_c():
        return REGISTRY["q115_column_stats"].fn(spark, sf_dir)

    def ndv_unpivot(b):
        u = b.selectExpr(
            """stack(5,
               0, CAST(l_orderkey AS STRING),
               1, CAST(l_suppkey AS STRING),
               2, l_returnflag,
               3, CAST(cents AS STRING),
               4, CAST(l_shipdate AS STRING)
             ) AS (cid, v)"""
        ).where(F.col("v").isNotNull())
        return (
            u.groupBy("cid", "v")
            .agg(F.lit(1))
            .groupBy("cid")
            .agg(F.count(F.lit(1)).cast("long").alias("ndv"))
        )

    def stage_d():
        b = agg_no_distinct(base())
        ndv = ndv_unpivot(base())
        # no broadcast hint: AQE sizes the 1-row aggregate at runtime
        # (the plans/ lint forbids hinting over sf-linear scans; keep the
        # measurement tool free of the pattern too — r12 ADVICE)
        return ndv.crossJoin(b)

    def stage_d_ndv_only():
        return ndv_unpivot(base())

    def stage_e():
        # EXPAND x5 multi-distinct but with ONLY the 5 distinct buffers
        # (min/max/count split into the cheap B agg): isolates how much
        # of C is the 22-buffer agg state riding the x5-replicated rows
        b = agg_no_distinct(base())
        ndv = base().agg(
            F.countDistinct("l_orderkey").alias("ndv_ok"),
            F.countDistinct("l_suppkey").alias("ndv_sk"),
            F.countDistinct("l_returnflag").alias("ndv_rf"),
            F.countDistinct("cents").alias("ndv_ep"),
            F.countDistinct("l_shipdate").alias("ndv_sd"),
        )
        # no broadcast hint: AQE sizes the 1-row aggregate at runtime
        # (the plans/ lint forbids hinting over sf-linear scans; keep the
        # measurement tool free of the pattern too — r12 ADVICE)
        return ndv.crossJoin(b)

    out = {
        "sf_dir": sf_dir,
        "A_scan_repartition": _time(stage_a),
        "B_agg_no_distinct": _time(stage_b),
        "C_current_expand_x5": _time(stage_c),
        "D_ndv_unpivot_only": _time(stage_d_ndv_only),
        "D_full_unpivot_plan": _time(stage_d),
        "E_split_expand_distinct_only": _time(stage_e),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
