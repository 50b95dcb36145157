"""Bucketed co-located join: the exchange-free plan is the point."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.operators.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.01"


def test_bucketed_join_has_no_exchange_and_matches_plain_join(spark):
    base = Path(tempfile.mkdtemp(prefix="bucketed_"))
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", str(base / "o"), "o_orderkey", nbuckets=8)
    write_bucketed(lineitem, "b_lineitem", str(base / "l"), "o_orderkey", nbuckets=8)
    try:
        # force the merge-join path: a broadcast would hide the layout
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        got = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice") * F.col("l_quantity")), 2).alias("s"),
        ).collect()[0]
        plain = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("o_totalprice") * F.col("l_quantity")), 2).alias("s"),
            )
            .collect()[0]
        )
        assert (got.n, got.s) == (plain.n, plain.s)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_at_scan(spark):
    import tempfile

    from fluvio_demo_apps_rust_spark.operators.bucketed import write_date_partitioned

    base = tempfile.mkdtemp(prefix="parted_")
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("day", F.to_date("ts"))
    )
    write_date_partitioned(ev, base, "day")
    days = [r.day for r in spark.read.parquet(base).select("day").distinct().collect()]
    pick = sorted(days)[0]
    q = spark.read.parquet(base).filter(F.col("day") == F.lit(pick))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    # pruned read returns exactly that day's rows
    expect = ev.filter(F.to_date("ts") == F.lit(pick)).count()
    assert q.count() == expect
