"""Skew operators: salted aggregation / salted join must be
result-identical to their unsalted equivalents (the salt is a pure
physical-distribution rewrite)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # one hot key (0) carrying 90% of rows
    return spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("x", "count"), "s": ("x", "sum"), "mn": ("x", "min"), "mx": ("x", "max")},
            salt=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    probe = _skewed(spark)
    build = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = sorted((r.k, r.x, r.dim) for r in probe.join(build, ["k"]).collect())
    salted = sorted((r.k, r.x, r.dim) for r in salted_join(probe, build, ["k"], salt=4).collect())
    assert salted == plain

    # outer semantics preserved too
    plain_l = sorted(
        (r.k, r.x, r.dim) for r in probe.join(build, ["k"], "left").collect()
    )
    salted_l = sorted(
        (r.k, r.x, r.dim) for r in salted_join(probe, build, ["k"], salt=4, how="left").collect()
    )
    assert salted_l == plain_l
