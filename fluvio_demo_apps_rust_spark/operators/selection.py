"""Exact distributed order statistics by histogram narrowing.

Spark's built-in ``percentile`` (q41) is exact but buffers EVERY value
of the group in executor memory — correct at sf0.1, an OOM at 100 TB.
The scale-correct exact answer is the classic multi-pass SELECTION
algorithm: histogram the column into bounded bins, find the bin
containing the k-th order statistic, recurse into that bin at finer
granularity, and finish on an exact value-count histogram. Each pass
is one hash aggregate over a range-FILTERED scan (the bin bounds are
plain predicates on the raw column, so they push down to parquet);
driver state is one bounded histogram per pass — never the data.

For 2-dp money columns three passes suffice: 10k-unit bins (≤ ~100
rows collected), 100-unit bins within the hit bin (≤ 100 rows), then
exact cent values within a 100-unit range (≤ 10 000 rows, typically
far fewer). At 100 TB the same code holds — pass count grows with
value-range/precision, never with row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _cents(col: Column) -> Column:
    # exact for 2-dp source columns (repo quantization standard)
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _bin(col: Column, width: int) -> Column:
    # FLOOR division, not a truncating cast: (cents/width).cast('long')
    # truncates toward zero, which collapses every cent value in
    # (-width, width) into bin 0 and mis-bins all negatives (r8 ADVICE).
    # floor keeps bins half-open [b*width, (b+1)*width) for any sign.
    return F.floor(col / F.lit(width)).cast("long")


def selection_kth(df: DataFrame, col: str, k: int) -> float:
    """Exact k-th smallest (1-based) of a 2-dp double column, by
    three-pass histogram narrowing. Returns the value as a float with
    the original 2-dp scale. Raises if k is out of range."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    x = F.col(col)
    remaining = df.select(x.alias("x")).where(x.isNotNull())
    target = k
    # pass levels: bin width in cents (10k units, 100 units), then exact
    for width in (1_000_000, 10_000):
        hist = (
            remaining.groupBy(_bin(_cents(F.col("x")), width).alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()  # bounded: value-range / width bins, never rows
        )
        cum = 0
        hit = None
        for r in sorted(hist, key=lambda r: r.b):
            if cum + r.c >= target:
                hit = r.b
                target -= cum
                break
            cum += r.c
        if hit is None:
            raise ValueError(f"k={k} exceeds row count")
        lo, hi = hit * width, (hit + 1) * width
        # bounds as raw-column predicates -> parquet pushdown. One cent
        # of slack each side makes the raw bounds sign-agnostic (lo/hi
        # may be negative); the exact cents predicate does the real cut.
        remaining = remaining.where(
            (F.col("x") >= F.lit((lo - 1) / 100.0)) & (F.col("x") < F.lit((hi + 1) / 100.0))
        ).where((_cents(F.col("x")) >= lo) & (_cents(F.col("x")) < hi))
    # final: exact value-count histogram inside a 100-unit range
    vals = (
        remaining.groupBy(_cents(F.col("x")).alias("v"))
        .agg(F.count("*").alias("c"))
        .collect()  # <= width/1 distinct cent values, bounded
    )
    cum = 0
    for r in sorted(vals, key=lambda r: r.v):
        if cum + r.c >= target:
            return r.v / 100.0
        cum += r.c
    raise ValueError(f"k={k} exceeds row count")  # pragma: no cover


def grouped_kth(
    df: DataFrame,
    group_col: str,
    col: str,
    k_expr,
) -> DataFrame:
    """Exact per-group k-th order statistic, fully distributed — no
    per-group value buffering (Spark's built-in exact ``percentile``)
    and no driver loop: two histogram passes where every window runs
    over per-(group, bin) AGGREGATES, never raw rows.

    ``k_expr(n)`` maps the group's row count (a Column) to the wanted
    1-based rank, e.g. ``lambda n: (n + 1) / 2`` floored for the lower
    median. Returns (group, n, value).

    Pass 1: (group, 100-unit bin) counts -> per-group running total
    (window over the bin histogram) -> the bin holding rank k and the
    local rank within it. Pass 2: exact cent-value counts inside ONLY
    the hit bins (semi-join keeps the scan pruned) -> same
    running-total trick picks the exact value. Bin widths bound every
    per-group window to value-range/width rows regardless of data
    size."""
    from pyspark.sql import Window

    g = F.col(group_col)
    x = F.col(col)
    base = df.select(g.alias("grp"), _cents(x).alias("v")).where(x.isNotNull())

    binned = base.groupBy("grp", _bin(F.col("v"), 10_000).alias("b")).agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("grp").orderBy("b")
    cum = binned.withColumn("cum", F.sum("c").over(w))
    n = base.groupBy("grp").agg(F.count("*").alias("n"))
    want = n.select("grp", "n", k_expr(F.col("n")).cast("long").alias("k"))
    hit = (
        cum.join(want, "grp")
        .where((F.col("cum") >= F.col("k")) & (F.col("cum") - F.col("c") < F.col("k")))
        .select("grp", "b", "n", (F.col("k") - (F.col("cum") - F.col("c"))).alias("r"))
    )

    fine = (
        base.join(hit.select("grp", "b", "n", "r"), "grp")
        .where(_bin(F.col("v"), 10_000) == F.col("b"))
        .groupBy("grp", "n", "r", "v")
        .agg(F.count("*").alias("c"))
    )
    w2 = Window.partitionBy("grp").orderBy("v")
    return (
        fine.withColumn("cum", F.sum("c").over(w2))
        .where((F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("c") < F.col("r")))
        .select("grp", "n", (F.col("v") / 100.0).alias("value"))
    )
