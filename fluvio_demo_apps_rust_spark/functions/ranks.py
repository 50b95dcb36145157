"""Distribution-safe global ordering primitives.

A bare ``Window.orderBy(...)`` (empty PARTITION BY) is the classic
100-TB trap: WindowExec moves EVERY row to one partition before
evaluating. These helpers compute the same answers with a two-phase
distributed prefix sum over a DETERMINISTIC fixed-width bucketing
(the sequence_pack / q90-histogram pattern):

1. bucket = ``(key - min) * B DIV (max - min + 1)`` — a monotone
   integer map, so bucket order == key order and equal keys always
   share a bucket;
2. per-bucket row counts (≤ B rows) get their exclusive running
   offsets on a window bounded by the BUCKET COUNT, not the data;
3. the per-row remainder is a window PARTITIONED by bucket — fully
   parallel, each partition ≈ n/B rows for non-degenerate keys.

Deterministic arithmetic bucketing (never ``repartitionByRange``) is
load-bearing: range sampling is seeded per-RDD-instance, so two plan
branches over the same logical repartition can silently disagree on
boundaries unless the physical exchange happens to be reused —
min/max fixed-width buckets cannot disagree between branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_global_rank(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    n_buckets: int = 256,
    out_col: str = "rn",
    total_col: str = "n_total",
) -> DataFrame:
    """Append the global 1-based row number ``out_col`` in
    ``ORDER BY key, *tiebreaks`` order, plus the total row count
    ``total_col``, with no corpus-scale single-partition window.

    ``key`` must be an exact integer column (cents-quantize doubles
    first — a monotone bijection for fixed-dp money columns, so the
    rank order is unchanged). Ranks are only deterministic when
    (key, *tiebreaks) is unique per row, as at every call site.
    """
    mm = df.agg(
        F.min(key).alias("_mn"),
        F.max(key).alias("_mx"),
        F.count(F.lit(1)).alias(total_col),
    )
    b = df.crossJoin(F.broadcast(mm)).withColumn(
        "_bk",
        F.expr(
            f"((CAST({key} AS BIGINT) - _mn) * {n_buckets}) DIV (_mx - _mn + 1)"
        ),
    )
    per = b.groupBy("_bk").agg(F.count(F.lit(1)).alias("_bcnt"))
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        "_bk", F.coalesce(F.sum("_bcnt").over(w_off), F.lit(0)).alias("_boff")
    )
    w_in = Window.partitionBy("_bk").orderBy(key, *tiebreaks)
    return (
        b.join(F.broadcast(offs), "_bk")
        .withColumn(out_col, (F.col("_boff") + F.row_number().over(w_in)).cast("long"))
        .drop("_bk", "_mn", "_mx", "_boff")
    )
