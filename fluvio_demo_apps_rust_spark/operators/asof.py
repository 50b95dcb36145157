"""As-of join — an operator Spark lacks natively (batch API).

``asof_join(left, right, on, left_ts, right_ts)``: for every left row,
attach the latest right row with ``right_ts <= left_ts`` within the
same key group (the classic time-series point-in-time join).

Implementation is the scalable union-tag formulation, NOT the naive
``join + filter + row_number`` (which materializes every candidate
pair): tag both sides, union, sort within key by (ts, tag), and carry
the most recent right payload forward with a running ``max_by``-style
window. One shuffle on the key, zero pair blow-up — the plan a range
join would want at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """Returns left.* plus ``asof_<payload>`` columns from the matched
    right row (latest right_ts <= left_ts per key). ``how='left'``
    keeps unmatched left rows with null payloads."""
    lcols = left.columns
    payload_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *lcols,
    )
    # Right rows sort before left rows at equal timestamps (__side 0 < 1),
    # so a right row AT the left timestamp matches (<= semantics).
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = merged.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__last")[c].alias(f"asof_{c}") for c in right_payload],
        F.col("__last")["__ts"].alias("asof_ts"),
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def range_join_count(
    df: DataFrame, on: str, ts: str, id_col: str, max_gap_seconds: int
) -> DataFrame:
    """Per-key count of ordered row pairs within ``max_gap_seconds`` —
    an equi-key range self-join. The equality key keeps it an
    equi-join (shuffle on the key) with the range as a post-filter;
    at scale add time-bucketing on both sides to bound bucket sizes.
    """
    a = df.select(F.col(on).alias("k"), F.col(ts).alias("ta"), F.col(id_col).alias("a"))
    b = df.select(F.col(on).alias("k"), F.col(ts).alias("tb"), F.col(id_col).alias("b"))
    pairs = a.join(b, "k").filter(
        (F.col("tb") > F.col("ta"))
        & (F.col("tb") <= F.col("ta") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS"))
    )
    return pairs.groupBy("k").agg(F.count(F.lit(1)).alias("pair_cnt"))
