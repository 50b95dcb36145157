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

r13-opt (guide §1.2 "remove unnecessary passes"): the narrowing is
MULTI-RANK — one histogram pass per level serves every requested rank
(the next level scans the union of hit-bin ranges), and the total
count n is the pass-1 histogram total, so callers need no separate
count job. q101 (both middle order statistics) dropped from 7 full
passes (count + 2 × 3-pass selections) to 3; grouped_kth derives the
per-group counts from the binned histogram by window instead of a
second corpus scan.
"""

from __future__ import annotations

from typing import Callable, Sequence

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


def _range_filter(df: DataFrame, ranges: list[tuple[int, int]]) -> DataFrame:
    """Filter to the union of half-open cent ranges [lo, hi). Bounds as
    raw-column predicates -> parquet pushdown. One cent of slack each
    side makes the raw bounds sign-agnostic (lo/hi may be negative);
    the exact cents predicate does the real cut."""
    cond = None
    for lo, hi in ranges:
        c = (
            (F.col("x") >= F.lit((lo - 1) / 100.0))
            & (F.col("x") < F.lit((hi + 1) / 100.0))
            & (_cents(F.col("x")) >= lo)
            & (_cents(F.col("x")) < hi)
        )
        cond = c if cond is None else (cond | c)
    return df.where(cond)


def selection_kths(
    df: DataFrame,
    col: str,
    ks: Sequence[int] | None = None,
    k_of_n: Callable[[int], Sequence[int]] | None = None,
) -> tuple[int, dict[int, float]]:
    """Exact k-th smallest (1-based) of a 2-dp double column for
    SEVERAL ranks in one shared three-pass narrowing: each histogram
    pass serves every rank (the next pass scans the union of the
    hit-bin ranges), so adjacent order statistics (lower/upper median)
    cost the same passes as one. ``k_of_n`` derives the ranks from the
    total count n — n itself is the pass-1 histogram total, so no
    separate count job runs. Returns ``(n, {k: value})``; values carry
    the original 2-dp scale. Raises if any k is out of range."""
    x = F.col(col)
    remaining = df.select(x.alias("x")).where(x.isNotNull())
    n: int | None = None
    # per rank: remaining target within its current range
    targets: dict[int, int] = {}
    if ks is not None:
        for k in ks:
            if k < 1:
                raise ValueError(f"k must be >= 1, got {k}")
        targets = {k: k for k in ks}
    bounds: dict[int, tuple[int, int]] | None = None  # k -> [lo, hi) cents
    for width in (1_000_000, 10_000):
        hist = sorted(
            remaining.groupBy(_bin(_cents(F.col("x")), width).alias("b"))
            .agg(F.count("*").alias("c"))
            .collect(),  # bounded: value-range / width bins, never rows
            key=lambda r: r.b,
        )
        if n is None:
            n = sum(r.c for r in hist)
            if k_of_n is not None:
                ks = list(k_of_n(n))
                for k in ks:
                    if k < 1:
                        raise ValueError(f"k must be >= 1, got {k}")
                targets = {k: k for k in ks}
        new_bounds: dict[int, tuple[int, int]] = {}
        for k in list(targets):
            lo_k, hi_k = bounds[k] if bounds is not None else (None, None)
            cum = 0
            hit = None
            for r in hist:
                if lo_k is not None and not (lo_k <= r.b * width < hi_k):
                    continue
                if cum + r.c >= targets[k]:
                    hit = r.b
                    targets[k] -= cum
                    break
                cum += r.c
            if hit is None:
                raise ValueError(f"k={k} exceeds row count")
            new_bounds[k] = (hit * width, (hit + 1) * width)
        bounds = new_bounds
        remaining = _range_filter(remaining, sorted(set(bounds.values())))
    # final: exact value-count histogram inside the union of 100-unit
    # ranges (one more bounded collect serves every rank)
    vals = sorted(
        remaining.groupBy(_cents(F.col("x")).alias("v"))
        .agg(F.count("*").alias("c"))
        .collect(),  # <= ranges * width distinct cent values, bounded
        key=lambda r: r.v,
    )
    out: dict[int, float] = {}
    for k in list(targets):
        lo_k, hi_k = bounds[k]
        cum = 0
        for r in vals:
            if not (lo_k <= r.v < hi_k):
                continue
            if cum + r.c >= targets[k]:
                out[k] = r.v / 100.0
                break
            cum += r.c
        if k not in out:
            raise ValueError(f"k={k} exceeds row count")  # pragma: no cover
    return n, out


def selection_kth(df: DataFrame, col: str, k: int) -> float:
    """Exact k-th smallest (1-based) of a 2-dp double column — the
    single-rank face of :func:`selection_kths`."""
    _, vals = selection_kths(df, col, ks=[k])
    return vals[k]


def grouped_binned(
    df: DataFrame, group_col: str, col: str, width: int = 10_000
) -> tuple[DataFrame, DataFrame]:
    """The shared first stage of grouped selection: ``base`` is the
    (grp, v-cents) projection, ``binned`` the (grp, bin, count)
    histogram — one corpus scan, one shuffle. Exposed so a caller that
    needs BOTH a grouped and a global statistic (q105) can aggregate
    the same histogram twice instead of re-scanning the corpus."""
    g = F.col(group_col)
    x = F.col(col)
    base = df.select(g.alias("grp"), _cents(x).alias("v")).where(x.isNotNull())
    binned = base.groupBy("grp", _bin(F.col("v"), width).alias("b")).agg(
        F.count("*").alias("c")
    )
    return base, binned


def grouped_kth_from(
    base: DataFrame, binned: DataFrame, k_expr, width: int = 10_000
) -> DataFrame:
    """Finish grouped selection from an existing (grp, bin, count)
    histogram (see :func:`grouped_binned`). Per-group totals n come
    from an unordered window over the SAME partition key as the
    running total (r13-opt: no second corpus scan, no count join —
    both windows share one exchange), so pass 2's corpus scan is the
    only other data pass."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("b")
    wn = Window.partitionBy("grp")
    cum = (
        binned.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wn))
        .withColumn("k", k_expr(F.col("n")).cast("long"))
    )
    hit = cum.where(
        (F.col("cum") >= F.col("k")) & (F.col("cum") - F.col("c") < F.col("k"))
    ).select("grp", "b", "n", (F.col("k") - (F.col("cum") - F.col("c"))).alias("r"))

    fine = (
        base.join(hit.select("grp", "b", "n", "r"), "grp")
        .where(_bin(F.col("v"), width) == F.col("b"))
        .groupBy("grp", "n", "r", "v")
        .agg(F.count("*").alias("c"))
    )
    w2 = Window.partitionBy("grp").orderBy("v")
    return (
        fine.withColumn("cum", F.sum("c").over(w2))
        .where((F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("c") < F.col("r")))
        .select("grp", "n", (F.col("v") / 100.0).alias("value"))
    )


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
    AND per-group n (two windows over the bin histogram sharing one
    exchange) -> the bin holding rank k and the local rank within it.
    Pass 2: exact cent-value counts inside ONLY the hit bins
    (semi-join keeps the scan pruned) -> same running-total trick
    picks the exact value. Bin widths bound every per-group window to
    value-range/width rows regardless of data size."""
    base, binned = grouped_binned(df, group_col, col)
    return grouped_kth_from(base, binned, k_expr)


def kth_from_binned(
    base: DataFrame, binned: DataFrame, k_of_n: Callable[[int], int], width: int = 10_000
) -> tuple[int, float]:
    """GLOBAL exact k-th from an existing (grp, bin, count) histogram
    (see :func:`grouped_binned`): the global bin histogram is the
    group histogram re-aggregated — a driver-side collect of bounded
    histogram rows, NO corpus scan — then one fine scan of the hit
    bin finishes exactly. Returns (n, value)."""
    hist = sorted(
        binned.groupBy("b").agg(F.sum("c").alias("c")).collect(),
        key=lambda r: r.b,
    )
    n = sum(r.c for r in hist)
    k = k_of_n(n)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cum = 0
    hit = None
    for r in hist:
        if cum + r.c >= k:
            hit = r.b
            k -= cum
            break
        cum += r.c
    if hit is None:
        raise ValueError("k exceeds row count")
    lo, hi = hit * width, (hit + 1) * width
    vals = sorted(
        base.where((F.col("v") >= lo) & (F.col("v") < hi))
        .groupBy("v")
        .agg(F.count("*").alias("c"))
        .collect(),  # <= width distinct cent values, bounded
        key=lambda r: r.v,
    )
    cum = 0
    for r in vals:
        if cum + r.c >= k:
            return n, r.v / 100.0
        cum += r.c
    raise ValueError("k exceeds row count")  # pragma: no cover
