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
    if not ranges:  # r13 ADVICE: df.where(None) is an opaque crash
        raise ValueError("_range_filter needs at least one [lo, hi) range")
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


# The exact final pass groups by raw cent value; its collect is
# bounded as long as the remaining span is at most this many cents.
# Deliberately NOT larger: a bigger budget would skip more passes but
# pay for it in driver-side row materialization (measured r14: a
# 100_000 budget cut q118 to 3 passes yet ran ~0.5 s SLOWER at sf0.1
# because the exact collect grew to ~30k Python rows — the pass it
# saved was a cheap scan).
_EXACT_SPAN = 10_000
# Max bins any single histogram collect may produce; a coarse level is
# skipped when the next-finer level alone stays under this bound.
_MAX_BINS = 10_000


def _clipped_span(
    bounds: dict[int, tuple[int, int]] | None, clip: tuple[int, int] | None
) -> int | None:
    """Total cents covered by the union of per-rank ranges, clipped to
    the known [vmin, vmax] value bounds. None = unknown (no pass has
    run and no value_range was given)."""
    if bounds is None:
        return (clip[1] - clip[0] + 1) if clip is not None else None
    total = 0
    for lo, hi in set(bounds.values()):
        if clip is not None:
            lo, hi = max(lo, clip[0]), min(hi, clip[1] + 1)
        total += max(0, hi - lo)
    return total


def selection_kths(
    df: DataFrame,
    col: str,
    ks: Sequence[int] | None = None,
    k_of_n: Callable[[int], Sequence[int]] | None = None,
    value_range: tuple[int, int] | None = None,
    return_stats: bool = False,
) -> tuple[int, dict[int, float]] | tuple[int, dict[int, float], tuple[int, int]]:
    """Exact k-th smallest (1-based) of a 2-dp double column for
    SEVERAL ranks in one shared RANGE-ADAPTIVE narrowing: each
    histogram pass serves every rank (the next pass scans the union of
    the hit-bin ranges), so adjacent order statistics (lower/upper
    median) cost the same passes as one. ``k_of_n`` derives the ranks
    from the total count n — n itself is the first histogram's total,
    so no separate count job runs. Returns ``(n, {k: value})``; values
    carry the original 2-dp scale. Raises if any k is out of range,
    and if both ``ks`` and ``k_of_n`` are given (r13 ADVICE: the old
    code silently dropped ``ks``).

    r14-opt (guide §1.2 "remove unnecessary passes"): the narrowing
    SKIPS histogram levels the value range makes redundant. The first
    histogram also collects min/max cents, and any later pass (or all
    of them) is skipped once the remaining clipped span is <=
    ``_EXACT_SPAN`` cents — the exact value-count pass is then already
    bounded. A narrow column (events.value spans ~5 units) resolves in
    TWO passes instead of four; a caller that already KNOWS hard value
    bounds passes ``value_range=(lo_cents, hi_cents)`` and a narrow
    column resolves in ONE pass (q118's MAD: the deviation bound
    derives from the median pass's min/max, no scan needed). The
    bound only gates pass-skipping — it is never used as a filter — so
    a loose-but-correct cover cannot change results, only pass count.
    ``return_stats=True`` appends the observed (min, max) cents of the
    column to the return tuple (from the first histogram, or
    ``value_range`` verbatim when every pass was skipped)."""
    if ks is not None and k_of_n is not None:
        raise ValueError("ks and k_of_n are mutually exclusive")
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
    clip: tuple[int, int] | None = (
        (int(value_range[0]), int(value_range[1])) if value_range is not None else None
    )

    def _stats() -> tuple[int, int]:
        return clip if clip is not None else (0, 0)

    def _ret(out):
        return (n, out, _stats()) if return_stats else (n, out)

    widths = (1_000_000, 10_000)
    for idx, width in enumerate(widths):
        span = _clipped_span(bounds, clip)
        if span is not None:
            if span <= _EXACT_SPAN:
                break  # the exact pass is already bounded — skip the rest
            finer = widths[idx + 1] if idx + 1 < len(widths) else None
            if finer is not None and span // finer <= _MAX_BINS:
                continue  # the next-finer level alone is bounded —
                # this coarse pass would narrow nothing it needs
        hist = sorted(
            remaining.groupBy(_bin(_cents(F.col("x")), width).alias("b"))
            .agg(
                F.count("*").alias("c"),
                F.min(_cents(F.col("x"))).alias("vmin"),
                F.max(_cents(F.col("x"))).alias("vmax"),
            )
            .collect(),  # bounded: value-range / width bins, never rows
            key=lambda r: r.b,
        )
        if n is None:
            n = sum(r.c for r in hist)
            if hist:
                vmin = min(r.vmin for r in hist)
                vmax = max(r.vmax for r in hist)
                clip = (
                    (max(clip[0], vmin), min(clip[1], vmax))
                    if clip is not None
                    else (vmin, vmax)
                )
            if k_of_n is not None:
                ks = list(k_of_n(n))
                for k in ks:
                    if k < 1:
                        raise ValueError(f"k must be >= 1, got {k}")
                targets = {k: k for k in ks}
            if not targets:  # r13 ADVICE: no ranks requested — don't
                return _ret({})  # reach _range_filter with no ranges
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
        # clipping the filter ranges to the OBSERVED [vmin, vmax]
        # drops no rows (nothing lives outside) and tightens the
        # pushed-down parquet predicates
        ranges = sorted(
            {
                (max(lo, clip[0]), min(hi, clip[1] + 1)) if clip else (lo, hi)
                for lo, hi in bounds.values()
            }
        )
        remaining = _range_filter(remaining, ranges)
    # final: exact value-count histogram inside the union of remaining
    # ranges (one more bounded collect serves every rank)
    vals = sorted(
        remaining.groupBy(_cents(F.col("x")).alias("v"))
        .agg(F.count("*").alias("c"))
        .collect(),  # <= remaining-span distinct cent values, bounded
        key=lambda r: r.v,
    )
    if n is None:
        # every histogram level was skipped (a narrow value_range):
        # the exact histogram doubles as the count pass
        n = sum(r.c for r in vals)
        if k_of_n is not None:
            ks = list(k_of_n(n))
            for k in ks:
                if k < 1:
                    raise ValueError(f"k must be >= 1, got {k}")
            targets = {k: k for k in ks}
        if not targets:
            return _ret({})
    out: dict[int, float] = {}
    for k in list(targets):
        lo_k, hi_k = bounds[k] if bounds is not None else (None, None)
        cum = 0
        for r in vals:
            if lo_k is not None and not (lo_k <= r.v < hi_k):
                continue
            if cum + r.c >= targets[k]:
                out[k] = r.v / 100.0
                break
            cum += r.c
        if k not in out:
            raise ValueError(f"k={k} exceeds row count")
    return _ret(out)


def selection_kth(
    df: DataFrame, col: str, k: int, value_range: tuple[int, int] | None = None
) -> float:
    """Exact k-th smallest (1-based) of a 2-dp double column — the
    single-rank face of :func:`selection_kths`. ``value_range`` is the
    optional known (lo, hi) cents cover that lets the kernel skip
    redundant histogram levels (never changes the answer)."""
    _, vals = selection_kths(df, col, ks=[k], value_range=value_range)
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
    bin finishes exactly. Returns (n, value).

    Pushdown caveat (r13 ADVICE): the fine pass filters only on the
    COMPUTED cents column ``v`` of ``base``, so unlike
    :func:`selection_kth`'s raw-column slack bounds nothing reaches
    the parquet scan as a pushed filter — the "one fine scan of the
    hit bin" is a full decode of ``base`` with a post-projection
    filter. Harmless when the caller's value is computed anyway
    (q105's negated column); a raw-column caller who needs scan
    pruning should use :func:`selection_kths` instead."""
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
