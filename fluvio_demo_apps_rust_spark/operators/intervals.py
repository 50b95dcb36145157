"""Per-key interval-union (span merge) kernel.

Merges overlapping-or-touching half-open intervals [s, e) within each
key group into maximal disjoint spans — the classic sweep needed by
span-trim operators (llm_substring_trim: merge duplicated-window spans
per document before cutting them out of the text) and by any
validity-interval compaction. Complements plans/events.py's
interval_coverage, which reduces the union to a LENGTH per key; this
kernel MATERIALIZES the merged spans.

100 TB shape: one window pass partitioned by the key (state bounded by
intervals per key — per-document span counts are bounded by document
length) plus one hash aggregate on (key, span_id). No self-join, no
all-pairs; the sweep is the O(n log n) textbook algorithm expressed as
a running-max window.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start: str = "s",
    end: str = "e",
) -> DataFrame:
    """Merge half-open intervals [start, end) per key group.

    Returns one row per maximal merged span with columns
    ``*keys, span_id, s, e`` where ``span_id`` numbers spans within the
    key group from 1 in ascending ``s`` order. Intervals that overlap
    OR touch (next.start == prev.end) merge — half-open adjacency
    leaves no gap, so a trim consumer would emit an empty segment
    between them anyway. A new span starts exactly when an interval's
    start exceeds the running max of all previous ends (running max,
    not lag: an early long interval can swallow several later short
    ones).
    """
    keys = list(keys)
    # Shared-kernel hygiene (r12 ADVICE): the sweep introduces _ns and
    # emits span_id/s/e — silently overwriting a caller column of the
    # same name would corrupt the result, so refuse loudly instead.
    reserved = {"_ns", "span_id"} | ({"s", "e"} - {start, end})
    clashes = sorted(reserved & set(df.columns))
    if clashes:
        raise ValueError(
            f"merge_intervals reserves column names {clashes}; rename or "
            f"drop them (input columns: {df.columns})"
        )
    order = Window.partitionBy(*keys).orderBy(start, end)
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run_end = F.max(end).over(prev)
    new_span = F.when(
        run_end.isNull() | (F.col(start) > run_end), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = df.withColumn("_ns", new_span).withColumn(
        "span_id",
        F.sum("_ns").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        tagged.groupBy(*keys, "span_id")
        .agg(F.min(start).alias("s"), F.max(end).alias("e"))
        .select(*keys, "span_id", "s", "e")
    )
