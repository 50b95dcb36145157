"""Sequence numbering (operator T4) — producer-side total order.

The reference assigns a monotonically increasing u64 per published
message (fluvio_manager.rs:43-52) — and restarts from 0 on resume (its
topic-tail recovery, S6, is dead code). Here: dense ``row_number`` over
the binlog position (file id, byte offset) plus a persisted
high-watermark, so sequences survive restarts — NOT
``monotonically_increasing_id`` (sparse, partition-dependent).

Scale note: a total order is inherently a single ordered reduction —
the reference serializes through one topic partition for the same
reason. The window below is one shuffle to a single ordered partition;
at scale you shard sequences per source (one CDC producer per
database), exactly as the reference does.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def file_id(col: F.Column) -> F.Column:
    """Numeric suffix of a binlog file name — ``binlog.000042`` → 42
    (reference: get_file_id, binlog_file.rs:85-90). A missing or
    suffix-less name RAISES (as the reference's parser errors) rather
    than silently sorting malformed events first with nondeterministic
    sequence assignment."""
    fid = F.regexp_extract(col, r"\.(\d+)$", 1)
    return F.when(
        col.isNull() | (fid == ""),
        F.raise_error(
            F.concat(F.lit("unparseable binlog file name: "), F.coalesce(col, F.lit("NULL")))
        ).cast("long"),
    ).otherwise(fid.cast("long"))


def assign_sequence(
    df: DataFrame,
    file_col: str = "file_name",
    offset_col: str = "offset",
    start: int = 0,
) -> DataFrame:
    """Dense sequence over binlog position order, starting at ``start``
    (the persisted high-watermark + 1 on resume)."""
    w = Window.orderBy(file_id(F.col(file_col)), F.col(offset_col))
    return df.withColumn(
        "sequence", (F.row_number().over(w) + F.lit(start - 1)).cast("long")
    )
