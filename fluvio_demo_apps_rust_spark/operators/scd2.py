"""SCD2 temporal-dimension build from a CDC change stream.

The reference's consumer materializes only the CURRENT table state
(cdc-mysql/src/consumer/mysql_manager.rs:61 applies each change in
place); a warehouse follower usually wants the full change history as a
slowly-changing-dimension type-2 table instead — one row per version of
each key, carrying the sequence interval it was valid for. This module
derives that directly from the decoded change events (operator family
K2-K4 extension): every Add/Update after-image opens a version at its
sequence; the version closes when the same key's next change (or its
Delete) arrives.

Scale posture: ONE shuffle on the key (the window partition); each
partition sorts its key-group by sequence — no joins, no driver state.
At 100 TB the change stream for one key is tiny; skewed hot keys are
bounded by their own change count, never by corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def scd2_intervals(
    changes: DataFrame,
    key_col: str = "key",
    seq_col: str = "sequence",
    attr_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(key, sequence, op_type, attrs…) change rows → SCD2 version rows.

    Input: one row per change event with ``op_type`` in Add/Update
    (after-image attributes) or Delete (attributes ignored). Output: one
    row per surviving version — key, attrs, ``valid_from_seq`` (the
    change's sequence), ``valid_to_seq`` (next change's sequence, NULL
    while current), ``is_current`` (open interval AND not closed by a
    Delete).
    """
    w = Window.partitionBy(key_col).orderBy(seq_col)
    nxt_seq: Column = F.lead(seq_col).over(w)
    versions = changes.withColumn("valid_to_seq", nxt_seq).withColumn(
        "is_current", nxt_seq.isNull() & (F.col("op_type") != "Delete")
    )
    # Delete rows only close the previous version; they are not
    # versions themselves. A version followed by nothing is current.
    return versions.filter(F.col("op_type") != "Delete").select(
        key_col,
        *attr_cols,
        F.col(seq_col).alias("valid_from_seq"),
        "valid_to_seq",
        "is_current",
    )
