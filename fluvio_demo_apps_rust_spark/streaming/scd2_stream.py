"""Streaming SCD2 maintenance: the temporal dimension kept current
across microbatches.

The batch operator (operators/scd2.py) folds a complete change log into
version intervals; a live follower instead receives changes in
microbatches and must keep the version table current without refolding
history. ``Scd2Maintainer`` does the incremental merge inside
``foreachBatch``:

1. split the current version table into untouched keys and keys present
   in the batch;
2. reconstruct the AFFECTED keys' change log from their own versions
   (each version was opened by an Add/Update at ``valid_from_seq``; a
   closing sequence with no successor version was a Delete — both are
   recoverable, so no separate change log is stored);
3. refold reconstructed + new changes through the batch operator;
4. union untouched + refolded, localCheckpoint to cut lineage.

Work per microbatch is proportional to the CHANGED keys' history, never
the dimension size — the incremental scale shape. Equality with the
batch fold over the full log is pinned by tests/test_scd2_stream.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.scd2 import scd2_intervals


class Scd2Maintainer:
    """Holds the evolving version table; ``apply`` is the foreachBatch
    hook (signature: (batch_df, batch_id))."""

    def __init__(self, key_col: str, seq_col: str, attr_cols: tuple[str, ...]):
        self.key_col = key_col
        self.seq_col = seq_col
        self.attr_cols = attr_cols
        self.versions: DataFrame | None = None

    def _reconstruct_changes(self, versions: DataFrame) -> DataFrame:
        """Version rows → the change rows that produced them."""
        k, s = self.key_col, self.seq_col
        adds = versions.select(
            k,
            F.col("valid_from_seq").alias(s),
            F.lit("Add").alias("op_type"),
            *self.attr_cols,
        )
        # A closing sequence that no successor version opens at was a
        # Delete (update-closures reopen at the same sequence).
        closers = versions.filter(F.col("valid_to_seq").isNotNull()).select(
            k, F.col("valid_to_seq").alias(s)
        )
        openers = versions.select(k, F.col("valid_from_seq").alias(s))
        deletes = closers.join(openers, [k, s], "left_anti").select(
            k,
            s,
            F.lit("Delete").alias("op_type"),
            *[
                F.lit(None).cast(versions.schema[c].dataType).alias(c)
                for c in self.attr_cols
            ],
        )
        return adds.unionByName(deletes)

    def apply(self, batch: DataFrame, batch_id: int) -> None:
        k = self.key_col
        batch = batch.select(k, self.seq_col, "op_type", *self.attr_cols)
        if self.versions is None:
            self.versions = scd2_intervals(
                batch, key_col=k, seq_col=self.seq_col, attr_cols=self.attr_cols
            ).localCheckpoint(eager=True)
            return
        keys = batch.select(k).distinct()
        untouched = self.versions.join(keys, k, "left_anti")
        affected = self.versions.join(F.broadcast(keys), k, "inner")
        refolded = scd2_intervals(
            self._reconstruct_changes(affected).unionByName(batch),
            key_col=k,
            seq_col=self.seq_col,
            attr_cols=self.attr_cols,
        )
        self.versions = untouched.unionByName(refolded).localCheckpoint(eager=True)


def changes_from_events(events: DataFrame) -> DataFrame:
    """Decoded CHANGE_EVENT rows → SCD2 change rows, one per row image:
    (db, table, key, sequence, op_type, attrs).

    ``key`` is the FIRST image column (the MySQL-CDC convention — the
    wire format carries no primary-key metadata, same blind spot as the
    reference's full-row-match apply). ``attrs`` is a name→value map
    built from each event's OWN self-describing column header, so
    versions written before and after an ALTER carry their respective
    column sets — schema evolution needs no refold. Delete images
    contribute the closing change only (null attrs)."""
    r = F.explode("rows").alias("r")
    img = F.coalesce(F.col("r.after"), F.col("r.before"))
    return (
        events.filter(F.col("op_type").isin("Add", "Update", "Delete"))
        .select("db", "table", "sequence", "op_type", "columns", r)
        .select(
            "db",
            "table",
            F.element_at(img, 1).alias("key"),
            "sequence",
            "op_type",
            F.when(
                F.col("op_type") != "Delete",
                F.map_from_arrays(
                    F.slice("columns", 1, F.size(F.col("r.after"))),
                    F.col("r.after"),
                ),
            ).alias("attrs"),
        )
    )
