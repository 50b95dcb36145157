"""Batch apply kernel: normalized change events → materialized tables.

Reproduces the consumer's write path (SURVEY §2.5) Spark-first:

- K2 INSERT  → union of typed after-images (runs of consecutive Add
  events coalesce into ONE union — bulk loads cost one scan).
- K3 UPDATE  → full-row match on ALL before-image columns with
  null-safe equality (``<=>``), replacing EVERY matching duplicate row
  with the after-image (mysql_manager.rs:232-267: no keys exist, NULL
  → ``IS NULL``, all duplicates affected).
- K4 DELETE  → null-safe anti-join removing ALL rows matching any
  deleted before-image (mysql_manager.rs:270-292).
- K5 DDL     → replayed through the schema registry, then applied to
  the materialized DataFrame (create empty typed table / add null
  column / rename / drop).
- K6 guards  → events must carry a column header covering every row
  value (mysql_manager.rs:302-335).

Ordering & delivery: events apply in ``sequence`` order (the
reference's single-partition total order, fluvio_manager.rs:20,46);
per-table applied-sequence watermarks make replays no-ops — an
exactly-once upgrade over the reference's at-least-once
(SURVEY §7.4.7).

Scale posture: event *metadata* (one tiny row per event) is driver-side;
row payloads never leave the cluster — each fold step is a narrow
union or a null-safe join against the (small) per-event image set,
which Spark broadcasts. Lineage is truncated with localCheckpoint every
``checkpoint_every`` fold steps so unbounded event chains keep bounded
plans. Tables are independent effect streams and fold independently
(§7.4.1): order within a table, parallelism across tables.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..registry import SchemaRegistry
from ..schemas import mysql_type_to_spark

log = logging.getLogger(__name__)


class ApplyError(Exception):
    pass


@dataclass
class CdcState:
    """Materialized per-table DataFrames + registry + watermarks."""

    tables: dict[tuple[str, str], DataFrame] = field(default_factory=dict)
    watermarks: dict[tuple[str, str], int] = field(default_factory=dict)
    registry: SchemaRegistry = field(default_factory=SchemaRegistry)

    def table(self, db: str, table: str) -> DataFrame:
        return self.tables[(db.lower(), table.lower())]


def _cast_canonical(col: F.Column, mysql_type: str | None) -> F.Column:
    """Canonical cell string → typed column (schemas.py formats)."""
    spark_type = mysql_type_to_spark(mysql_type)
    base = (mysql_type or "").strip().lower().split("(")[0]
    if base == "timestamp":
        # canonical: "epoch_seconds.ffffff"
        return F.timestamp_seconds(col.cast("double")).cast("timestamp_ntz")
    if isinstance(spark_type, T.BinaryType):
        return F.unbase64(col)
    return col.cast(spark_type)


def _typed_schema(cols: list[tuple[str, str | None]]) -> T.StructType:
    return T.StructType(
        [T.StructField(c, mysql_type_to_spark(t), True) for c, t in cols]
    )


def _table_cols(state: CdcState, db: str, table: str, event_columns: list[str] | None) -> list[tuple[str, str | None]]:
    """Column (name, mysql_type) list: registry if known, else the
    event's self-describing header with canonical string typing."""
    cols = state.registry.dbs.get(db, {}).get(table)
    if cols is not None:
        return cols
    if event_columns:
        return [(c, None) for c in event_columns]
    raise ApplyError(f"no schema for {db}.{table} and event carries no columns (K6)")


def _images_df(
    events: DataFrame,
    seqs: list[int],
    side: str,
    cols: list[tuple[str, str | None]],
    prefix: str = "",
    with_pos: bool = False,
) -> DataFrame:
    """Explode the row images of the given events into typed columns.

    K6 guard: a row with more values than the column header raises
    (element_at past the header would silently null — checked below).
    """
    ev = events.filter(F.col("sequence").isin(seqs))
    exploded = ev.select(
        "sequence", F.posexplode("rows").alias("pos", "img"), F.size("columns").alias("_ncols")
    )
    img = F.col("img." + side)
    checked = exploded.withColumn(
        "_bad", F.size(img) > F.col("_ncols")
    )
    sel = [
        _cast_canonical(F.element_at(img, i + 1), t).alias(prefix + c)
        for i, (c, t) in enumerate(cols)
    ]
    if with_pos:
        sel = [F.col("sequence"), F.col("pos")] + sel
    out = checked.select(*sel, "_bad")
    if out.filter(F.col("_bad")).limit(1).count() > 0:
        raise ApplyError("row carries more values than its column header (K6)")
    return out.drop("_bad")


def _empty_table(spark: SparkSession, cols: list[tuple[str, str | None]]) -> DataFrame:
    return spark.createDataFrame([], _typed_schema(cols))


def _nullsafe_cond(left: DataFrame, right: DataFrame, cols: list[str], prefix: str):
    cond = F.lit(True)
    for c in cols:
        cond = cond & left[c].eqNullSafe(right[prefix + c])
    return cond


def apply_changes(
    spark: SparkSession,
    events: DataFrame,
    state: CdcState | None = None,
    strict_ddl: bool = False,
    checkpoint_every: int = 16,
) -> CdcState:
    """Apply one batch of normalized change events to the state.

    ``events`` must be normalized (CHANGE_EVENT_SCHEMA). Events are
    applied in sequence order; per-table watermarks drop replays.
    """
    state = state or CdcState()
    events = events.persist()
    try:
        meta = (
            events.select("sequence", "db", "table", "op_type", "query", "columns")
            .orderBy("sequence")
            .collect()
        )

        # Group consecutive row events per (db, table, op, columns) so Add
        # runs coalesce into a single union.
        runs: list[dict] = []
        for m in meta:
            db = (m.db or "").lower()
            tbl = (m.table or "").lower() if m.table else None
            key = (db, tbl) if tbl else None
            if key and state.watermarks.get(key, -1) >= (m.sequence or 0):
                continue  # replay → no-op (exactly-once)
            cur = runs[-1] if runs else None
            if (
                m.op_type == "Add"
                and cur
                and cur["op"] == "Add"
                and cur["key"] == key
                and cur["columns"] == list(m.columns or [])
            ):
                cur["seqs"].append(m.sequence)
            else:
                runs.append(
                    {
                        "op": m.op_type,
                        "key": key,
                        "db": db,
                        "table": tbl,
                        "columns": list(m.columns or []),
                        "query": m.query,
                        "seqs": [m.sequence],
                    }
                )

        fold_steps: dict[tuple[str, str], int] = {}
        for run in runs:
            op, key = run["op"], run["key"]
            if op == "Query":
                _apply_ddl(spark, state, run["db"], run["query"], strict_ddl)
                continue
            db, tbl = key
            cols = _table_cols(state, db, tbl, run["columns"])
            names = [c for c, _ in cols]
            if key not in state.tables:
                # Row event for a table never created via DDL: bootstrap
                # from the event's self-describing header.
                state.tables[key] = _empty_table(spark, cols)
            cur = state.tables[key]

            if op == "Add":
                imgs = _images_df(events, run["seqs"], "after", cols)
                new = cur.unionByName(imgs)
            elif op == "Delete":
                imgs = _images_df(events, run["seqs"], "before", cols, prefix="_d_").distinct()
                new = cur.join(
                    F.broadcast(imgs), _nullsafe_cond(cur, imgs, names, "_d_"), "left_anti"
                )
            elif op == "Update":
                pairs = _images_df(
                    events, run["seqs"], "before", cols, prefix="_b_", with_pos=True
                )
                afters = _images_df(
                    events, run["seqs"], "after", cols, prefix="_a_", with_pos=True
                )
                both = pairs.join(afters, ["sequence", "pos"])
                # Several pairs with an identical before-image: the last
                # one wins (sequential MySQL semantics within one event).
                from pyspark.sql import Window

                w = Window.partitionBy(*[F.col("_b_" + c) for c in names]).orderBy(
                    F.desc("sequence"), F.desc("pos")
                )
                both = (
                    both.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "sequence", "pos")
                    .withColumn("_matched", F.lit(True))
                )
                joined = cur.join(
                    F.broadcast(both), _nullsafe_cond(cur, both, names, "_b_"), "left"
                )
                new = joined.select(
                    *[
                        F.when(F.col("_matched"), F.col("_a_" + c))
                        .otherwise(cur[c])
                        .alias(c)
                        for c in names
                    ]
                )
            else:
                raise ApplyError(f"unknown op type: {op}")

            steps = fold_steps.get(key, 0) + 1
            if steps % checkpoint_every == 0:
                new = new.localCheckpoint(eager=True)
            fold_steps[key] = steps
            state.tables[key] = new
            state.watermarks[key] = max(
                state.watermarks.get(key, -1), max(run["seqs"])
            )
        return state
    finally:
        events.unpersist()


def _apply_ddl(
    spark: SparkSession, state: CdcState, db: str, query: str | None, strict: bool
) -> None:
    from .. import ddl as D

    ops = state.registry.apply_query(db, query, strict=strict)
    for op in ops:
        if isinstance(op, D.CreateTable):
            key = (db, op.table)
            state.tables[key] = _empty_table(
                spark, [(c, t or None) for c, t in op.columns]
            )
        elif isinstance(op, D.AddColumn):
            key = (db, op.table)
            if key in state.tables:
                state.tables[key] = state.tables[key].withColumn(
                    op.column, F.lit(None).cast(mysql_type_to_spark(op.mysql_type))
                )
        elif isinstance(op, D.RenameColumn):
            key = (db, op.table)
            if key in state.tables:
                state.tables[key] = state.tables[key].withColumnRenamed(op.old, op.new)
        elif isinstance(op, D.DropColumn):
            key = (db, op.table)
            if key in state.tables:
                state.tables[key] = state.tables[key].drop(op.column)
        elif isinstance(op, D.DropTable):
            for t in op.tables:
                state.tables.pop((db, t), None)
                state.watermarks.pop((db, t), None)
