"""SQL-statement sink: the consumer's "apply to MySQL" path (K2-K5)
without a MySQL — renders change events to SQL statements (statement
SHAPES match the reference's render kernel, operators/render_sql.py)
and appends them, in sequence order, to a statements log that a JDBC
executor can replay (mysql_manager.rs:60-95).

Caveat: values rendered from NORMALIZED events use canonical string
forms (every non-null cell re-enters as a String literal — e.g.
numerics arrive quoted, dates zero-padded); byte-identical reference
literals require rendering from the wire-format Values directly
(render_sql golden tests do exactly that).

Delivery: the log append is made effectively-once by a sequence
high-watermark — foreachBatch is at-least-once, so a replayed batch
after a crash re-renders statements the log already holds; entries at
or below the log's max sequence are skipped on append.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.render_sql import (
    build_add_queries,
    build_delete_queries,
    build_update_queries,
)


def _statements_for(rec: dict) -> list[str]:
    op = rec["op_type"]
    if op == "Query":
        return [rec["query"]] if rec["query"] else []
    table = rec["table"]
    # rec fields arrive as numpy arrays from Arrow — test None explicitly
    columns = [] if rec["columns"] is None else list(rec["columns"])

    def vals(side: str) -> list[list]:
        return [
            [
                ("Null" if c is None else {"String": c})
                for c in (() if r[side] is None else r[side])
            ]
            for r in rec["rows"]
        ]

    if op == "Add":
        return build_add_queries(table, columns, vals("after"))
    if op == "Delete":
        return build_delete_queries(table, columns, vals("before"))
    if op == "Update":
        return build_update_queries(
            table, columns, list(zip(vals("before"), vals("after")))
        )
    raise ValueError(f"unknown op: {op}")


def render_statements(events: DataFrame) -> DataFrame:
    """Normalized events → (sequence, stmt) rows, Arrow-batched.

    Note: values rendered from normalized events use canonical string
    forms; events rendered straight from the wire (render_sql on
    decoded JSON) reproduce the reference's exact literals — use that
    path when byte-identical SQL matters."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, stmts = [], []
            for rec in pdf.to_dict("records"):
                for s in _statements_for(rec):
                    seqs.append(rec["sequence"])
                    stmts.append(s)
            yield pd.DataFrame({"sequence": seqs, "stmt": stmts})

    return events.mapInPandas(render, schema="sequence long, stmt string")


def _log_max_sequence(p: Path) -> int:
    """Highest sequence already appended (scan of the tail-ordered log;
    the log is small relative to the data it describes)."""
    if not p.exists():
        return -1
    mx = -1
    with p.open() as f:
        for line in f:
            if line.strip():
                mx = max(mx, int(json.loads(line)["sequence"]))
    return mx


def append_statements_batch(events: DataFrame, log_path: str | Path) -> int:
    """foreachBatch body: render and append this batch's statements in
    sequence order. Returns the number of statements written.

    Idempotent under batch replay: statements at or below the log's
    current max sequence are skipped, so an at-least-once re-delivery
    (crash between append and checkpoint commit) appends nothing.
    """
    p = Path(log_path)
    hwm = _log_max_sequence(p)
    rows = [
        r
        for r in render_statements(events).orderBy("sequence").collect()
        if r.sequence is None or r.sequence > hwm
    ]
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("a") as f:
        for r in rows:
            f.write(json.dumps({"sequence": r.sequence, "stmt": r.stmt}) + "\n")
    return len(rows)
