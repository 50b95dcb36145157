"""SQL-statement sink: the consumer's "apply to MySQL" path (K2-K5)
without a MySQL — renders change events to SQL statements (statement
SHAPES match the reference's render kernel, operators/render_sql.py)
and appends them to a statements LOG DIRECTORY that a JDBC executor can
replay in sequence order (mysql_manager.rs:60-95).

Caveat: values rendered from NORMALIZED events use canonical string
forms (every non-null cell re-enters as a String literal — e.g.
numerics arrive quoted, dates zero-padded); byte-identical reference
literals require rendering from the wire-format Values directly
(render_sql golden tests do exactly that).

Scale shape: rendering is Arrow-batched ``mapInPandas``; the write is a
range shuffle on the sequence key + per-partition sorted appends — the
driver never materializes the batch (no ``collect``), so a billion-event
batch costs the executors one shuffle and the driver nothing. Each task
writes one ``part-<lo>-<hi>-<uuid>.jsonl`` file covering a disjoint
sequence range (``repartitionByRange``); global replay order = files by
range start, lines in file order. The directory must be shared storage
on a real cluster (same requirement as any file sink).

Delivery: effectively-once under foreachBatch's at-least-once contract —
the written ranges are recoverable from the part FILE NAMES alone (no
log-content rescan, no O(log²) lifetime cost), and a replayed batch is
filtered against them per-statement, so partially-written batches
(crash between task commits) re-emit exactly the missing ranges.
Events with a null sequence carry no replay identity and are DROPPED
with a warning (appending them unconditionally would duplicate on every
redelivery).
"""

from __future__ import annotations

import json
import logging
import re
import uuid
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..operators.render_sql import (
    build_add_queries,
    build_delete_queries,
    build_update_queries,
)

log = logging.getLogger(__name__)

_PART_RE = re.compile(r"^part-(\d+)-(\d+)-[0-9a-f]+\.jsonl$")

# Written-range cache per log dir: avoids re-listing the directory on
# every batch of a long-running stream. Invalidated after each append
# (next call re-lists once) and trivially correct on restart (first
# call lists the directory).
_RANGES_CACHE: dict[str, list[tuple[int, int]]] = {}


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
    """Normalized events → (sequence, sub, stmt) rows, Arrow-batched.
    ``sub`` numbers the statements within one event so multi-statement
    events (bulk row images) keep a total replay order.

    Note: values rendered from normalized events use canonical string
    forms; events rendered straight from the wire (render_sql on
    decoded JSON) reproduce the reference's exact literals — use that
    path when byte-identical SQL matters."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, subs, stmts = [], [], []
            for rec in pdf.to_dict("records"):
                for i, s in enumerate(_statements_for(rec)):
                    seqs.append(rec["sequence"])
                    subs.append(i)
                    stmts.append(s)
            yield pd.DataFrame({"sequence": seqs, "sub": subs, "stmt": stmts})

    return events.mapInPandas(render, schema="sequence long, sub int, stmt string")


def _written_ranges(p: Path) -> list[tuple[int, int]]:
    """Sequence ranges already on disk, from part-file NAMES only."""
    key = str(p)
    if key not in _RANGES_CACHE:
        ranges = []
        if p.is_dir():
            for f in p.iterdir():
                m = _PART_RE.match(f.name)
                if m:
                    ranges.append((int(m.group(1)), int(m.group(2))))
        _RANGES_CACHE[key] = sorted(ranges)
    return _RANGES_CACHE[key]


def append_statements_batch(events: DataFrame, log_path: str | Path) -> int:
    """foreachBatch body: render this batch's statements and append them
    as range-partitioned sorted part files. Returns statements written.

    Idempotent under batch replay: statements whose sequence falls in a
    range some part file already covers are skipped, so an
    at-least-once re-delivery (crash between task commit and checkpoint
    commit) appends only what is actually missing."""
    p = Path(log_path)
    p.mkdir(parents=True, exist_ok=True)
    ranges = _written_ranges(p)

    stmts = render_statements(events)
    if ranges:
        covered = " OR ".join(
            f"(sequence BETWEEN {lo} AND {hi})" for lo, hi in ranges
        )
        stmts = stmts.filter(F.expr(f"sequence IS NULL OR NOT ({covered})"))

    sc = events.sparkSession.sparkContext
    n_written = sc.accumulator(0)
    n_null = sc.accumulator(0)
    npart = sc.defaultParallelism
    dest = str(p)

    def write_partition(rows) -> None:
        tmp = Path(dest) / f".tmp-{uuid.uuid4().hex}"
        lo = hi = None
        count = 0
        try:
            with tmp.open("w") as f:
                for r in rows:
                    if r.sequence is None:
                        n_null.add(1)
                        continue
                    f.write(json.dumps({"sequence": r.sequence, "stmt": r.stmt}) + "\n")
                    lo = r.sequence if lo is None else lo
                    hi = r.sequence
                    count += 1
            if count:
                tmp.rename(Path(dest) / f"part-{lo:012d}-{hi:012d}-{uuid.uuid4().hex}.jsonl")
                n_written.add(count)
            else:
                tmp.unlink()
        except BaseException:
            tmp.unlink(missing_ok=True)
            raise

    (
        stmts.repartitionByRange(npart, "sequence")
        .sortWithinPartitions("sequence", "sub")
        .foreachPartition(write_partition)
    )
    if n_null.value:
        log.warning(
            "sql_sink dropped %d statements with null sequence "
            "(no replay identity — keeping them would duplicate on redelivery)",
            n_null.value,
        )
    _RANGES_CACHE.pop(str(p), None)  # re-list on next batch
    return n_written.value


def read_statements_log(log_path: str | Path) -> list[dict]:
    """The replay view a JDBC executor consumes: all statements in
    global sequence order (part files by range start, lines in file
    order)."""
    p = Path(log_path)
    if not p.is_dir():
        return []
    parts = []
    for f in p.iterdir():
        m = _PART_RE.match(f.name)
        if m:
            parts.append((int(m.group(1)), f))
    out: list[dict] = []
    for _, f in sorted(parts, key=lambda t: t[0]):
        for line in f.read_text().splitlines():
            if line.strip():
                out.append(json.loads(line))
    return out
