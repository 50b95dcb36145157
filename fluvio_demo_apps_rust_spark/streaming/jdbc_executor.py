"""JDBC statement executor: the consumer's follower-apply path (the
second half of K5) — executes rendered SQL statements against a live
relational follower, the Spark analog of the reference's
``mysql_manager.rs:295-299`` (conn.query_drop per statement after the
local apply).

No database or driver exists in the sandbox, so the executor takes a
pluggable DB-API connection factory (``connect``) exactly as the Kafka
transport takes a broker config (config.py:KafkaConfig): the
partitioning / ordering / commit plumbing is real and tested against a
recording fake; production points ``connect`` at
``mysql.connector.connect(...)`` (or any PEP 249 driver).

Ordering contract (matches the reference, which applies the binlog
serially): ``serial=True`` (default) applies every statement in global
``(sequence, sub)`` order over one connection. ``serial=False`` range-
partitions on ``sequence`` and applies each disjoint sequence range on
its own connection in order — per-range order is exact, cross-range
commit interleaving is not; safe only when ranges touch disjoint rows
(e.g. a pure-INSERT backfill), which is the only case where parallel
follower apply is sound anyway.

Scale shape: statements stream executor-side (``foreachPartition``);
the driver never materializes the batch. Commits are batched
(``commit_every``) so a million-statement replay is not a million
round-trip fsyncs.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterator
from typing import Any, Protocol

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


class Connection(Protocol):
    """The slice of PEP 249 the executor needs."""

    def execute(self, sql: str) -> Any: ...  # pragma: no cover - protocol
    def commit(self) -> None: ...  # pragma: no cover - protocol
    def close(self) -> None: ...  # pragma: no cover - protocol


ConnectFn = Callable[[], Connection]


def execute_statements(
    stmts: DataFrame,
    connect: ConnectFn,
    *,
    serial: bool = True,
    commit_every: int = 500,
) -> int:
    """Apply a ``(sequence, sub, stmt)`` DataFrame (render_statements
    output; ``sub`` optional) through ``connect``. Returns statements
    executed. Statements with a null sequence carry no replay position
    and are dropped with a warning (same contract as the file sink)."""
    import pyspark.sql.functions as F

    cols = stmts.columns
    order = ["sequence", "sub"] if "sub" in cols else ["sequence"]
    sc = stmts.sparkSession.sparkContext
    n_exec = sc.accumulator(0)
    n_null = sc.accumulator(0)
    npart = 1 if serial else sc.defaultParallelism
    ordered = stmts.repartitionByRange(npart, "sequence").sortWithinPartitions(*order)

    def run_partition(rows: Iterator[Any]) -> None:
        conn = None
        pending = 0
        try:
            for r in rows:
                if r.sequence is None:
                    n_null.add(1)
                    continue
                if conn is None:  # connect lazily: empty partitions cost nothing
                    conn = connect()
                conn.execute(r.stmt)
                n_exec.add(1)
                pending += 1
                if pending >= commit_every:
                    conn.commit()
                    pending = 0
        finally:
            if conn is not None:
                if pending:
                    conn.commit()
                conn.close()

    ordered.foreachPartition(run_partition)
    if n_null.value:
        log.warning(
            "jdbc executor dropped %d statements with null sequence "
            "(no replay position)",
            n_null.value,
        )
    return n_exec.value


def apply_statements_batch_jdbc(
    events: DataFrame, connect: ConnectFn, *, serial: bool = True
) -> int:
    """``foreachBatch`` body: render this micro-batch's change events to
    SQL (sql_sink.render_statements) and apply them through ``connect``
    — the live-follower twin of ``sql_sink.append_statements_batch``.

    Delivery is at-least-once (foreachBatch contract): a replayed batch
    re-executes its statements, so the follower DDL should make the
    statements idempotent (PRIMARY KEY + INSERT .. ON DUPLICATE KEY /
    full-row DELETE are; the reference has the same property since it
    replays from the last committed offset)."""
    from .sql_sink import render_statements

    return execute_statements(render_statements(events), connect, serial=serial)


def replay_log_jdbc(
    spark, log_path: str, connect: ConnectFn, *, serial: bool = True
) -> int:
    """Replay a sql_sink statements log directory through ``connect``:
    the bootstrap path for standing up a new follower from the durable
    statement log."""
    from .sql_sink import read_statements_log

    recs = read_statements_log(log_path)
    if not recs:
        return 0
    df = spark.createDataFrame(
        [(r["sequence"], i, r["stmt"]) for i, r in enumerate(recs)],
        "sequence long, sub int, stmt string",
    )
    return execute_statements(df, connect, serial=serial)
