"""Custom stateful streaming operator via ``applyInPandasWithState``.

``table_stats_stream`` maintains per-(db, table) running CDC stats —
event count, row-image count, max applied sequence — across
microbatches: the arbitrary-keyed-state analog of the reference's
producer-side bookkeeping (sequence counter fluvio_manager.rs:43-52,
resume state binlog_resume.rs:30-64), generalized from one global
counter to one state entry per table.

Scale posture: state is partitioned by the group key and lives in the
checkpointed state store — executors scale it horizontally; each
microbatch touches only the keys present in that batch. The handler
sees Arrow-batched pandas frames, never per-row Python calls.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = "db string, table string, n_events bigint, n_rows bigint, max_sequence bigint"
_STATE_SCHEMA = "n_events bigint, n_rows bigint, max_sequence bigint"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, n_rows, max_seq = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n_events += len(pdf)
        n_rows += int(pdf["n_rows"].sum())
        if len(pdf):
            max_seq = max(max_seq, int(pdf["sequence"].max()))
    state.update((n_events, n_rows, max_seq))
    yield pd.DataFrame(
        [
            {
                "db": key[0],
                "table": key[1],
                "n_events": n_events,
                "n_rows": n_rows,
                "max_sequence": max_seq,
            }
        ]
    )


def table_stats_stream(events: DataFrame) -> DataFrame:
    """Per-(db, table) running stats over a normalized change-event
    stream (CHANGE_EVENT_SCHEMA). Emits one updated row per key per
    microbatch — use with ``outputMode("update")``.
    """
    keyed = events.filter(F.col("table").isNotNull()).select(
        "db",
        "table",
        "sequence",
        F.coalesce(F.size("rows"), F.lit(0)).cast("long").alias("n_rows"),
    )
    return keyed.groupBy("db", "table").applyInPandasWithState(
        _update,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
