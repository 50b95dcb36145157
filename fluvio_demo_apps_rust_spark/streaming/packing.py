"""Streaming sample packing: a custom stateful operator that assigns
each incoming document its global token start offset within its shard,
carrying the running offset across microbatches in
``applyInPandasWithState`` state — the streaming face of the batch
two-phase prefix sum (plans/llm.py llm_pack_token_ids). This is what a
continuous-ingest shard writer runs: documents arrive over time, each
must land at a deterministic offset in the packed token stream, and
the assignment must survive restarts (the offset lives in the
checkpointed state store,
one BIGINT per shard).

Scale posture: state is ONE number per shard key (bounded by shard
count, not stream length); each microbatch's work is a per-key local
fold over that batch's rows. Keys partition across executors like any
keyed state. Ordering contract: within a microbatch rows are packed in
doc_id order (sorted in the operator — Arrow batch order is not
guaranteed); across microbatches arrival order IS the pack order,
which is the semantics a writer wants (you cannot re-order what is
already written). The deterministic-replay gate feeds monotone doc_ids
per shard so the batch prefix-sum oracle computes the identical
layout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PACK_BUDGET = 512

OUT_SCHEMA = (
    "shard string, doc_id long, n_tokens long, start_offset long, "
    "pack_id long, crosses boolean"
)
_STATE_SCHEMA = "off long"
_OUT_COLS = ["shard", "doc_id", "n_tokens", "start_offset", "pack_id", "crosses"]


def _frame(rows: list[tuple]) -> pd.DataFrame:
    if rows:
        return pd.DataFrame(rows, columns=_OUT_COLS)
    return pd.DataFrame(
        {
            "shard": pd.Series([], dtype="object"),
            "doc_id": np.array([], dtype=np.int64),
            "n_tokens": np.array([], dtype=np.int64),
            "start_offset": np.array([], dtype=np.int64),
            "pack_id": np.array([], dtype=np.int64),
            "crosses": np.array([], dtype=bool),
        }
    )


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    shard = key[0]
    off = int(state.get[0]) if state.exists else 0
    rows: list[tuple] = []
    parts = [p for p in pdfs if len(p)]
    if parts:
        pdf = pd.concat(parts).sort_values("doc_id", kind="mergesort")
        for did, nt in zip(
            pdf["doc_id"].astype("int64"), pdf["n_tokens"].astype("int64")
        ):
            nt = int(nt)
            pack_id = off // PACK_BUDGET
            crosses = (off + nt - 1) // PACK_BUDGET > pack_id
            rows.append((shard, int(did), nt, off, pack_id, crosses))
            off += nt
    state.update((off,))
    yield _frame(rows)


MANIFEST_OUT_SCHEMA = (
    "shard string, n_docs long, n_tokens long, manifest_digest string"
)
_MANIFEST_STATE_SCHEMA = "dg string, nd long, nt long"


def _manifest_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import hashlib

    shard = key[0]
    if state.exists:
        dg, nd, nt = state.get
        nd, nt = int(nd), int(nt)
    else:
        dg, nd, nt = hashlib.md5(b"").hexdigest(), 0, 0
    parts = [p for p in pdfs if len(p)]
    if parts:
        pdf = pd.concat(parts).sort_values("doc_id", kind="mergesort")
        for content in pdf["content"]:
            h = hashlib.md5(str(content).encode()).hexdigest()
            dg = hashlib.md5((dg + h).encode()).hexdigest()
            nd += 1
            nt += len([w for w in str(content).split(" ") if w])
    state.update((dg, nd, nt))
    yield pd.DataFrame(
        {
            "shard": [shard],
            "n_docs": np.array([nd], dtype=np.int64),
            "n_tokens": np.array([nt], dtype=np.int64),
            "manifest_digest": [dg],
        }
    )


def manifest_stream(docs: DataFrame) -> DataFrame:
    """Incremental per-shard manifest over a streaming (shard, doc_id,
    content) frame: running doc/token counts plus the chained content
    digest dgₙ = md5(dgₙ₋₁ ‖ md5(contentₙ)), state = one digest + two
    counters per shard. Emits the current manifest row per shard per
    microbatch (update mode)."""
    return (
        docs.select("shard", "doc_id", "content")
        .groupBy("shard")
        .applyInPandasWithState(
            _manifest_update,
            outputStructType=MANIFEST_OUT_SCHEMA,
            stateStructType=_MANIFEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def pack_stream(docs: DataFrame) -> DataFrame:
    """Assign streaming (shard, doc_id, n_tokens) rows their packed
    start offsets. Emits every row exactly once (update mode); the
    per-shard running offset is the only state."""
    return (
        docs.select("shard", "doc_id", "n_tokens")
        .groupBy("shard")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
