"""Update-run coalescing pins (r5 verdict #9).

Consecutive Update events now form ONE run; a distributed hash check
routes the run: independent updates batch into a single join (no more
O(#events) driver fold for update-dominated streams), while runs with
cross-event chaining fall back to the exact sequential per-event fold.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from fluvio_demo_apps_rust_spark.operators.apply import (
    _update_run_conflicts,
    apply_changes,
)
from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings

COLS = ["k", "v"]


def _ev(seq: int, payload, columns=COLS) -> str:
    obj = {
        "uri": "flv://srv/updb/t",
        "sequence": seq,
        "bn_file": {"fileName": "binlog.000001", "offset": seq},
        "columns": columns,
        "operation": payload,
    }
    if "Query" in payload:
        obj.pop("columns")
        obj["uri"] = "flv://srv/updb"
    return json.dumps(obj)


def _i(x):
    return {"SignedInteger": x}


def _upd(seq, before, after):
    return _ev(seq, {"Update": {"rows": [{
        "before_cols": [_i(before[0]), _i(before[1])],
        "after_cols": [_i(after[0]), _i(after[1])],
    }]}})


def _add(seq, rows):
    return _ev(seq, {"Add": {"rows": [{"cols": [_i(a), _i(b)]} for a, b in rows]}})


def _create(seq):
    return _ev(seq, {"Query": "CREATE TABLE t (k INT, v INT)"})


def _run_dict(op="Update", seq_min=0, seq_max=10**9):
    return {"op": op, "db": "updb", "table": "t", "seq_min": seq_min,
            "seq_max": seq_max}


def _final(spark, events_json):
    state = apply_changes(spark, read_events_from_strings(spark, events_json))
    got = sorted((r.k, r.v) for r in state.table("updb", "t").collect())
    state.release()
    return got


def test_independent_run_is_conflict_free_and_exact(spark):
    lines = [_create(0), _add(1, [(1, 1), (2, 2), (3, 3)]),
             _upd(2, (1, 1), (1, 10)), _upd(3, (2, 2), (2, 20)),
             _upd(4, (3, 3), (3, 30))]
    events = read_events_from_strings(spark, lines).withColumn(
        "ncols", F.size("columns")).withColumn("nrows_ev", F.size("rows"))
    assert not _update_run_conflicts(events, _run_dict())
    assert _final(spark, lines) == [(1, 10), (2, 20), (3, 30)]


def test_chained_run_falls_back_to_sequential(spark):
    # U1: A->B then U2: B->C — sequential result is C; a naive batch
    # join against the pre-run table would stop at B.
    lines = [_create(0), _add(1, [(1, 1)]),
             _upd(2, (1, 1), (1, 2)), _upd(3, (1, 2), (1, 3))]
    events = read_events_from_strings(spark, lines).withColumn(
        "ncols", F.size("columns")).withColumn("nrows_ev", F.size("rows"))
    assert _update_run_conflicts(events, _run_dict())
    assert _final(spark, lines) == [(1, 3)]


def test_duplicate_before_across_events_falls_back(spark):
    # U1: X->A consumes every X row; U2: X->B must then match NOTHING
    # (sequential semantics) — last-wins batching would wrongly apply B.
    lines = [_create(0), _add(1, [(5, 5)]),
             _upd(2, (5, 5), (5, 100)), _upd(3, (5, 5), (5, 200))]
    events = read_events_from_strings(spark, lines).withColumn(
        "ncols", F.size("columns")).withColumn("nrows_ev", F.size("rows"))
    assert _update_run_conflicts(events, _run_dict())
    assert _final(spark, lines) == [(5, 100)]


def test_update_heavy_batch_applies_in_one_run(spark):
    """2000 independent single-row updates: one coalesced run — ONE
    summary row, ONE conflict check, ONE join. The wall bound is far
    below what 2000 sequential join-folds could achieve; correctness is
    exact."""
    n = 2000
    lines = [_create(0), _add(1, [(i, i) for i in range(n)])]
    lines += [_upd(2 + i, (i, i), (i, i + 100000)) for i in range(n)]
    t0 = time.perf_counter()
    got = _final(spark, lines)
    elapsed = time.perf_counter() - t0
    assert got == sorted((i, i + 100000) for i in range(n))
    assert elapsed < 60, f"update-heavy apply took {elapsed:.1f}s — degenerated?"
