"""Apply kernel semantics: the SURVEY §7.4 hard parts.

- full-row null-safe matching (NULLs match NULLs, <=> semantics)
- update/delete affect ALL duplicate rows
- mid-stream schema evolution (ALTER ADD COLUMN)
- exactly-once replay (watermarks)
- pet-store e2e golden
"""

from __future__ import annotations

import json

import pytest

from fluvio_demo_apps_rust_spark.fixtures import PET_COLUMNS, PET_EVENTS, PET_GOLDEN
from fluvio_demo_apps_rust_spark.operators.apply import CdcState, apply_changes
from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings


def _ev(seq, table, op, columns=None, query=None, db="testdb"):
    uri = f"flv://srv/{db}" + (f"/{table}" if table else "")
    obj = {
        "uri": uri,
        "sequence": seq,
        "bn_file": {"fileName": "binlog.000001", "offset": seq * 100},
    }
    if columns:
        obj["columns"] = columns
    obj["operation"] = op
    return json.dumps(obj)


def _s(x):
    return {"String": x}


def _i(x):
    return {"SignedInteger": x}


def test_pet_e2e_golden(spark):
    events = read_events_from_strings(spark, PET_EVENTS)
    state = apply_changes(spark, events)
    pet = state.table("flvdb", "pet")
    assert pet.columns == PET_COLUMNS
    rows = sorted(
        (r.name, r.owner, r.species, r.sex, str(r.birth) if r.birth else None,
         str(r.last_vaccine) if r.last_vaccine else None)
        for r in pet.collect()
    )
    assert rows == sorted(PET_GOLDEN)
    # watermark recorded for exactly-once
    assert state.watermarks[("flvdb", "pet")] == 8


def test_replay_is_noop(spark):
    events = read_events_from_strings(spark, PET_EVENTS)
    state = apply_changes(spark, events)
    n1 = state.table("flvdb", "pet").count()
    # replaying the row events must not change the table
    state2 = apply_changes(spark, read_events_from_strings(
        spark, [e for e in PET_EVENTS if '"Query"' not in e]), state)
    assert state2.table("flvdb", "pet").count() == n1


def test_update_affects_all_duplicates(spark):
    events = [
        _ev(0, None, {"Query": "CREATE TABLE t (a VARCHAR(5), b INT)"}),
        _ev(1, "t", {"Add": {"rows": [
            {"cols": [_s("x"), _i(1)]},
            {"cols": [_s("x"), _i(1)]},
            {"cols": [_s("y"), _i(2)]},
        ]}}, ["a", "b"]),
        _ev(2, "t", {"Update": {"rows": [
            {"before_cols": [_s("x"), _i(1)], "after_cols": [_s("x"), _i(9)]},
        ]}}, ["a", "b"]),
    ]
    state = apply_changes(spark, read_events_from_strings(spark, events))
    rows = sorted((r.a, r.b) for r in state.table("testdb", "t").collect())
    assert rows == [("x", 9), ("x", 9), ("y", 2)]  # BOTH duplicates updated


def test_delete_removes_all_duplicates_nullsafe(spark):
    events = [
        _ev(0, None, {"Query": "CREATE TABLE t (a VARCHAR(5), b INT)"}),
        _ev(1, "t", {"Add": {"rows": [
            {"cols": [_s("x"), "Null"]},
            {"cols": [_s("x"), "Null"]},
            {"cols": [_s("y"), _i(2)]},
        ]}}, ["a", "b"]),
        _ev(2, "t", {"Delete": {"rows": [{"cols": [_s("x"), "Null"]}]}}, ["a", "b"]),
    ]
    state = apply_changes(spark, read_events_from_strings(spark, events))
    rows = [(r.a, r.b) for r in state.table("testdb", "t").collect()]
    assert rows == [("y", 2)]  # NULL matched NULL; both duplicates gone


def test_update_null_to_value_and_back(spark):
    events = [
        _ev(0, None, {"Query": "CREATE TABLE t (a VARCHAR(5), b INT)"}),
        _ev(1, "t", {"Add": {"rows": [{"cols": [_s("x"), "Null"]}]}}, ["a", "b"]),
        _ev(2, "t", {"Update": {"rows": [
            {"before_cols": [_s("x"), "Null"], "after_cols": [_s("x"), _i(5)]},
        ]}}, ["a", "b"]),
        _ev(3, "t", {"Update": {"rows": [
            {"before_cols": [_s("x"), _i(5)], "after_cols": ["Null", "Null"]},
        ]}}, ["a", "b"]),
    ]
    state = apply_changes(spark, read_events_from_strings(spark, events))
    rows = [(r.a, r.b) for r in state.table("testdb", "t").collect()]
    assert rows == [(None, None)]


def test_multi_row_event_and_add_run_coalescing(spark):
    adds = [
        _ev(i, "t", {"Add": {"rows": [{"cols": [_s(f"r{i}{j}"), _i(i)]} for j in range(3)]}},
            ["a", "b"])
        for i in range(1, 5)
    ]
    events = [_ev(0, None, {"Query": "CREATE TABLE t (a VARCHAR(5), b INT)"})] + adds
    state = apply_changes(spark, read_events_from_strings(spark, events))
    assert state.table("testdb", "t").count() == 12


def test_drop_and_recreate_table(spark):
    events = [
        _ev(0, None, {"Query": "CREATE TABLE t (a INT)"}),
        _ev(1, "t", {"Add": {"rows": [{"cols": [_i(1)]}]}}, ["a"]),
        _ev(2, None, {"Query": "DROP TABLE t"}),
        _ev(3, None, {"Query": "CREATE TABLE t (z VARCHAR(3))"}),
        _ev(4, "t", {"Add": {"rows": [{"cols": [_s("hi")]}]}}, ["z"]),
    ]
    state = apply_changes(spark, read_events_from_strings(spark, events))
    t = state.table("testdb", "t")
    assert t.columns == ["z"]
    assert [r.z for r in t.collect()] == ["hi"]


def test_schema_evolution_add_column_mid_stream(spark):
    events = [
        _ev(0, None, {"Query": "CREATE TABLE t (a INT)"}),
        _ev(1, "t", {"Add": {"rows": [{"cols": [_i(1)]}]}}, ["a"]),
        _ev(2, None, {"Query": "ALTER TABLE t ADD COLUMN b VARCHAR(5)"}),
        _ev(3, "t", {"Add": {"rows": [{"cols": [_i(2), _s("new")]}]}}, ["a", "b"]),
    ]
    state = apply_changes(spark, read_events_from_strings(spark, events))
    rows = sorted((r.a, r.b) for r in state.table("testdb", "t").collect())
    assert rows == [(1, None), (2, "new")]


def test_k6_guard_row_wider_than_header(spark):
    # guard fires in the codec at decode time (ValueError inside the
    # Arrow batch → surfaces as a PythonException from the action)
    events = [
        _ev(0, None, {"Query": "CREATE TABLE t (a INT)"}),
        _ev(1, "t", {"Add": {"rows": [{"cols": [_i(1), _s("extra")]}]}}, ["a"]),
    ]
    with pytest.raises(Exception, match="K6"):
        apply_changes(spark, read_events_from_strings(spark, events))


def test_untyped_bootstrap_without_ddl(spark):
    # Row events for a table the registry never saw: self-describing
    # header bootstraps a string-typed table (SURVEY §1.5).
    events = [_ev(1, "t", {"Add": {"rows": [{"cols": [_s("v"), _i(3)]}]}}, ["a", "b"])]
    state = apply_changes(spark, read_events_from_strings(spark, events))
    rows = [(r.a, r.b) for r in state.table("testdb", "t").collect()]
    assert rows == [("v", "3")]


def test_shuffled_batch_order_independent(spark):
    """The batch's row order must not matter: run grouping orders by
    sequence internally, so a shuffled pet scenario produces the same
    golden table as the ordered one."""
    import random

    shuffled = list(PET_EVENTS)
    random.Random(42).shuffle(shuffled)
    state = apply_changes(spark, read_events_from_strings(spark, shuffled))
    pet = state.table("flvdb", "pet")
    rows = sorted(
        tuple(str(v) if v is not None else None for v in r)
        for r in pet.collect()
    )
    golden_state = apply_changes(
        spark, read_events_from_strings(spark, PET_EVENTS)
    )
    golden = sorted(
        tuple(str(v) if v is not None else None for v in r)
        for r in golden_state.table("flvdb", "pet").collect()
    )
    assert rows == golden


def test_local_kernel_matches_distributed_on_pet(spark):
    """The driver-local fast path and the distributed kernel produce the
    identical typed table for the pet fixture (schema AND values,
    including the ALTER-added nullable column)."""
    from fluvio_demo_apps_rust_spark.operators.apply import apply_events_local

    dist = apply_changes(spark, read_events_from_strings(spark, PET_EVENTS))
    local = apply_events_local(spark, PET_EVENTS)
    d, l = dist.table("flvdb", "pet"), local.table("flvdb", "pet")
    assert d.schema == l.schema
    assert sorted(map(tuple, d.collect())) == sorted(map(tuple, l.collect()))
    dist.release()


def test_local_kernel_falls_back_above_threshold(spark):
    """Above the row gate the local kernel delegates to the distributed
    one (and still produces the right result)."""
    from fluvio_demo_apps_rust_spark.operators.apply import apply_events_local

    state = apply_events_local(spark, PET_EVENTS, max_rows=0)
    rows = state.table("flvdb", "pet").collect()
    assert len(rows) == 2
    state.release()
