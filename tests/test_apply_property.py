"""Property-based test: the distributed apply kernel agrees with a
naive in-memory replay on random event streams — random multi-row
inserts, full-row-match updates/deletes (including duplicate rows and
NULLs), in random interleavings.

Reference semantics under test (SURVEY §7.4.2-3): update/delete match
the WHOLE row null-safely and affect ALL duplicate rows."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fluvio_demo_apps_rust_spark.operators.apply import apply_changes
from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings

COLS = ["k", "v"]


def _cell(x):
    return "Null" if x is None else {"SignedInteger": x}


def _event(seq: int, op: str, payload) -> str:
    obj = {
        "uri": "flv://srv/propdb/t",
        "sequence": seq,
        "bn_file": {"fileName": "binlog.000001", "offset": seq},
        "columns": COLS,
        "operation": payload,
    }
    if op == "Query":
        obj.pop("columns")
        obj["uri"] = "flv://srv/propdb"
    return json.dumps(obj)


val = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
row = st.tuples(val, val)


@st.composite
def event_stream(draw):
    """(events-json, final-table-model) for a random op sequence."""
    model: list[tuple] = []
    events = [_event(0, "Query", {"Query": "CREATE TABLE t (k INT, v INT)"})]
    n_ops = draw(st.integers(min_value=1, max_value=8))
    for i in range(1, n_ops + 1):
        kind = draw(st.sampled_from(["add", "add", "update", "delete"]))
        if kind == "add" or not model:
            rows = draw(st.lists(row, min_size=1, max_size=3))
            model.extend(rows)
            payload = {"Add": {"rows": [{"cols": [_cell(a), _cell(b)] } for a, b in rows]}}
        elif kind == "update":
            before = draw(st.sampled_from(model + [draw(row)]))
            after = draw(row)
            payload = {"Update": {"rows": [{
                "before_cols": [_cell(before[0]), _cell(before[1])],
                "after_cols": [_cell(after[0]), _cell(after[1])],
            }]}}
            model = [after if r == before else r for r in model]
        else:
            target = draw(st.sampled_from(model + [draw(row)]))
            payload = {"Delete": {"rows": [{"cols": [_cell(target[0]), _cell(target[1])]}]}}
            model = [r for r in model if r != target]
        events.append(_event(i, kind, payload))
    return events, sorted(model, key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]))


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_stream())
def test_apply_matches_naive_replay(spark, data):
    events_json, expected = data
    events = read_events_from_strings(spark, events_json)
    state = apply_changes(spark, events)
    got = sorted(
        ((r.k, r.v) for r in state.table("propdb", "t").collect()),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    state.release()
    assert got == expected


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_stream())
def test_local_kernel_matches_naive_replay(spark, data):
    # the driver-local fast path must produce the identical fixpoint
    from fluvio_demo_apps_rust_spark.operators.apply import apply_events_local

    events_json, expected = data
    state = apply_events_local(spark, events_json)
    got = sorted(
        ((r.k, r.v) for r in state.table("propdb", "t").collect()),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    assert got == expected
