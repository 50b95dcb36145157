"""JDBC follower-apply twin (K5 second half): ordering, commit
batching, null-sequence contract, foreachBatch + log-replay wiring.

No database exists in the sandbox, so the executor runs against a
recording PEP 249 fake whose connections journal their statements to
files (foreachPartition runs in worker processes — module state is
invisible to the driver). The reference applies statements serially
over one live connection (mysql_manager.rs:295-299); serial mode must
reproduce exactly that statement order.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

from fluvio_demo_apps_rust_spark.streaming.jdbc_executor import (
    apply_statements_batch_jdbc,
    execute_statements,
    replay_log_jdbc,
)


class RecordingConnection:
    def __init__(self, dest: str):
        self.dest = dest
        self.stmts: list[str] = []
        self.commits = 0

    def execute(self, sql: str) -> None:
        self.stmts.append(sql)

    def commit(self) -> None:
        self.commits += 1

    def close(self) -> None:
        Path(self.dest, f"conn-{uuid.uuid4().hex}.json").write_text(
            json.dumps({"stmts": self.stmts, "commits": self.commits})
        )


class RecordingConnect:
    """Picklable connection factory journaling to ``dest``."""

    def __init__(self, dest: str):
        self.dest = dest

    def __call__(self) -> RecordingConnection:
        return RecordingConnection(self.dest)


def _read_conns(dest: Path) -> list[dict]:
    return [json.loads(f.read_text()) for f in sorted(dest.glob("conn-*.json"))]


def _stmts_df(spark, rows):
    return spark.createDataFrame(rows, "sequence long, sub int, stmt string")


def test_serial_applies_in_global_sequence_order(spark, tmp_path):
    # deliberately shuffled input: order must come from (sequence, sub)
    rows = [(5, 0, "s5"), (1, 1, "s1b"), (3, 0, "s3"), (1, 0, "s1a"), (2, 0, "s2")]
    n = execute_statements(_stmts_df(spark, rows), RecordingConnect(str(tmp_path)))
    assert n == 5
    conns = _read_conns(tmp_path)
    assert len(conns) == 1  # serial = one connection
    assert conns[0]["stmts"] == ["s1a", "s1b", "s2", "s3", "s5"]
    assert conns[0]["commits"] == 1  # single final commit under the batch size


def test_commit_batching(spark, tmp_path):
    rows = [(i, 0, f"s{i}") for i in range(7)]
    execute_statements(
        _stmts_df(spark, rows), RecordingConnect(str(tmp_path)), commit_every=3
    )
    (conn,) = _read_conns(tmp_path)
    # 7 statements at commit_every=3: commits after s2, s5, and the final flush
    assert conn["commits"] == 3


def test_null_sequence_dropped(spark, tmp_path):
    rows = [(1, 0, "keep"), (None, 0, "drop-me"), (2, 0, "keep2")]
    n = execute_statements(_stmts_df(spark, rows), RecordingConnect(str(tmp_path)))
    assert n == 2
    (conn,) = _read_conns(tmp_path)
    assert conn["stmts"] == ["keep", "keep2"]


def test_parallel_ranges_are_disjoint_and_ordered(spark, tmp_path):
    rows = [(i, 0, f"s{i:03d}") for i in range(64)]
    n = execute_statements(
        _stmts_df(spark, rows), RecordingConnect(str(tmp_path)), serial=False
    )
    assert n == 64
    conns = [c for c in _read_conns(tmp_path) if c["stmts"]]
    assert len(conns) > 1  # actually parallel
    all_stmts = []
    spans = []
    for c in conns:
        assert c["stmts"] == sorted(c["stmts"])  # in-order within a connection
        spans.append((c["stmts"][0], c["stmts"][-1]))
        all_stmts.extend(c["stmts"])
    assert sorted(all_stmts) == [f"s{i:03d}" for i in range(64)]  # nothing lost
    # sequence ranges are disjoint: spans sorted by start must not overlap
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_foreachbatch_twin_matches_sql_sink_render(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.codec import parse_events
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import render_statements

    events = parse_events(spark.createDataFrame([(s,) for s in PET_EVENTS], "value string"))
    n = apply_statements_batch_jdbc(events, RecordingConnect(str(tmp_path)))
    expected = [
        r.stmt
        for r in render_statements(events).orderBy("sequence", "sub").collect()
        if r.sequence is not None
    ]
    assert n == len(expected) > 0
    (conn,) = _read_conns(tmp_path)
    assert conn["stmts"] == expected


def test_replay_log_bootstraps_follower(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.codec import parse_events
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import (
        append_statements_batch,
        read_statements_log,
    )

    log_dir = tmp_path / "log"
    conn_dir = tmp_path / "conns"
    conn_dir.mkdir()
    events = parse_events(spark.createDataFrame([(s,) for s in PET_EVENTS], "value string"))
    append_statements_batch(events, log_dir)
    n = replay_log_jdbc(spark, str(log_dir), RecordingConnect(str(conn_dir)))
    expected = [r["stmt"] for r in read_statements_log(log_dir)]
    assert n == len(expected) > 0
    (conn,) = _read_conns(conn_dir)
    assert conn["stmts"] == expected


class SqliteFollower:
    """Real PEP 249 follower: the reference's MySQL follower stand-in.

    sqlite has no CREATE DATABASE (one file == one database), so that
    single statement is a no-op here; everything else — CREATE TABLE,
    ALTER TABLE ADD COLUMN, INSERT/UPDATE/DELETE with the renderer's
    double-quoted literals and bare Null token — executes verbatim.
    """

    def __init__(self, path: str):
        import sqlite3

        self.conn = sqlite3.connect(path)

    def execute(self, sql: str) -> None:
        if sql.upper().startswith("CREATE DATABASE"):
            return
        self.conn.execute(sql)

    def commit(self) -> None:
        self.conn.commit()

    def close(self) -> None:
        self.conn.close()


class SqliteConnect:
    def __init__(self, path: str):
        self.path = path

    def __call__(self) -> SqliteFollower:
        return SqliteFollower(self.path)


def test_replay_pet_scenario_into_sqlite_follower(spark, tmp_path):
    """K5 live-follower e2e via a real DB-API connection: the pet
    scenario's rendered statements replayed through replay_log_jdbc
    into sqlite must leave the follower table equal to PET_GOLDEN —
    the reference's leader==follower check
    (cdc-mysql/scripts/helpers/mysql-validate-result.sh:70-75) with sqlite
    standing in for the follower MySQL."""
    import sqlite3

    from fluvio_demo_apps_rust_spark.codec import parse_events
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS, PET_GOLDEN
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import append_statements_batch

    log_dir = tmp_path / "log"
    db = tmp_path / "follower.db"
    events = parse_events(
        spark.createDataFrame([(s,) for s in PET_EVENTS], "value string")
    )
    append_statements_batch(events, log_dir)
    n = replay_log_jdbc(spark, str(log_dir), SqliteConnect(str(db)))
    assert n > 0
    with sqlite3.connect(db) as conn:
        rows = conn.execute(
            "SELECT name, owner, species, sex, birth, last_vaccine FROM pet ORDER BY name"
        ).fetchall()
    assert rows == sorted(PET_GOLDEN)


def test_update_delete_storm_follower_equals_spark_apply(spark, tmp_path):
    """K5 live-follower e2e, UPDATE/DELETE-heavy (r11 VERDICT #4): a
    deterministic 150-op storm (inserts with duplicate rows and NULLs,
    then full-row-match updates/deletes, some targeting absent rows)
    flows BOTH ways from the same parsed events — through the
    distributed apply kernel (operators/apply.py) AND through
    render_statements → execute_statements into a real sqlite
    follower — and the two tables must be multiset-equal. This is the
    reference's leader==follower equality
    (cdc-mysql/scripts/helpers/mysql-validate-result.sh:70-75) with the Spark
    materialization standing in for the leader, exercising the
    renderer's is-NULL full-row WHERE and all-duplicates semantics
    against a real SQL engine rather than a recording fake."""
    import json
    import sqlite3

    from fluvio_demo_apps_rust_spark.codec import parse_events
    from fluvio_demo_apps_rust_spark.operators.apply import apply_changes
    from fluvio_demo_apps_rust_spark.sources.event_source import (
        read_events_from_strings,
    )
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import render_statements

    cols = ["k", "v"]

    def cell(x):
        return "Null" if x is None else {"SignedInteger": x}

    def event(seq, payload, *, query=False):
        obj = {
            "uri": "flv://srv/stormdb" + ("" if query else "/t"),
            "sequence": seq,
            "bn_file": {"fileName": "binlog.000001", "offset": seq},
            "operation": payload,
        }
        if not query:
            obj["columns"] = cols
        return json.dumps(obj)

    x = 424242

    def rnd(n):
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 31)
        return x % n

    def rand_row():
        return tuple(None if rnd(5) == 0 else rnd(4) for _ in cols)

    model: list[tuple] = []
    events = [event(0, {"Query": "CREATE TABLE t (k INT, v INT)"}, query=True)]
    for seq in range(1, 151):
        kind = rnd(10)
        if kind < 3 or not model:  # 30% inserts, 2 rows each
            rows = [rand_row(), rand_row()]
            model.extend(rows)
            payload = {
                "Add": {"rows": [{"cols": [cell(a), cell(b)]} for a, b in rows]}
            }
        elif kind < 7:  # 40% updates (full-row match, all duplicates)
            before = model[rnd(len(model))] if rnd(5) else rand_row()
            after = rand_row()
            while after == before:  # renderer needs >=1 changed column
                after = rand_row()
            payload = {
                "Update": {
                    "rows": [
                        {
                            "before_cols": [cell(before[0]), cell(before[1])],
                            "after_cols": [cell(after[0]), cell(after[1])],
                        }
                    ]
                }
            }
            model = [after if r == before else r for r in model]
        else:  # 30% deletes (full-row match, all duplicates)
            target = model[rnd(len(model))] if rnd(5) else rand_row()
            payload = {
                "Delete": {"rows": [{"cols": [cell(target[0]), cell(target[1])]}]}
            }
            model = [r for r in model if r != target]
        events.append(event(seq, payload))

    # path A: the distributed apply kernel
    state = apply_changes(spark, read_events_from_strings(spark, events))
    spark_rows = sorted(
        ((r.k, r.v) for r in state.table("stormdb", "t").collect()),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    state.release()

    # path B: rendered SQL executed by a real DB-API follower
    db = tmp_path / "storm_follower.db"
    parsed = parse_events(
        spark.createDataFrame([(s,) for s in events], "value string")
    )
    n = execute_statements(render_statements(parsed), SqliteConnect(str(db)))
    assert n > 100
    with sqlite3.connect(db) as conn:
        follower_rows = sorted(
            conn.execute("SELECT k, v FROM t").fetchall(),
            key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
        )

    assert follower_rows == spark_rows
    # the storm must actually exercise the heavy paths: rows survived,
    # and the model (a third, independent replay) agrees too
    assert len(spark_rows) > 10
    assert spark_rows == sorted(
        model, key=lambda t: (t[0] is None, t[0], t[1] is None, t[1])
    )
