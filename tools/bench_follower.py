#!/usr/bin/env python
"""Live-follower apply throughput for the K5 second half (r11 verdict
#4's measurement companion): how fast the rendered-SQL path drives a
REAL SQL engine over a DB-API connection, not a recording fake.

Pipeline measured (clock starts after the wire fixture exists):

    parse_events -> render_statements (Arrow batches)
      -> execute_statements (serial, one connection, batched commits)
      -> sqlite follower file

on the SAME event volume cdc_orders_roundtrip / tools/bench_stream.py
use (every orders row at the given SF as a wire Add event, plus the
CREATE TABLE DDL through the K5 passthrough). The follower table is
row-count- and key-sum-verified against the source before any number
is reported. A render-only variant (noop sink) splits the Spark
render cost from the DB-API execute cost.

The reference applies statements serially over one live MySQL
connection (mysql_manager.rs:295-299) behind a 500 ms poll /
bounded(100) channel pacing (~200 msgs/s design ceiling); this
measures the same serial-apply contract minus the network.

Prints ONE JSON line:
  {"metric": "cdc follower apply throughput (sqlite via DB-API)",
   "sf": .., "events": N,
   "variants": {name: {"wall_sec": t, "stmts_per_sec": r, ...}}}
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fluvio_demo_apps_rust_spark.codec import parse_events
from fluvio_demo_apps_rust_spark.plans.cdc import (
    ORDERS_DDL_EVENT,
    orders_wire_events,
)
from fluvio_demo_apps_rust_spark.session import get_spark
from fluvio_demo_apps_rust_spark.streaming.jdbc_executor import execute_statements
from fluvio_demo_apps_rust_spark.streaming.sql_sink import render_statements


class SqliteFollower:
    """PEP 249 follower; CREATE DATABASE is a no-op (one file == one
    database in sqlite), everything else executes verbatim — same
    stand-in as tests/test_jdbc_executor.py's."""

    def __init__(self, path: str):
        import sqlite3

        self.conn = sqlite3.connect(path)
        # benchmark is throughput of the APPLY path, not sqlite fsync:
        # a real follower runs with its own durability settings
        self.conn.execute("PRAGMA synchronous=OFF")
        self.conn.execute("PRAGMA journal_mode=MEMORY")

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


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench_follower")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    import pyspark.sql.functions as F

    ddl = spark.createDataFrame([(ORDERS_DDL_EVENT,)], "value string")
    wire = ddl.unionByName(orders_wire_events(spark, sf_dir))
    n_events = wire.count()  # materializes the fixture cost up front
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
        .collect()[0]
    )

    variants: dict[str, dict] = {}

    # render-only baseline: the Spark-side cost of parse + render
    t0 = time.perf_counter()
    render_statements(parse_events(wire)).write.format("noop").mode(
        "overwrite"
    ).save()
    t_render = time.perf_counter() - t0
    variants["render_only_noop"] = {
        "wall_sec": round(t_render, 3),
        "stmts_per_sec": round(n_events / t_render),
    }

    for name, commit_every in (("serial_commit500", 500), ("serial_commit5000", 5000)):
        db = Path(tempfile.mkdtemp(prefix="bench_follower_")) / "follower.db"
        t0 = time.perf_counter()
        n_exec = execute_statements(
            render_statements(parse_events(wire)),
            SqliteConnect(str(db)),
            serial=True,
            commit_every=commit_every,
        )
        wall = time.perf_counter() - t0
        import sqlite3

        with sqlite3.connect(db) as conn:
            got_n, got_sum = conn.execute(
                "SELECT count(*), CAST(sum(o_orderkey) AS INTEGER) FROM orders_r"
            ).fetchone()
        assert n_exec == n_events, (n_exec, n_events)
        assert (got_n, got_sum) == (src.n, src.key_sum), (
            (got_n, got_sum),
            (src.n, src.key_sum),
        )
        variants[name] = {
            "wall_sec": round(wall, 3),
            "stmts_per_sec": round(n_exec / wall),
            "applied_rows": got_n,
            "db_execute_share": round(max(wall - t_render, 0.0) / wall, 3),
        }

    print(
        json.dumps(
            {
                "metric": "cdc follower apply throughput (sqlite via DB-API)",
                "sf": sf,
                "events": n_events,
                "variants": variants,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
