"""Regression-pin the testdata contract.

The round-2 events regression (driver re-generated ``events.parquet``
as ``timestamp[us]`` while ``_events`` still assumed int64-nanos) broke
9 queries silently until the driver's correctness run. This module
would have caught it at commit time: it reads every table's parquet
schema with pyarrow and asserts that the loaders accept the layout the
files actually have — independently of what the query logic does with
the columns afterwards.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pyarrow.types as pat
import pytest

from fluvio_demo_apps_rust_spark.plans.base import load
from fluvio_demo_apps_rust_spark.plans.events import _events

from .conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_all_tables_exist_and_load(spark):
    for table in TABLES:
        path = Path(SF_SMOKE) / f"{table}.parquet"
        assert path.exists(), f"missing testdata table: {path}"
        df = load(spark, SF_SMOKE, table)
        # Loader must produce a readable non-empty frame with columns.
        assert df.columns, table
        assert df.limit(1).count() == 1, f"{table} is empty or unreadable"


def test_events_ts_layout_accepted(spark):
    """``_events`` must accept whatever dtype events.parquet ships with.

    Two layouts have been observed across driver rounds: TIMESTAMP(NANOS)
    (Spark reads as int64 with nanosAsLong) and timestamp[us] (read as
    TIMESTAMP_NTZ). Either way the loader must yield a plain TIMESTAMP
    column and the frame must be actionable (the round-2 failure threw
    AnalysisException before any query logic ran).
    """
    schema = pq.read_schema(Path(SF_SMOKE) / "events.parquet")
    ts_field = schema.field("ts")
    assert pat.is_timestamp(ts_field.type) or pat.is_int64(ts_field.type), (
        f"unexpected events.ts physical type {ts_field.type}; "
        "extend _events' dtype branch in plans/events.py"
    )
    e = _events(spark, SF_SMOKE)
    assert dict(e.dtypes)["ts"] == "timestamp"
    # Force execution through the converted column: the round-2 bug only
    # surfaced at analysis time of an expression over ts.
    row = e.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert row.lo is not None and row.hi >= row.lo


def test_expected_key_columns_present(spark):
    """Pin the column names the query surface depends on per table."""
    expected = {
        "events": {"event_id", "ts", "user_id", "event_type", "value"},
        "documents": {"doc_id", "text"},
        "embeddings": {"vec_id", "embedding"},
        "lineitem": {"l_orderkey", "l_quantity", "l_extendedprice", "l_discount"},
        "orders": {"o_orderkey", "o_custkey", "o_totalprice"},
        "customer": {"c_custkey", "c_nationkey"},
    }
    for table, cols in expected.items():
        have = set(load(spark, SF_SMOKE, table).columns)
        missing = cols - have
        assert not missing, f"{table} lost columns {missing}; loaders/queries assume them"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_events_layout_consistent_across_sfs(sf_dir):
    """All SFs must share one events layout (bench runs at sf0.1)."""
    smoke = pq.read_schema(Path(SF_SMOKE) / "events.parquet").field("ts").type
    other = pq.read_schema(Path(sf_dir) / "events.parquet").field("ts").type
    assert smoke == other, f"events.ts dtype differs between {SF_SMOKE} and {sf_dir}"
