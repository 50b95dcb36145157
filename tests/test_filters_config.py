"""Db filters (F1-F3) + profile loading."""

from __future__ import annotations

import json

import pytest

from fluvio_demo_apps_rust_spark.config import ConfigError, Filters, PipelineProfile
from fluvio_demo_apps_rust_spark.operators.filters import db_filter, skip_begin_statements
from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings


def _ev(seq, db, op):
    return json.dumps(
        {"uri": f"flv://srv/{db}" if db else "flv://srv",
         "sequence": seq, "bn_file": {"fileName": "b.1", "offset": seq},
         "operation": op}
    )


EVENTS = [
    _ev(0, "Alpha", {"Query": "CREATE DATABASE Alpha"}),
    _ev(1, "beta", {"Query": "BEGIN"}),
    _ev(2, "beta", {"Query": "CREATE TABLE x (a INT)"}),
    _ev(3, None, {"Query": "SET autocommit=1"}),
]


def test_filters_validation():
    with pytest.raises(ConfigError):
        Filters(include_dbs=("a",), exclude_dbs=("b",))
    f = Filters(include_dbs=("AlPhA",))
    assert f.allows("alpha") and f.allows("ALPHA")
    assert not f.allows("beta")
    assert f.allows(None)                      # producer: no-db passes
    assert not f.allows(None, drop_no_db=True)  # consumer: dropped


def test_db_filter_include(spark):
    df = read_events_from_strings(spark, EVENTS)
    out = db_filter(df, Filters(include_dbs=("alpha",)))
    assert sorted(r.sequence for r in out.collect()) == [0, 3]  # no-db passes
    out2 = db_filter(df, Filters(include_dbs=("alpha",)), drop_no_db=True)
    assert sorted(r.sequence for r in out2.collect()) == [0]


def test_db_filter_exclude(spark):
    df = read_events_from_strings(spark, EVENTS)
    out = db_filter(df, Filters(exclude_dbs=("BETA",)))
    assert sorted(r.sequence for r in out.collect()) == [0, 3]


def test_skip_begin(spark):
    df = read_events_from_strings(spark, EVENTS)
    out = skip_begin_statements(df)
    assert sorted(r.sequence for r in out.collect()) == [0, 2, 3]


def test_profile_load(tmp_path):
    p = tmp_path / "profile.toml"
    p.write_text(
        """
mysql_resource_name = "mysql-srv1"
trigger_ms = 250
scd2_history = true

[data]
base_path = "/tmp/events"
checkpoint_path = "/tmp/ckpt"
state_path = "/tmp/state"

[filters]
include_dbs = ["FlvDb"]
"""
    )
    prof = PipelineProfile.load(p)
    assert prof.resource_name == "mysql-srv1"
    assert prof.filters.include_dbs == ("flvdb",)
    assert prof.trigger_ms == 250
    assert prof.source_path == "/tmp/events"
    assert prof.scd2_history is True


def test_profile_rejects_both_filters(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text(
        """
[filters]
include_dbs = ["a"]
exclude_dbs = ["b"]
"""
    )
    with pytest.raises(ConfigError):
        PipelineProfile.load(p)
