"""Codec: wire JSON ⇄ normalized events (golden + round-trip)."""

from __future__ import annotations

import json

from fluvio_demo_apps_rust_spark.codec import make_uri, parse_uri
from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
from fluvio_demo_apps_rust_spark.schemas import value_to_canonical
from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings


def test_parse_uri():
    assert parse_uri("flv://mysql-srv1/flvDb") == ("mysql-srv1", "flvDb", None)
    assert parse_uri("flv://mysql-srv1/flvdb/pet") == ("mysql-srv1", "flvdb", "pet")
    assert parse_uri("garbage") == (None, None, None)
    assert make_uri("srv", "db", "t") == "flv://srv/db/t"
    assert make_uri("srv", "db") == "flv://srv/db"


def test_value_canonical_all_kinds():
    assert value_to_canonical({"String": "x"}) == "x"
    assert value_to_canonical({"SignedInteger": -5}) == "-5"
    assert value_to_canonical({"UnsignedInteger": 255}) == "255"
    assert value_to_canonical({"Enum": 2}) == "2"
    assert value_to_canonical({"Year": 1999}) == "1999"
    assert value_to_canonical({"Float": 1.5}) == "1.5"
    assert value_to_canonical({"Double": 2.25}) == "2.25"
    assert value_to_canonical({"Decimal": "123.4500"}) == "123.4500"
    assert value_to_canonical({"Date": {"year": 1999, "month": 3, "day": 30}}) == "1999-03-30"
    assert (
        value_to_canonical({"Time": {"hours": 1, "minutes": 2, "seconds": 3, "subseconds": 4}})
        == "01:02:03.000004"
    )
    assert (
        value_to_canonical(
            {"DateTime": {"year": 2020, "month": 6, "day": 1, "hour": 12, "minute": 0,
                          "second": 5, "subsecond": 0}}
        )
        == "2020-06-01 12:00:05.000000"
    )
    assert value_to_canonical({"Timestamp": {"unix_time": 100, "subsecond": 0}}) == "100.000000"
    assert value_to_canonical({"Json": {"b": 1, "a": 2}}) == '{"a":2,"b":1}'
    assert value_to_canonical({"Blob": [104, 105]}) == "aGk="
    assert value_to_canonical("Null") is None


def test_parse_pet_events(spark):
    ev = read_events_from_strings(spark, PET_EVENTS).orderBy("sequence").collect()
    assert len(ev) == 9
    assert [e.op_type for e in ev] == [
        "Query", "Query", "Add", "Add", "Update", "Query", "Delete", "Add", "Update",
    ]
    add = ev[2]
    assert add.db == "flvdb" and add.table == "pet"
    assert add.columns == ["name", "owner", "species", "sex", "birth"]
    assert add.rows[0].after == ["Puffball", "Diane", "hamster", "f", "1999-03-30"]
    assert add.rows[0].before is None
    upd = ev[8]
    assert upd.rows[0].before[-1] is None  # Null last_vaccine
    assert upd.rows[0].after[-1] == "2020-06-10"
    assert ev[0].query == "CREATE DATABASE flvDb"
    assert ev[0].file_name == "binlog.000003" and ev[0].offset == 233


def test_json_decoder_parity(spark):
    """The JVM from_json decoder and the Arrow reference decoder
    produce identical normalized events — goldens plus every Value
    kind (Blob/Json/Decimal/Time/DateTime/Timestamp/Enum/Year/Float)."""
    from fluvio_demo_apps_rust_spark.codec import parse_events

    extra = (
        '{"uri":"flv://m/d/t","sequence":1,'
        '"bn_file":{"fileName":"b.1","offset":4},'
        '"columns":["a","b","c","d","e","f","g","h","i","j"],'
        '"operation":{"Update":{"rows":[{'
        '"before_cols":[{"Blob":[72,255,0,200]},{"Json":{"b":1,"a":[2,{"z":3}]}},'
        '{"Decimal":"1.250"},{"Time":{"hours":9,"minutes":8,"seconds":7,"subseconds":12}},'
        '{"DateTime":{"year":1999,"month":3,"day":30,"hour":1,"minute":2,"second":3,"subsecond":4}},'
        '{"Timestamp":{"unix_time":1591094076,"subsecond":5}},'
        '{"Enum":2},{"Year":1999},{"Float":1.5},"Null"],'
        '"after_cols":[{"String":"x"},"Null","Null","Null","Null","Null","Null","Null","Null","Null"]'
        "}]}}}"
    )
    raw = spark.createDataFrame([(s,) for s in [*PET_EVENTS, extra]], "value string")
    a = parse_events(raw, jvm=False).orderBy("sequence").collect()
    b = parse_events(raw, jvm=True).orderBy("sequence").collect()
    assert a == b
    # K6 guard raises on the JVM path too
    bad = (
        '{"uri":"flv://m/d/t","sequence":1,"bn_file":{"fileName":"b.1","offset":4},'
        '"columns":["a"],"operation":{"Add":{"rows":[{"cols":'
        '[{"SignedInteger":1},{"SignedInteger":2}]}]}}}'
    )
    import pytest

    with pytest.raises(Exception, match="K6"):
        parse_events(spark.createDataFrame([(bad,)], "value string"), jvm=True).collect()


def test_render_roundtrip(spark):
    from fluvio_demo_apps_rust_spark.codec import render_events

    parsed = read_events_from_strings(spark, PET_EVENTS)
    rendered = render_events(parsed).collect()
    reparsed = read_events_from_strings(spark, [r.value for r in rendered])
    a = parsed.orderBy("sequence").collect()
    b = reparsed.orderBy("sequence").collect()
    for x, y in zip(a, b):
        assert x.op_type == y.op_type and x.rows == y.rows and x.columns == y.columns
    # wire format: envelope keys match the reference's serde layout
    obj = json.loads(rendered[0].value)
    assert set(obj) <= {"uri", "sequence", "bn_file", "columns", "operation"}
    assert "fileName" in obj["bn_file"]
    # the JVM decoder accepts the rendered wire format identically
    from fluvio_demo_apps_rust_spark.codec import parse_events

    wire = spark.createDataFrame([(r.value,) for r in rendered], "value string")
    jvm = parse_events(wire, jvm=True).orderBy("sequence").collect()
    assert [(x.op_type, x.rows, x.columns) for x in jvm] == [
        (y.op_type, y.rows, y.columns) for y in b
    ]


def test_variant_decoder_parity(spark):
    """The retired VariantType decoder must stay output-identical to
    the Arrow golden (it is kept as a reference implementation)."""
    from fluvio_demo_apps_rust_spark.codec import _parse_events_variant, parse_events

    raw = spark.createDataFrame([(s,) for s in PET_EVENTS], "value string")
    a = parse_events(raw, jvm=False).orderBy("sequence").collect()
    v = _parse_events_variant(raw).orderBy("sequence").collect()
    assert a == v


def test_jvm_decoder_raises_on_malformed_cells(spark):
    """Parity with the Arrow golden's error posture: corrupt cells must
    raise, never silently decode to NULL."""
    import pytest

    from fluvio_demo_apps_rust_spark.codec import parse_events

    for bad_cell in ("5", '"foo"', '{"A":1,"B":2}'):
        bad = (
            '{"uri":"flv://m/d/t","sequence":1,"bn_file":{"fileName":"b.1","offset":4},'
            '"columns":["a"],"operation":{"Add":{"rows":[{"cols":[' + bad_cell + "]}]}}}"
        )
        with pytest.raises(Exception, match="malformed Value|unknown Value kind"):
            parse_events(
                spark.createDataFrame([(bad,)], "value string"), jvm=True
            ).collect()
