"""Property-based codec parity: for random events over ALL Value
kinds, the Arrow (Python) decoder and the JVM Variant decoder produce
identical normalized rows, and both match value_to_canonical."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fluvio_demo_apps_rust_spark.codec import parse_events
from fluvio_demo_apps_rust_spark.schemas import value_to_canonical

# JSON string content: no quotes/backslashes, and no control characters
# (C0/C1 escaping style legitimately differs between json.dumps and
# Jackson — both are valid JSON; the engine pins raw-UTF-8 for the rest)
_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters='"\\',
        exclude_categories=("Cc", "Cs", "Co", "Cn"),
    ),
    max_size=12,
)

value = st.one_of(
    st.just("Null"),
    st.builds(lambda x: {"String": x}, _text),
    st.builds(lambda x: {"SignedInteger": x}, st.integers(-(2**62), 2**62)),
    st.builds(lambda x: {"UnsignedInteger": x}, st.integers(0, 255)),
    st.builds(lambda x: {"Enum": x}, st.integers(0, 30000)),
    st.builds(lambda x: {"Year": x}, st.integers(1901, 2155)),
    # plain-notation range where Python repr == Java Double.toString
    st.builds(
        lambda x: {"Double": x},
        st.floats(min_value=0.001, max_value=9_999_999, allow_nan=False),
    ),
    st.builds(lambda x: {"Decimal": x}, st.from_regex(r"-?[0-9]{1,10}\.[0-9]{1,4}", fullmatch=True)),
    st.builds(
        lambda y, m, d: {"Date": {"year": y, "month": m, "day": d}},
        st.integers(1000, 9999), st.integers(1, 12), st.integers(1, 28),
    ),
    st.builds(
        lambda h, mi, s, us: {"Time": {"hours": h, "minutes": mi, "seconds": s, "subseconds": us}},
        st.integers(0, 23), st.integers(0, 59), st.integers(0, 59), st.integers(0, 999999),
    ),
    st.builds(
        lambda t, us: {"Timestamp": {"unix_time": t, "subsecond": us}},
        st.integers(0, 2**31 - 1), st.integers(0, 999999),
    ),
    # sizes straddle 57: Spark's base64 MIME-chunks (CR+LF per 76 output
    # chars) above that, so >57-byte blobs pin codec.b64_nochunk
    st.builds(lambda b: {"Blob": b}, st.lists(st.integers(0, 255), max_size=80)),
    st.builds(
        lambda kv: {"Json": dict(kv)},
        st.lists(st.tuples(_text, st.integers(-100, 100)), max_size=4),
    ),
)


@st.composite
def add_event(draw):
    cols = draw(st.lists(value, min_size=1, max_size=6))
    names = [f"c{i}" for i in range(len(cols))]
    return {
        "uri": "flv://srv/propdb/t",
        "sequence": draw(st.integers(0, 1000)),
        "bn_file": {"fileName": "binlog.000001", "offset": 4},
        "columns": names,
        "operation": {"Add": {"rows": [{"cols": cols}]}},
    }


def test_decoder_parity_large_blob(spark):
    """Deterministic pin for the >57-byte blob MIME-chunk bug: Spark's
    ``base64`` inserts CR+LF every 76 output chars, so any blob over 57
    bytes diverged between the JVM and Arrow codec paths until
    codec.b64_nochunk (r7). 64 bytes crosses the chunk boundary."""
    blob = list(range(64))
    ev = {
        "uri": "flv://srv/propdb/t",
        "sequence": 7,
        "bn_file": {"fileName": "binlog.000001", "offset": 4},
        "columns": ["c0"],
        "operation": {"Add": {"rows": [{"cols": [{"Blob": blob}]}]}},
    }
    raw = spark.createDataFrame(
        [(json.dumps(ev, separators=(",", ":")),)], "value string"
    )
    a = parse_events(raw, jvm=False).collect()
    b = parse_events(raw, jvm=True).collect()
    assert a == b
    got = a[0].rows[0].after[0]
    assert got == value_to_canonical({"Blob": blob})
    assert "\r" not in got and "\n" not in got


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(add_event(), min_size=1, max_size=4))
def test_decoder_parity_random_values(spark, events):
    lines = [json.dumps(e, separators=(",", ":")) for e in events]
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    a = parse_events(raw, jvm=False).orderBy("sequence", "uri").collect()
    b = parse_events(raw, jvm=True).orderBy("sequence", "uri").collect()
    assert a == b
    # and the Python path matches the scalar golden directly
    for ev, row in zip(sorted(events, key=lambda e: (e["sequence"], e["uri"])),
                       sorted(a, key=lambda r: (r.sequence, r.uri))):
        expect = [value_to_canonical(v) for v in ev["operation"]["Add"]["rows"][0]["cols"]]
        assert list(row.rows[0].after) == expect
