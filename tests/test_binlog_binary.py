"""Binary binlog ingestion: a synthetic MySQL binlog-v4 file (built
byte-by-byte per the public format spec: magic, 19-byte headers,
FORMAT_DESCRIPTION with CRC32 checksums, QUERY / TABLE_MAP /
WRITE·UPDATE·DELETE_ROWS_v2) carrying the reference's nine-event pet
scenario must parse into the documented wire JSON and apply to
PET_GOLDEN — the binary-input twin of the JSON fixture path
(reference: cdc-mysql/src/producer/binlog_manager/binlog_parser.rs).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from fluvio_demo_apps_rust_spark.sources.binlog_binary import (
    BinlogError,
    parse_binlog_bytes,
)

from fluvio_demo_apps_rust_spark.fixtures_binlog import (
    T_DATE,
    T_STRING,
    T_VARCHAR,
    BinlogWriter,
    pet_binlog_bytes as _pet_binlog,
)


PET_COLS = {("flvdb", "pet"): ["name", "owner", "species", "sex", "birth", "last_vaccine"]}


def test_parse_produces_wire_events():
    events = parse_binlog_bytes(_pet_binlog(), columns_by_table=PET_COLS)
    import json

    objs = [json.loads(e) for e in events]
    assert len(objs) == 9  # 3 queries + 6 row events
    assert [o["sequence"] for o in objs] == list(range(9))
    ops = [next(iter(o["operation"])) for o in objs]
    assert ops == ["Query", "Query", "Add", "Add", "Update", "Query", "Delete", "Add", "Update"]
    add = objs[2]["operation"]["Add"]["rows"][0]["cols"]
    assert add[0] == {"String": "Puffball"}
    assert add[4] == {"Date": {"year": 1999, "month": 3, "day": 30}}
    upd = objs[8]["operation"]["Update"]["rows"][0]
    assert upd["before_cols"][5] == "Null"
    assert upd["after_cols"][5] == {"Date": {"year": 2020, "month": 6, "day": 10}}
    assert objs[2]["columns"] == ["name", "owner", "species", "sex", "birth"]
    assert objs[7]["columns"] == PET_COLS[("flvdb", "pet")]
    # offsets are the events' byte positions — strictly increasing
    offs = [o["bn_file"]["offset"] for o in objs]
    assert offs == sorted(offs) and offs[0] > 4


def test_binlog_applies_to_pet_golden(spark):
    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.codec import parse_events
    from fluvio_demo_apps_rust_spark.fixtures import PET_GOLDEN
    from fluvio_demo_apps_rust_spark.operators.apply import apply_changes

    events = parse_binlog_bytes(_pet_binlog(), columns_by_table=PET_COLS)
    df = spark.createDataFrame([(e,) for e in events], "value string")
    state = apply_changes(spark, parse_events(df))
    pet = state.table("flvdb", "pet").select(
        "name", "owner", "species", "sex",
        F.date_format("birth", "yyyy-MM-dd").alias("birth"),
        F.date_format("last_vaccine", "yyyy-MM-dd").alias("last_vaccine"),
    )
    assert sorted(tuple(r) for r in pet.collect()) == sorted(PET_GOLDEN)


def test_resume_from_offset_skips_but_keeps_table_state():
    """S2 semantics: resuming past the first Add must still decode later
    row events (TABLE_MAP state is rebuilt from the full scan)."""
    full = parse_binlog_bytes(_pet_binlog(), columns_by_table=PET_COLS)
    import json

    first_add_off = json.loads(full[2])["bn_file"]["offset"]
    resumed = parse_binlog_bytes(
        _pet_binlog(), columns_by_table=PET_COLS,
        start_offset=first_add_off + 1, start_sequence=3,
    )
    objs = [json.loads(e) for e in resumed]
    assert len(objs) == 6  # everything after the first Add
    assert [next(iter(o["operation"])) for o in objs] == [
        "Add", "Update", "Query", "Delete", "Add", "Update",
    ]
    assert objs[0]["sequence"] == 3


def test_corrupt_crc_raises():
    data = bytearray(_pet_binlog())
    data[-1] ^= 0xFF  # clobber last event's checksum
    with pytest.raises(BinlogError, match="CRC32"):
        parse_binlog_bytes(bytes(data), columns_by_table=PET_COLS)


def test_unsupported_type_strict_vs_lenient():
    w = BinlogWriter()
    w.query("db1", "CREATE TABLE t (g BIT(8))")
    w.table_map(7, "db1", "t", [0x10], [0])  # MYSQL_TYPE_BIT — unsupported
    w.rows(0x1E, 7, 1, [["x"]])
    with pytest.raises(BinlogError):
        parse_binlog_bytes(bytes(w.buf), strict=True)
    lenient = parse_binlog_bytes(bytes(w.buf), strict=False)
    assert len(lenient) == 1  # the DDL survives, the bad row event drops


def test_distributed_binaryfile_read(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.sources.binlog_binary import read_binlog_files

    (tmp_path / "binlog.000001").write_bytes(_pet_binlog())
    df = read_binlog_files(spark, str(tmp_path / "binlog.*"), columns_by_table=PET_COLS)
    vals = [r.value for r in df.collect()]
    assert vals == parse_binlog_bytes(_pet_binlog(), columns_by_table=PET_COLS)


# ---------------------------------------------------------------------------
# The reference's REAL binary fixtures (cdc-mysql/test_files/*) — data
# inputs, not code. A writer/reader round-trip over our own synthetic
# bytes cannot catch a shared misreading of the format; these can (and
# did: the FDE in-use-flag checksum and the STRING metadata byte order
# were both found by binlog.000002/.000003).
# ---------------------------------------------------------------------------

import json as _json
import os as _os

_REF_DIR = "/root/reference/cdc-mysql/test_files"
_have_ref = pytest.mark.skipif(
    not _os.path.isdir(_REF_DIR), reason="reference fixtures not present"
)


def _ref_events(name, **kw):
    with open(_os.path.join(_REF_DIR, name), "rb") as f:
        data = f.read()
    return [
        _json.loads(e)
        for e in parse_binlog_bytes(data, file_name=name, strict=True, **kw)
    ]


@_have_ref
def test_real_fixture_vendored_identical():
    """The vendored copy (fixtures/binlog.000003, shipped so the
    oracle-gated cdc_binlog_real_pet query runs without a reference
    checkout) must stay byte-identical to the upstream fixture."""
    from fluvio_demo_apps_rust_spark.fixtures_binlog import real_pet_binlog_bytes

    with open(_os.path.join(_REF_DIR, "binlog.000003"), "rb") as f:
        assert real_pet_binlog_bytes() == f.read()


@_have_ref
def test_real_fixture_000001_parses_empty():
    # FORMAT_DESCRIPTION + PREVIOUS_GTIDS + STOP: valid file, no data events
    assert _ref_events("binlog.000001") == []


@_have_ref
def test_real_fixture_000003_pet_scenario():
    """binlog.000003 is the reference's recorded pet demo session; it must
    decode to the documented wire shape (cdc-mysql/README.md:223-231).
    Its FORMAT_DESCRIPTION still has LOG_EVENT_BINLOG_IN_USE_F set, so
    this also pins the flag-cleared CRC rule."""
    objs = _ref_events(
        "binlog.000003",
        columns_by_table={
            ("flvTest", "pet"): ["name", "owner", "species", "sex", "birth"],
        },
    )
    ops = [next(iter(o["operation"])) for o in objs]
    assert ops == ["Query"] * 2 + ["Add", "Add", "Update", "Query", "Delete",
                                   "Query"] + ["Add"] * 6
    assert [o["sequence"] for o in objs] == list(range(14))
    assert objs[0]["operation"] == {"Query": "create database flvTest"}
    assert objs[2]["uri"] == "flv://mysql-srv1/flvTest/pet"
    assert objs[2]["columns"] == ["name", "owner", "species", "sex", "birth"]
    assert objs[2]["operation"] == {
        "Add": {
            "rows": [{"cols": [
                {"String": "Puffball"}, {"String": "Diane"},
                {"String": "hamster"}, {"String": "f"},
                {"Date": {"year": 1999, "month": 3, "day": 30}},
            ]}]
        }
    }
    # the mid-stream ALTER adds a column; the Delete that follows carries
    # six values, the last one Null
    assert objs[5]["operation"] == {"Query": "ALTER TABLE pet ADD COLUMN death DATE"}
    del_cols = objs[6]["operation"]["Delete"]["rows"][0]["cols"]
    assert len(del_cols) == 6 and del_cols[5] == "Null"
    # file offsets are monotonically increasing real byte positions
    offs = [o["bn_file"]["offset"] for o in objs]
    assert offs == sorted(offs) and offs[0] > 4


@_have_ref
@pytest.mark.slow
def test_real_fixture_000002_timezone_load():
    """3.1 MB of mysql.time_zone* bulk INSERTs — 7,204 write-rows events /
    138,182 rows, including ENUM-typed columns hidden in STRING metadata."""
    objs = _ref_events("binlog.000002")
    ops = [next(iter(o["operation"])) for o in objs]
    assert len(objs) == 7208
    assert ops.count("Add") == 7204 and ops.count("Query") == 4
    n_rows = sum(
        len(o["operation"]["Add"]["rows"]) for o in objs if "Add" in o["operation"]
    )
    assert n_rows == 138182
    # mysql.time_zone.Use_leap_seconds is ENUM('Y','N') — decoded via the
    # STRING real-type metadata path
    tz_adds = [o for o in objs if o["uri"].endswith("/time_zone")]
    assert tz_adds and all(
        "Enum" in row["cols"][1]
        for o in tz_adds for row in o["operation"]["Add"]["rows"]
    )


# ---------------------------------------------------------------------------
# Full §1.4 value-type coverage (values.rs:9-45): ENUM, YEAR, DATETIME2,
# TIME2, TIMESTAMP2, NEWDECIMAL, JSON round-trip through the writer.
# ---------------------------------------------------------------------------


def test_typed_roundtrip_all_value_types():
    from fluvio_demo_apps_rust_spark.fixtures_binlog import (
        GEOM_POINT_WKB,
        TYPED_BINLOG_COLUMNS,
        typed_binlog_bytes,
    )

    objs = [
        _json.loads(e)
        for e in parse_binlog_bytes(
            typed_binlog_bytes(), columns_by_table=TYPED_BINLOG_COLUMNS
        )
    ]
    assert [next(iter(o["operation"])) for o in objs] == [
        "Query", "Query", "Add", "Update",
    ]
    cols = objs[2]["operation"]["Add"]["rows"][0]["cols"]
    assert cols == [
        {"SignedInteger": 7},
        {"String": "widget"},
        {"Enum": 2},
        {"Year": 1999},
        {"DateTime": {"year": 2024, "month": 3, "day": 30,
                      "hour": 21, "minute": 31, "second": 30,
                      "subsecond": 120000}},
        {"Time": {"hours": 21, "minutes": 31, "seconds": 30,
                  "subseconds": 500000}},
        {"Timestamp": {"unix_time": 1524885322, "subsecond": 250000}},
        {"Decimal": "-12345.6789"},
        {"Json": {"a": 2, "b": [True, None, "x"], "c": -1.5}},
        {"Set": 5},  # bitmask {'x','z'} = bits 0 and 2
        # NEGATIVE fsp>0 TIME2: the fractional bytes participate in the
        # two's-complement borrow — a 3-byte-only negate would decode
        # 10:30:29.750000. Sign itself is dropped (reference Value::Time
        # has no sign field).
        {"Time": {"hours": 10, "minutes": 30, "seconds": 30,
                  "subseconds": 250000}},
        # GEOMETRY: SRID+WKB bytes carried opaque as Blob
        {"Blob": list(GEOM_POINT_WKB)},
    ]
    after = objs[3]["operation"]["Update"]["rows"][0]["after_cols"]
    assert after[7] == {"Decimal": "0.0000"}  # negative-zero never emitted


def test_geometry_decodes_as_opaque_blob():
    # GEOMETRY (0xff): meta = length-prefix width; payload = SRID+WKB,
    # carried through opaque as Blob (reference values.rs:16 parity).
    from fluvio_demo_apps_rust_spark.fixtures_binlog import GEOM_POINT_WKB
    from fluvio_demo_apps_rust_spark.sources.binlog_binary import (
        T_GEOMETRY,
        _read_value,
    )

    data = len(GEOM_POINT_WKB).to_bytes(4, "little") + GEOM_POINT_WKB + b"\xab"
    v, pos = _read_value(T_GEOMETRY, 4, data, 0)
    assert v == {"Blob": list(GEOM_POINT_WKB)}
    assert pos == 4 + len(GEOM_POINT_WKB)  # trailing byte untouched


@pytest.mark.parametrize(
    "text,precision,scale",
    [
        ("0.0000", 12, 4),
        ("1.5000", 12, 4),
        ("-1.5000", 12, 4),
        ("123456789012345678", 18, 0),
        ("-123456789012345678", 18, 0),
        ("0.123456789012345678", 18, 18),
        ("-0.000000001", 20, 9),
        ("99999999.99", 10, 2),
        ("-99999999.99", 10, 2),
    ],
)
def test_newdecimal_binary_roundtrip(text, precision, scale):
    from fluvio_demo_apps_rust_spark.fixtures_binlog import _enc_decimal
    from fluvio_demo_apps_rust_spark.sources.binlog_binary import _read_decimal

    buf = _enc_decimal(text, precision, scale)
    got, pos = _read_decimal(buf, 0, precision, scale)
    assert pos == len(buf)
    expect = text.lstrip("-") if set(text) <= set("-.0") else text
    assert got == expect


# --- r8: GEOMETRY carry property (VERDICT r7 task 7) ----------------------
# The 25-/61-byte fixtures pin two points; these cover the CLASS:
# random payload lengths straddling the 57-byte base64 chunk boundary
# and every length-prefix meta width 1-4, through binlog parse -> wire
# JSON -> (Spark test) codec b64 + apply full-row match.

import json as _gj

from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

# lengths around the base64 MIME-chunk boundaries (57-byte input ->
# 76-char line) plus small/empty edges; general lengths as fallback
_B64_EDGE = [0, 1, 25, 55, 56, 57, 58, 59, 61, 76, 113, 114, 115]
_GLEN = _st.one_of(_st.sampled_from(_B64_EDGE), _st.integers(0, 200))


def _geo_binlog(metaw: int, payloads: list[bytes], moved: bytes) -> bytes:
    from fluvio_demo_apps_rust_spark.fixtures_binlog import (
        T_GEOMETRY,
        BinlogWriter,
    )

    w = BinlogWriter()
    w.query("gdb", "CREATE DATABASE gdb")
    w.query("gdb", "CREATE TABLE g (id INT, loc GEOMETRY)")
    types, metas = [0x03, T_GEOMETRY], [0, metaw]
    rows = [[("int4", i), ("geom", p, metaw)] for i, p in enumerate(payloads)]
    w.table_map(77, "gdb", "g", types, metas)
    w.rows(0x1E, 77, 2, rows)
    w.table_map(77, "gdb", "g", types, metas)
    w.rows(0x1F, 77, 2, [(rows[0], [("int4", 0), ("geom", moved, metaw)])])
    return bytes(w.buf)


@_settings(max_examples=60, deadline=None)
@_given(metaw=_st.integers(1, 4), data=_st.data())
def test_geometry_parse_property_meta_widths_and_lengths(metaw, data):
    """Binlog parse level: every meta width x boundary length decodes
    to the exact byte list, and the UPDATE before/after images carry
    the blobs unchanged."""
    n = data.draw(_st.integers(1, 3))
    lens = [data.draw(_GLEN) for _ in range(n)]
    payloads = [data.draw(_st.binary(min_size=ln, max_size=ln)) for ln in lens]
    moved_len = data.draw(_GLEN)
    moved = data.draw(_st.binary(min_size=moved_len, max_size=moved_len))

    events = parse_binlog_bytes(
        _geo_binlog(metaw, payloads, moved),
        columns_by_table={("gdb", "g"): ["id", "loc"]},
    )
    objs = [_gj.loads(e) for e in events]
    writes = [o for o in objs if "Add" in o.get("operation", {})]
    updates = [o for o in objs if "Update" in o.get("operation", {})]
    assert len(writes) == 1 and len(updates) == 1
    got = [r["cols"][1] for r in writes[0]["operation"]["Add"]["rows"]]
    assert got == [{"Blob": list(p)} for p in payloads]
    urow = updates[0]["operation"]["Update"]["rows"][0]
    assert urow["before_cols"][1] == {"Blob": list(payloads[0])}
    assert urow["after_cols"][1] == {"Blob": list(moved)}


@_settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(data=_st.data())
def test_geometry_apply_b64_property(spark, data):
    """Full chain: binlog parse -> apply (full-row UPDATE match on a
    random binary value) -> JVM-side b64_nochunk == Python canonical
    base64, at chunk-boundary lengths where Spark's raw base64 would
    MIME-split."""
    import base64

    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.codec import b64_nochunk
    from fluvio_demo_apps_rust_spark.operators.apply import apply_events_local

    lens = [data.draw(_st.sampled_from(_B64_EDGE)) for _ in range(2)]
    payloads = [data.draw(_st.binary(min_size=ln, max_size=ln)) for ln in lens]
    mlen = data.draw(_st.sampled_from(_B64_EDGE))
    moved = data.draw(_st.binary(min_size=mlen, max_size=mlen))
    metaw = data.draw(_st.integers(1, 4))

    events = parse_binlog_bytes(
        _geo_binlog(metaw, payloads, moved),
        columns_by_table={("gdb", "g"): ["id", "loc"]},
    )
    state = apply_events_local(spark, events)
    rows = (
        state.table("gdb", "g")
        .select("id", b64_nochunk(F.col("loc")).alias("b64"))
        .collect()
    )
    expect = {0: moved, 1: payloads[1]} if len(payloads) > 1 else {0: moved}
    got = {r.id: r.b64 for r in rows}
    assert got == {
        i: base64.b64encode(p).decode() for i, p in expect.items()
    }
