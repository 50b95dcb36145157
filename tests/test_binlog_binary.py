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
    w.query("db1", "CREATE TABLE t (g GEOMETRY)")
    w.table_map(7, "db1", "t", [0xFF], [0])  # MYSQL_TYPE_GEOMETRY
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
