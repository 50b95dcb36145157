"""Sequence assignment (T4): dense, binlog-position-ordered, resumable."""

from __future__ import annotations

from fluvio_demo_apps_rust_spark.operators.sequence import assign_sequence


def test_assign_sequence_orders_by_file_then_offset(spark):
    rows = [
        ("binlog.000002", 100),
        ("binlog.000001", 900),   # earlier file sorts first despite offset
        ("binlog.000002", 50),
        ("binlog.000001", 100),
        ("binlog.000010", 10),    # numeric, not lexicographic (10 > 2)
    ]
    df = spark.createDataFrame(rows, "file_name string, offset long")
    out = assign_sequence(df)
    got = [(r.file_name, r.offset, r.sequence) for r in out.orderBy("sequence").collect()]
    assert got == [
        ("binlog.000001", 100, 0),
        ("binlog.000001", 900, 1),
        ("binlog.000002", 50, 2),
        ("binlog.000002", 100, 3),
        ("binlog.000010", 10, 4),
    ]


def test_assign_sequence_resumes_from_watermark(spark):
    df = spark.createDataFrame([("binlog.000003", 5)], "file_name string, offset long")
    out = assign_sequence(df, start=42)
    assert out.collect()[0].sequence == 42
