"""SCD2 interval builder: version chaining, deletes, re-adds."""

from __future__ import annotations

from fluvio_demo_apps_rust_spark.operators.scd2 import scd2_intervals


def _rows(df):
    return sorted(
        (r["key"], r["v"], r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
        for r in df.collect()
    )


def test_versions_chain_and_close(spark):
    changes = spark.createDataFrame(
        [
            (1, 10, "Add", "a"),
            (1, 20, "Update", "b"),
            (1, 30, "Update", "c"),
            (2, 11, "Add", "x"),
        ],
        "key long, sequence long, op_type string, v string",
    )
    out = _rows(scd2_intervals(changes, key_col="key", attr_cols=("v",)))
    assert out == [
        (1, "a", 10, 20, False),
        (1, "b", 20, 30, False),
        (1, "c", 30, None, True),
        (2, "x", 11, None, True),
    ]


def test_delete_closes_without_emitting_a_version(spark):
    changes = spark.createDataFrame(
        [
            (1, 10, "Add", "a"),
            (1, 20, "Delete", None),
        ],
        "key long, sequence long, op_type string, v string",
    )
    out = _rows(scd2_intervals(changes, key_col="key", attr_cols=("v",)))
    # the Add's interval is closed by the Delete; nothing is current
    assert out == [(1, "a", 10, 20, False)]


def test_readd_after_delete_opens_a_new_current_version(spark):
    changes = spark.createDataFrame(
        [
            (1, 10, "Add", "a"),
            (1, 20, "Delete", None),
            (1, 30, "Add", "b"),
        ],
        "key long, sequence long, op_type string, v string",
    )
    out = _rows(scd2_intervals(changes, key_col="key", attr_cols=("v",)))
    assert out == [(1, "a", 10, 20, False), (1, "b", 30, None, True)]
