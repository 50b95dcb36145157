"""Negative control for the oracle-parity harness: the canonicalizer
in tools/check_correctness.py must DETECT differences, not just bless
everything — a gate that can't fail is no gate. Pure-Python (no Spark
session): exercises canon_rows on value, order, column-name, and float
edge cases."""

from __future__ import annotations

import importlib.util
import math
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    Path(__file__).resolve().parent.parent / "tools" / "check_correctness.py",
)
_cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cc)

canon_rows = _cc.canon_rows


def test_identical_rows_match_regardless_of_order():
    a = canon_rows(["x", "y"], [(1, "a"), (2, "b")])
    b = canon_rows(["x", "y"], [(2, "b"), (1, "a")])
    assert a == b


def test_column_order_is_name_sorted():
    a = canon_rows(["y", "x"], [("a", 1)])
    b = canon_rows(["x", "y"], [(1, "a")])
    assert a == b


def test_value_difference_is_detected():
    a = canon_rows(["x"], [(1,), (2,)])
    b = canon_rows(["x"], [(1,), (3,)])
    assert a != b


def test_row_count_difference_is_detected():
    assert canon_rows(["x"], [(1,)]) != canon_rows(["x"], [(1,), (1,)])


def test_float_int_boundary_and_null():
    """Driver-grade type-faithful canon (r3 regression pins).

    The r3 driver failed q70 on float 3.0 vs int 3 and q77 on a DuckDB
    HUGEINT (Decimal) vs BIGINT while the old local canon collapsed
    both — these pins keep the local gate at least as strict as the
    driver's hash.
    """
    import decimal

    # q70 class: float NEVER collapses to int
    assert canon_rows(["x"], [(2.0,)]) != canon_rows(["x"], [(2,)])
    # q77 class: Decimal (HUGEINT via Arrow) is distinct from int AND float
    assert canon_rows(["x"], [(decimal.Decimal(5),)]) != canon_rows(["x"], [(5,)])
    assert canon_rows(["x"], [(decimal.Decimal(5),)]) != canon_rows(["x"], [(5.0,)])
    assert canon_rows(["x"], [(float("nan"),)]) != canon_rows(["x"], [(None,)])
    # full-repr floats: no 9-dp rounding masks ulp-level divergence
    assert canon_rows(["x"], [(1.00000000001,)]) != canon_rows(["x"], [(1.0,)])
    assert canon_rows(["x"], [(1.1000000000001,)]) != canon_rows(["x"], [(1.1,)])
    assert canon_rows(["x"], [(1.1,)]) == canon_rows(["x"], [(1.1,)])
    assert canon_rows(["x"], [(1.1,)]) != canon_rows(["x"], [(1.2,)])
    assert not math.isnan(1.0)  # keep math import honest


def test_fround_floor_semantics_and_negative_zero(spark):
    """Pin the repo-standard binary rounding helpers: floor(x*10^n+0.5)
    semantics, and the no-minus-zero guarantee that round() lacks
    (llm_dsir_importance hit 0.0-vs--0.0 at sf0.1)."""
    import math

    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.plans.base import fround, qavg, qsum, quant

    df = spark.createDataFrame(
        [(1.2345649,), (1.2345651,), (-0.0000002,), (2.5,), (-2.5,)], "x double"
    )
    rows = df.select(
        fround(F.col("x"), 6).alias("f6"), quant(F.col("x"), 6).alias("q6")
    ).collect()
    assert [r.f6 for r in rows] == [1.234565, 1.234565, 0.0, 2.5, -2.5]
    # -0.0 never escapes: floor(-0.2)= -1? no: -0.0000002*1e6+0.5 = 0.3 -> 0
    assert math.copysign(1.0, rows[2].f6) == 1.0  # +0.0, not -0.0
    assert [r.q6 for r in rows] == [1234565, 1234565, 0, 2500000, -2500000]
    # string column names are coerced
    assert df.select(fround("x", 2).alias("f")).first().f == 1.23

    agg = df.select(F.col("x").alias("v")).agg(
        qsum(F.col("v"), 2).alias("s"), qavg(F.col("v"), 2).alias("a")
    ).first()
    # quantized cents: 123 + 123 + 0 + 250 + -250 = 246 -> 2.46; avg over 5
    assert agg.s == 2.46
    assert agg.a == 2.46 / 5


def test_fround_matches_duckdb_floor_text(spark):
    """The Spark helper and the oracle floor text must agree value-for-
    value — including half boundaries where round() splits engines.

    The DuckDB side casts the literal to DOUBLE first: a bare SQL
    literal like 75.195 is DECIMAL(5,3) in DuckDB and multiplies
    EXACTLY (75.195*100 = 7519.500 -> floor 7520), while the binary
    double is 75.19499999999999 (-> floor 7519). Real oracles always
    floor expressions containing double COLUMNS (or `/` divisions,
    which return DOUBLE), so the double path is the one under test —
    but never build an oracle whose floor input is an all-DECIMAL
    literal expression."""
    import duckdb
    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.plans.base import fround

    vals = [0.1235, 75.195, 43973.5e-4, 0.0000005, -0.0000005, 2.675]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.f for r in sdf.select(fround(F.col("x"), 2).alias("f")).collect()]
    want = [
        duckdb.sql(
            f"SELECT floor(CAST({v!r} AS DOUBLE) * 100 + 0.5) / 100.0"
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want
    # and the exact-decimal divergence is real — pin it so nobody
    # "simplifies" an oracle into decimal-literal arithmetic
    assert duckdb.sql("SELECT floor(75.195 * 100 + 0.5) / 100.0").fetchone()[0] == 75.2
    assert got[1] == 75.19
