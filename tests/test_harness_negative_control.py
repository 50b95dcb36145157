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
