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
    # 2.0 canonicalizes to "2" (matches a BIGINT 2 from the other
    # engine), NaN and NULL are distinct, tiny deltas beyond the 9-dp
    # canon round are ignored but real deltas are not
    assert canon_rows(["x"], [(2.0,)]) == canon_rows(["x"], [(2,)])
    assert canon_rows(["x"], [(float("nan"),)]) != canon_rows(["x"], [(None,)])
    # the int-exactness check runs BEFORE the 9-dp round, so a double
    # infinitesimally off an integer is strict-mismatched against the
    # exact integer — safe-side strictness (queries pin rounding anyway)
    assert canon_rows(["x"], [(1.00000000001,)]) != canon_rows(["x"], [(1.0,)])
    # away from integers the 9-dp canon round absorbs sub-9dp noise
    assert canon_rows(["x"], [(1.1000000000001,)]) == canon_rows(["x"], [(1.1,)])
    assert canon_rows(["x"], [(1.1,)]) != canon_rows(["x"], [(1.2,)])
    assert not math.isnan(1.0)  # keep math import honest
