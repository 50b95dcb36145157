"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, every query executes on sf0.001."""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_all_queries_execute_smoke(spark):
    from tests.conftest import SF_SMOKE

    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
