"""Scan-efficiency pins: predicate pushdown and column pruning must
REACH the parquet scan (the brief's explicit grading criterion — "a
scan that reads all columns for a 2-column projection is wrong").

For a representative panel across families, parse `explain formatted`
scan blocks and assert (a) the ReadSchema is exactly the columns the
query needs — never the full table — and (b) selective predicates
appear in PushedFilters. Pinned as tests so a refactor that breaks
pruning (e.g. a UDF wrapping a filter column, a select * creeping in)
fails loudly instead of silently scanning 10× the bytes at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from fluvio_demo_apps_rust_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def _scan_blocks(df, table: str) -> list[dict]:
    s = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = []
    for block in s.split("\n\n"):
        if "Scan parquet" not in block or f"{table}.parquet" not in block:
            continue
        cols: set[str] = set()
        m = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if m and m.group(1):
            cols = {f.split(":")[0] for f in m.group(1).split(",")}
        p = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        pushed = p.group(1).strip() if p else ""
        out.append({"cols": cols, "pushed": pushed})
    return out


# (query, table, max allowed scanned columns, substring that must occur
#  in PushedFilters — "" when the query has no selective predicate on
#  that table)
CASES = [
    ("q01_pricing_summary", "lineitem",
     {"l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"},
     "LessThanOrEqual(l_shipdate"),
    ("q06_revenue_delta", "lineitem",
     {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"},
     "GreaterThanOrEqual(l_discount"),
    ("q58_disjunctive_join", "part",
     {"p_partkey", "p_brand", "p_size"},
     "p_brand"),  # Catalyst extracts the single-side disjunction
    ("q05_nation_volume", "supplier",
     {"s_suppkey", "s_nationkey"},
     ""),
    ("q21_part_brand_stats", "part",
     {"p_partkey", "p_brand", "p_size"},
     "LessThan(p_size,10)"),
    ("llm_text_quality", "documents",
     {"doc_id", "text", "lang", "source", "n_chars"},
     ""),
]


@pytest.mark.parametrize("name,table,allowed,pushed_substr", CASES,
                         ids=[c[0] + ":" + c[1] for c in CASES])
def test_scan_prunes_and_pushes(spark, name, table, allowed, pushed_substr):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    blocks = _scan_blocks(df, table)
    assert blocks, f"{name}: no parquet scan of {table} found in the plan"
    for b in blocks:
        extra = b["cols"] - allowed
        assert not extra, (
            f"{name} scans {table} columns it does not need: {sorted(extra)}"
        )
    if pushed_substr:
        assert any(pushed_substr in b["pushed"] for b in blocks), (
            f"{name}: expected a pushed filter containing {pushed_substr!r}; "
            f"got {[b['pushed'] for b in blocks]}"
        )
