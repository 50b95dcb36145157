"""Registry-walking oracle/schema lint (r5 verdict #7).

The q70/q77/q66 failure class: a DuckDB oracle whose OUTPUT TYPE
silently diverges from the Spark side even when the values match —
``sum(BIGINT)`` → HUGEINT, bare integer ``/`` → DOUBLE vs Spark LONG,
a raw array column the driver's canonicalizer cannot hash (q57), a
raw timestamp. Instead of regex-guessing over SQL text, this lint
TYPE-CHECKS both sides for every registered query: DuckDB resolves
the oracle's output schema lazily (no execution) and Spark's
DataFrame schema comes from the plan; both are reduced to hash-canon
classes and must agree, and the forbidden types can appear on neither
side. A deliberately regressed oracle (negative control) must fail.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from fluvio_demo_apps_rust_spark.plans import REGISTRY

from .conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# classes the order-insensitive value hash treats as distinct
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_SPARK_CLASS = {
    "byte": "int", "short": "int", "integer": "int", "long": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
}


def duck_class(t: str) -> str:
    t = str(t).upper()
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY", "UNION")):
        return "forbidden:nested (driver canon cannot hash it — q57 class)"
    if t.startswith(("HUGEINT", "UHUGEINT")):
        return f"forbidden:{t} (CAST the aggregate — q77 class)"
    if t.startswith("DECIMAL"):
        # decimal is canon-SAFE iff both sides are decimal with the
        # SAME SCALE: the driver canon renders via str(Decimal), which
        # depends on scale ('3.1' vs '3.10') but not precision. A
        # decimal against an int/float side still fails as a class
        # mismatch (the original q77 hazard). q111_decimal_pricing is
        # the deliberate exercise of this path.
        scale = t.rsplit(",", 1)[-1].rstrip(")") if "," in t else "0"
        return f"decimal:{scale.strip()}"
    if t.startswith("TIMESTAMP"):
        return "forbidden:timestamp (emit epoch BIGINT or a string)"
    if t in _DUCK_INT:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    return f"forbidden:{t}"


def spark_class(dt) -> str:
    name = dt.typeName()
    if name in _SPARK_CLASS:
        return _SPARK_CLASS[name]
    if name == "decimal":
        return f"decimal:{dt.scale}"  # see duck_class: scale-keyed
    if name.startswith("timestamp"):
        return "forbidden:timestamp (emit epoch BIGINT or a string)"
    return f"forbidden:{name} (driver canon cannot hash it — q57 class)"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_SMOKE}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _oracle_schema(con, sql: str) -> dict[str, str]:
    rel = con.sql(sql)  # lazy — resolves types without executing
    return {c: duck_class(t) for c, t in zip(rel.columns, rel.types)}


def test_all_oracles_type_align_with_spark(spark, duck):
    failures = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        try:
            o_schema = _oracle_schema(duck, spec.oracle)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: oracle does not resolve: {e}")
            continue
        s_schema = {
            f.name: spark_class(f.dataType)
            for f in spec.fn(spark, SF_SMOKE).schema.fields
        }
        for col, cls in sorted({**o_schema, **s_schema}.items()):
            oc, sc = o_schema.get(col), s_schema.get(col)
            if oc is None or sc is None:
                failures.append(
                    f"{name}.{col}: present on one side only "
                    f"(oracle={oc}, spark={sc}) — alias drift"
                )
            elif oc.startswith("forbidden"):
                failures.append(f"{name}.{col}: oracle type {oc}")
            elif sc.startswith("forbidden"):
                failures.append(f"{name}.{col}: spark type {sc}")
            elif oc != sc:
                failures.append(
                    f"{name}.{col}: class mismatch oracle={oc} spark={sc} "
                    "(hash-diverges even when values match — q70 class)"
                )
    assert not failures, "\n".join(failures)


def test_lint_catches_regressed_oracles(duck):
    """Negative control: each historical failure class must be flagged."""
    hugeint = _oracle_schema(duck, "SELECT sum(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)")
    assert hugeint["s"].startswith("forbidden:HUGEINT")

    ratio = _oracle_schema(duck, "SELECT CAST(1 AS BIGINT) / 60 AS r")
    assert ratio["r"] == "float"  # diverges when Spark emits LONG → class mismatch

    arr = _oracle_schema(duck, "SELECT [1, 2] AS a")
    assert arr["a"].startswith("forbidden:nested")

    ts = _oracle_schema(duck, "SELECT TIMESTAMP '2020-01-01 00:00:00' AS ts")
    assert ts["ts"].startswith("forbidden:timestamp")


def test_decimal_scale_keying(duck):
    """Decimal handling: same-scale decimal on both sides aligns;
    scale drift or decimal-vs-int still fails (str(Decimal) renders
    '3.10' for scale 2 and '3.1' for scale 1 — values equal, hash
    not)."""
    d2 = _oracle_schema(duck, "SELECT CAST(1.5 AS DECIMAL(18,2)) AS v")
    assert d2["v"] == "decimal:2"
    d4 = _oracle_schema(
        duck,
        "SELECT sum(CAST(1.5 AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(18,2))) AS v "
        "FROM (VALUES (1)) t(x)",
    )
    assert d4["v"] == "decimal:4"  # DuckDB sum(DECIMAL(36,4)) keeps scale 4
    from pyspark.sql.types import DecimalType

    assert spark_class(DecimalType(38, 2)) == "decimal:2"
    assert spark_class(DecimalType(22, 4)) == "decimal:4"
    # decimal vs int is a class mismatch, never silently equal
    assert spark_class(DecimalType(38, 2)) != "int"
