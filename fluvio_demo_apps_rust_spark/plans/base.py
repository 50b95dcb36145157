"""Query-surface registry.

Each declared query (SURVEY §7.3) is a :class:`QuerySpec`: a PySpark
builder ``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet tables. The driver hash-compares both sides, order-insensitive,
column names sorted — so every computed column is aliased identically
on both sides, doubles are rounded, and timestamps are emitted as epoch
BIGINT or formatted strings (never raw timestamps) to keep rendering
byte-identical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Registration order preserved (dicts are ordered).
REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    headline: bool = False  # include in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def fround(col, scale: int):
    """Binary-deterministic fractional round to ``scale`` decimals.

    ``floor(x * 10^scale + 0.5) / 10^scale`` — unlike ``F.round``
    (Double.toString-based HALF_UP, diverges from DuckDB's binary
    rounding at shortest-repr half boundaries: q36/q60/q86), ``floor``
    operates on the binary double value on BOTH engines, so identical
    input doubles always produce identical output. SQL twin:
    ``floor(x * 10^scale + 0.5) / 10^scale.0``.
    """
    from pyspark.sql import functions as F

    col = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def quant(col, scale: int = 2):
    """Per-row exact quantization: ``floor(x * 10^scale + 0.5)`` as LONG.

    The fully-safe money pattern from the repo findings: quantize each
    row to an exact BIGINT BEFORE aggregating, so neither engine's
    float-summation order nor round() implementation can diverge. SQL
    twin: ``CAST(floor(x * 10^scale + 0.5) AS BIGINT)``.
    """
    from pyspark.sql import functions as F

    m = float(10**scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)).cast("long")


def qsum(col, scale: int = 2):
    """Deterministic sum of doubles at ``scale`` decimals: exact integer
    sum of per-row quantized values, emitted as the (deterministic,
    correctly-rounded-once) double quotient. SQL twin:
    ``sum(CAST(floor(x * 10^s + 0.5) AS BIGINT)) / 10^s.0``."""
    from pyspark.sql import functions as F

    return F.sum(quant(col, scale)) / F.lit(float(10**scale))


def qavg(col, scale: int = 2):
    """Deterministic average at ``scale`` decimals (NULLs excluded, like
    avg). SQL twin:
    ``sum(CAST(floor(x*10^s+0.5) AS BIGINT)) / (count(x) * 10^s.0)``."""
    from pyspark.sql import functions as F

    return F.sum(quant(col, scale)) / (F.count(col) * F.lit(float(10**scale)))


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan. Filters/projections applied by callers reach the
    scan via Catalyst pushdown — verify with .explain('formatted')."""
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
