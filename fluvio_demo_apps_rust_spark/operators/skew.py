"""Skew-handling operators: salted aggregation and salted join.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py) which splits oversized shuffle partitions at
runtime. These explicit operators are for the cases AQE can't fix:
a single hot KEY (AQE splits partitions, not keys) in a groupBy, or a
hot key on the probe side of a non-broadcastable join.

- ``salted_agg``: two-phase aggregation — partial aggregate on
  (key, salt) spreads one hot key over ``salt`` reducers, then the
  tiny per-salt partials reduce on the key alone. Works for any
  algebraic aggregate (sum/count/min/max — the decomposable ones).
- ``salted_join``: explode the build side ``salt`` ways (every build
  row tagged with each salt value), salt the probe side
  deterministically, equi-join on (key, salt): a hot probe key's rows
  land on ``salt`` different reducers instead of one.

Salts derive from a hash of the probe row, not rand(): deterministic
retries and reproducible plans.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _salt_col(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt in [0, salt): hash of all columns.
    xxhash64 is cheap, JVM-side, and stable across retries."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (keys..., salt);
    phase 2 re-reduces partials on the keys (count re-reduces as sum).
    """
    merge = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, (_, fn) in aggs.items():
        if fn not in merge:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn("_salt", _salt_col(df, salt))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge[fn])(f"_p_{out}").alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: build side replicated ``salt`` ways
    (build must be the smaller side — its shuffle volume multiplies by
    ``salt``), probe side salted deterministically; join keys become
    (on..., salt). Output columns match ``probe.join(build, on, how)``.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    build_rep = build.select("*", salts)
    probe_s = probe.withColumn("_salt", _salt_col(probe, salt))
    out = probe_s.join(build_rep, [*on, "_salt"], how)
    return out.drop("_salt")
