"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (and the oracle);
random-hyperplane LSH bucketing is the scale path — candidates come
from an equi-join on bucket signatures instead of the full cross
product. The dot products run JVM-side (``zip_with`` + ``aggregate``
fold — element order fixed, so results are bit-reproducible against
an oracle computing the same left-to-right sum in doubles).

Scale posture: brute force is O(Q·N) — fine for a bounded probe set,
never for all-pairs at 100 TB; the LSH path shuffles each side once on
the bucket key and joins bucket-locally, with the hyperplane dim count
(nb) trading recall for bucket size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .dedup import md5_int60

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
    "cast(0.0 AS double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate({a}, cast(0.0 AS double), "
    "(acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
)


def dot(a: str, b: str) -> Column:
    return F.expr(DOT.format(a=a, b=b))


def norm(a: str) -> Column:
    return F.expr(NORM.format(a=a))


def cosine(a: str, b: str) -> Column:
    return F.expr(
        f"{DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)})"
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the probe set against the corpus,
    rank per query with a window (one shuffle on the query id)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine("q_vec", "n_vec"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane(j: int, dim: int) -> str:
    """SQL array expr for deterministic pseudo-random hyperplane j:
    component i = (md5int('hp_<j>_<i>') % 2001 - 1000) / 1000.0 —
    reproducible in DuckDB with the same formula."""
    comps = ", ".join(
        f"(cast(conv(substring(md5('hp_{j}_{i}'), 1, 15), 16, 10) AS bigint) % 2001 - 1000) / 1000.0"
        for i in range(dim)
    )
    return f"array({comps})"


def lsh_signature(vec_col: str, nb: int, dim: int) -> Column:
    """nb-bit random-hyperplane signature: bit j = 1 if v·h_j > 0."""
    bits = [
        f"CASE WHEN {DOT.format(a=vec_col, b=hyperplane(j, dim))} > 0 THEN 1 ELSE 0 END"
        for j in range(nb)
    ]
    return F.expr("concat(" + ", ".join(f"cast(({b}) AS string)" for b in bits) + ")")


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nb: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: exact rescoring restricted to same-bucket candidates."""
    from pyspark.sql import Window

    sig = lsh_signature(vec_col, nb, dim)
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), sig.alias("bucket"))
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), sig.alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", F.round(cosine("q_vec", "n_vec"), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
