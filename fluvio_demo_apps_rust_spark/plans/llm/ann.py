"""Similarity-search family: exact top-k, LSH and IVF ANN, recall/MRR evaluation, quantization (SQ8/PQ), hard-negative mining, k-means.

Split from plans/llm.py (r10 verdict #5); registration order across
the split is irrelevant — plans/__init__ orders the driver-visible
enumeration by canonical_order.ORDER.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ...functions import curation as C  # noqa: F401
from ...functions import dedup as X  # noqa: F401
from ...functions import multimodal as M  # noqa: F401
from ...functions import similarity as S  # noqa: F401
from ...functions import text as TX  # noqa: F401
from ...functions import web as W  # noqa: F401
from ..base import REGISTRY as _REGISTRY  # noqa: F401  (same-package oracle reuse)
from ..base import fround, load, register  # noqa: F401
from .common import (  # noqa: F401
    _ANN_RANKED,
    _JL_SUMSQ,
    _PQ_ADC_CTES,
    _PQ_L2_SQL,
    _dot_sql,
    _jl_spark,
    _jl_sql,
    _l2full_sql,
    _lsh_sig_sql,
    _norm_sql,
    _pq_d2_sql,
    _sqdist_sql,
)



@register(
    "llm_ann_topk",
    headline=True,
    tags=("llm", "similarity", "ann"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
scored AS (
  SELECT q_id, n.vec_id AS n_id,
         floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
  FROM n CROSS JOIN q
  WHERE n.vec_id <> q_id)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored)
WHERE rank <= 5
""",
)
def llm_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for a 10-query probe set
    (broadcast probes × corpus, window rank per query)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.brute_force_topk(e, q, k=5)
    return out.select("q_id", "n_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


@register(
    "llm_hard_negatives",
    tags=("llm", "similarity", "ann", "embedding", "training"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
scored AS (
  SELECT q_id, n.vec_id AS n_id,
         floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
  FROM n CROSS JOIN q
  WHERE n.vec_id <> q_id),
hard AS (SELECT * FROM scored WHERE cos_sim < 0.95)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM hard)
WHERE rank <= 5
""",
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive embedding training — for
    each anchor, the most-similar corpus items that are NOT the anchor
    or its near-duplicates (cos ≥ 0.95 excluded: those are positives /
    dup noise, and training against them poisons the objective). The
    top-5 below the margin are exactly the negatives an InfoNCE /
    triplet fine-tune wants: close enough to be informative, far
    enough to be true negatives. Rank order uses the QUANTIZED cosine
    with n_id tie-break, the family's cross-engine-stable ordering.

    100 TB shape: identical to the probed llm_ann_topk — broadcast
    probe set × corpus with row-local fold dots, per-anchor
    WindowGroupLimit (top-k pushdown, never a global sort); the
    margin filter is row-local before the rank. Production swaps the
    brute-force candidate pass for the LSH/IVF bucket joins exactly
    as llm_ann_lsh does — same mining semantics on top."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "embedding", S.norm("embedding").alias("nrm"))
    q = n.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        n.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            fround(
                S.dot("qv", "embedding") / (F.col("qn") * F.col("nrm")), 6
            ).alias("cos_sim"),
        )
    )
    hard = scored.where(F.col("cos_sim") < 0.95)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        hard.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("q_id", "n_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "llm_hard_negatives_lsh",
    tags=("llm", "similarity", "ann", "lsh", "training"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm,
                  {_lsh_sig_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bucket FROM n WHERE vec_id < 10),
scored AS (
  SELECT q_id, n.vec_id AS n_id,
         floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
  FROM n JOIN q USING (bucket)
  WHERE n.vec_id <> q_id),
hard AS (SELECT * FROM scored WHERE cos_sim < 0.95)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM hard)
WHERE rank <= 5
""",
)
def llm_hard_negatives_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH of llm_hard_negatives: candidates come from the
    8-bit random-hyperplane LSH bucket join instead of the brute-force
    cross product — exactly the brute-force→LSH swap the ANN family
    pins via the llm_ann_topk / llm_ann_lsh pairing, now for the
    mining gate (cos ≥ 0.95 candidates dropped BEFORE the per-anchor
    rank: near-duplicates are positives, not negatives). Same-bucket
    candidates are already similarity-biased, which is what a
    hard-negative miner wants — the bucket join IS the "hard" part.

    100 TB shape: one shuffle per side on the bucket key, margin
    filter row-local, per-anchor WindowGroupLimit — no cross
    product anywhere (the llm_ann_lsh probed shape + one filter)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.lsh_bucketed_topk(e, q, k=5, nb=8, dim=64, max_cos=0.95)
    return out.select(
        "q_id", "n_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    )


@register(
    "llm_ann_lsh",
    tags=("llm", "similarity", "ann", "lsh"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm,
                  {_lsh_sig_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bucket FROM n WHERE vec_id < 10),
scored AS (
  SELECT q_id, n.vec_id AS n_id,
         floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
  FROM n JOIN q USING (bucket)
  WHERE n.vec_id <> q_id)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored)
WHERE rank <= 5
""",
)
def llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: 8-bit random-hyperplane signatures, exact
    rescoring within the bucket only (the 100 TB path: one shuffle per
    side on the bucket key, no cross product)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.lsh_bucketed_topk(e, q, k=5, nb=8, dim=64)
    return out.select("q_id", "n_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


@register(
    "llm_ann_ivf",
    tags=("llm", "similarity", "ann", "ivf"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm FROM embeddings),
cent AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm FROM n WHERE vec_id < 16),
assign AS (
  SELECT vec_id, embedding, nrm, c_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY floor(({_dot_sql('embedding', 'c_vec')} / (nrm * c_nrm)) * 1000000 + 0.5) / 1000000.0 DESC, c_id
         ) AS rn
  FROM n CROSS JOIN cent),
corpus AS (SELECT vec_id AS n_id, embedding AS n_vec, nrm AS n_nrm, c_id AS cell
           FROM assign WHERE rn = 1),
probes AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm, c_id AS cell
           FROM assign WHERE vec_id < 10 AND rn <= 2),
scored AS (
  SELECT q_id, n_id,
         floor(({_dot_sql('q_vec', 'n_vec')} / (q_nrm * n_nrm)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
  FROM corpus JOIN probes USING (cell)
  WHERE n_id <> q_id)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored)
WHERE rank <= 5
""",
)
def llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: 16 deterministic centroid cells, nprobe=2 — candidate
    set ≈ N/8 per query, cell-keyed equi-join instead of a cross
    product (the inverted-file scale path; see similarity.ivf_topk)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.ivf_topk(e, q, k=5, ncells=16, nprobe=2)
    return out.select("q_id", "n_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


@register(
    "llm_ann_recall",
    tags=("llm", "similarity", "ann", "quality"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm,
                  {_lsh_sig_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bucket FROM n WHERE vec_id < 10),
brute AS ({_ANN_RANKED.format(dot=_dot_sql('qv', 'n.embedding'), src='n CROSS JOIN q')}),
lshk AS ({_ANN_RANKED.format(dot=_dot_sql('qv', 'n.embedding'), src='n JOIN q USING (bucket)')})
SELECT b.q_id AS q_id,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN l.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       floor((sum(CASE WHEN l.n_id IS NOT NULL THEN 1 ELSE 0 END) / count(*)::DOUBLE) * 1000000 + 0.5) / 1000000.0
           AS recall
FROM brute b LEFT JOIN lshk l ON l.q_id = b.q_id AND l.n_id = b.n_id
GROUP BY b.q_id
""",
)
def llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate: recall@5 of the LSH-bucketed index against the
    exact brute-force ranking, per probe query — the standard way to
    tune nb/bands before trusting an approximate index at scale. Both
    sides are existing engine operators; the comparison is one
    broadcast-size left join + a 10-row aggregate."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = S.brute_force_topk(e, q, k=5).select("q_id", "n_id")
    lsh = (
        S.lsh_bucketed_topk(e, q, k=5, nb=8, dim=64)
        .select("q_id", "n_id")
        .withColumn("_m", F.lit(1))
    )
    return (
        brute.join(lsh, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("n_hit"),
            fround(
                F.sum(F.coalesce(F.col("_m"), F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                6).alias("recall"),
        )
    )


@register(
    "llm_kmeans",
    tags=("llm", "embedding", "clustering"),
    oracle=f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (SELECT vec_id AS c_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_vec
       FROM e WHERE vec_id < 8),
d1 AS (SELECT vec_id, c_id, floor(({_sqdist_sql('embedding', 'c_vec')}) * 1000000 + 0.5) / 1000000.0 AS d
       FROM e CROSS JOIN c0),
a1 AS (SELECT vec_id, c_id AS cluster
       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn FROM d1)
       WHERE rn = 1),
m1 AS (SELECT cluster, i,
              sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
              / (count(*) * 1000000.0) AS m
       FROM a1 JOIN e USING (vec_id)
       CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
       GROUP BY cluster, i),
c1 AS (SELECT cluster AS c_id, list(m ORDER BY i) AS c_vec FROM m1 GROUP BY cluster),
d2 AS (SELECT vec_id, c_id, floor(({_sqdist_sql('embedding', 'c_vec')}) * 1000000 + 0.5) / 1000000.0 AS d
       FROM e CROSS JOIN c1)
SELECT vec_id, cluster, dist FROM (
  SELECT vec_id, c_id AS cluster, d AS dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn
  FROM d2)
WHERE rn = 1
""",
)
def llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd's k-means round (k=8: broadcast-argmin assignment,
    per-position centroid-mean recompute) plus the final assignment —
    the iterative clustering primitive behind IVF/SemDeDup centroids.
    Assignment is a map-side struct-min aggregate (no window sort on
    the corpus); the recompute shuffle carries k*dim rows regardless of
    corpus size. Distances and means are 6-dp-pinned so the oracle's
    two mirrored rounds land on identical values."""
    e = load(spark, sf_dir, "embeddings")
    return S.kmeans(e, k=8, iters=1)


@register(
    "llm_gram_matrix",
    tags=("llm", "embedding", "linalg", "pca"),
    oracle="""
SELECT i.i AS i, j.j AS j,
       sum(CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[j.j + 1] AS DOUBLE) * 10000 + 0.5) AS BIGINT)) / 10000.0 AS gram
FROM embeddings,
     (SELECT unnest(generate_series(0, 63)) AS i) i,
     (SELECT unnest(generate_series(0, 63)) AS j) j
WHERE i.i <= j.j
GROUP BY i.i, j.j
""",
)
def llm_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix XᵀX of the embedding corpus (upper
    triangle, 0-based (i, j, gram)) — the reduce step of corpus-scale
    PCA/whitening. Per-partition BLAS partials, d² doubles shuffled
    per task regardless of corpus size."""
    return S.gram_matrix(load(spark, sf_dir, "embeddings"))


@register(
    "llm_knn_classify",
    tags=("llm", "embedding", "knn", "classify"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, label, {_norm_sql('embedding')} AS nrm FROM embeddings),
p AS (SELECT * FROM n WHERE vec_id < 100),
scored AS (
  SELECT p.vec_id AS q, p.label AS true_label, c.vec_id AS nb, c.label AS nb_label,
         floor(({_dot_sql('p.embedding', 'c.embedding')} / (p.nrm * c.nrm)) * 1000000 + 0.5) / 1000000.0 AS sim
  FROM p JOIN n c ON c.vec_id <> p.vec_id),
top AS (
  SELECT q, true_label, nb_label FROM (
    SELECT q, true_label, nb_label,
           row_number() OVER (PARTITION BY q ORDER BY sim DESC, nb) AS rn
    FROM scored)
  WHERE rn <= 5),
votes AS (SELECT q, true_label, nb_label, count(*) AS c FROM top GROUP BY q, true_label, nb_label),
pred AS (
  SELECT q, true_label, nb_label AS pred_label FROM (
    SELECT q, true_label, nb_label,
           row_number() OVER (PARTITION BY q ORDER BY c DESC, nb_label) AS rn
    FROM votes)
  WHERE rn = 1)
SELECT q AS vec_id, true_label, pred_label, true_label = pred_label AS correct
FROM pred
""",
)
def llm_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-vote classification (k=5, cosine) of the first 100
    vectors against the rest of the corpus — the embedding-eval /
    quality-classifier shape. Per-partition BLAS scoring emits local
    top-k only; the merge window sees k·partitions rows per probe."""
    return S.knn_classify(load(spark, sf_dir, "embeddings"), n_probes=100, k=5)


@register(
    "llm_ann_pq",
    tags=("llm", "embedding", "ann", "pq"),
    oracle=f"""
WITH {_PQ_ADC_CTES}
SELECT q_id, n_id, adc_dist, rank FROM pqtop
""",
)
def llm_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 8×8-dim codebooks (first 16 vectors),
    corpus encoded to 8 codes, probes (vec_id < 10) score by ADC
    lookup-table sums — top-10 per probe. The memory-compression scale
    path: stored codes are m bytes per vector and scoring never
    re-touches the original floats."""
    return S.pq_adc_topk(
        load(spark, sf_dir, "embeddings"), n_probes=10, k=10, m=8, ncode=16
    )


@register(
    "llm_ann_pq_recall",
    tags=("llm", "embedding", "ann", "pq", "eval"),
    oracle=f"""
WITH {_PQ_ADC_CTES},
exact AS (
  SELECT q_id, n_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY floor(({_PQ_L2_SQL}) * 1000000 + 0.5) / 1000000.0, c.vec_id
           ) AS rn
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 10)
  WHERE rn <= 10),
hits AS (
  SELECT e.q_id, count(p.n_id) AS n_hit
  FROM exact e LEFT JOIN pqtop p ON p.q_id = e.q_id AND p.n_id = e.n_id
  GROUP BY e.q_id)
SELECT q_id, floor((n_hit / 10.0) * 10000 + 0.5) / 10000.0 AS recall_at_10 FROM hits
""",
)
def llm_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ-ADC index against exact L2 top-10 per probe
    — the tune-before-trust gate for the compressed index (the PQ twin
    of llm_ann_recall). Both sides run the per-partition-BLAS +
    local-top-k-merge shape; the compare is a tiny (probes·k) join."""
    e = load(spark, sf_dir, "embeddings")
    pq = S.pq_adc_topk(e, n_probes=10, k=10, m=8, ncode=16).select("q_id", "n_id")
    exact = S.l2_brute_topk(e, n_probes=10, k=10).select(
        F.col("q_id").alias("eq"), F.col("n_id").alias("en")
    )
    hits = (
        exact.join(
            pq,
            (F.col("eq") == F.col("q_id")) & (F.col("en") == F.col("n_id")),
            "left",
        )
        .groupBy("eq")
        .agg(F.count("n_id").alias("n_hit"))
    )
    return hits.select(
        F.col("eq").alias("q_id"), fround(F.col("n_hit") / 10.0, 4).alias("recall_at_10")
    )


@register(
    "llm_ann_ivf_pq",
    tags=("llm", "embedding", "ann", "ivf", "pq"),
    oracle=f"""
WITH sub AS (SELECT unnest(generate_series(0, 7)) AS s),
cb AS (
  SELECT e.vec_id AS c_id, s.s AS s, e.embedding AS cvec
  FROM embeddings e CROSS JOIN sub s
  WHERE e.vec_id < 16),
cent AS (SELECT vec_id AS t_id, embedding AS tvec FROM embeddings WHERE vec_id < 16),
cellassign AS (
  SELECT vec_id, t_id AS cell FROM (
    SELECT v.vec_id, cent.t_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY floor(({_l2full_sql('v.embedding', 'cent.tvec')}) * 1000000 + 0.5) / 1000000.0, cent.t_id
           ) AS rn
    FROM embeddings v CROSS JOIN cent)
  WHERE rn = 1),
probecells AS (
  SELECT q_id, t_id AS cell FROM (
    SELECT q.vec_id AS q_id, cent.t_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY floor(({_l2full_sql('q.embedding', 'cent.tvec')}) * 1000000 + 0.5) / 1000000.0, cent.t_id
           ) AS rn
    FROM embeddings q CROSS JOIN cent
    WHERE q.vec_id < 10)
  WHERE rn <= 2),
enc AS (
  SELECT vec_id, s, c_id AS code FROM (
    SELECT v.vec_id, cb.s, cb.c_id,
           row_number() OVER (
             PARTITION BY v.vec_id, cb.s
             ORDER BY floor(({_pq_d2_sql('v.embedding', 'cb.cvec')}) * 1000000 + 0.5) / 1000000.0, cb.c_id
           ) AS rn
    FROM embeddings v CROSS JOIN cb)
  WHERE rn = 1),
lut AS (
  SELECT q.vec_id AS q_id, cb.s, cb.c_id,
         floor(({_pq_d2_sql('q.embedding', 'cb.cvec')}) * 1000000 + 0.5) / 1000000.0 AS dist
  FROM embeddings q CROSS JOIN cb
  WHERE q.vec_id < 10),
adc AS (
  SELECT l.q_id, e.vec_id AS n_id, floor((sum(l.dist)) * 1000000 + 0.5) / 1000000.0 AS adc_dist
  FROM enc e
  JOIN cellassign ca ON ca.vec_id = e.vec_id
  JOIN probecells pc ON pc.cell = ca.cell
  JOIN lut l ON l.q_id = pc.q_id AND l.s = e.s AND l.c_id = e.code
  WHERE e.vec_id <> l.q_id
  GROUP BY l.q_id, e.vec_id)
SELECT q_id, n_id, adc_dist, rank FROM (
  SELECT q_id, n_id, adc_dist,
         row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, n_id) AS rank
  FROM adc)
WHERE rank <= 10
""",
)
def llm_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: L2 coarse quantizer (16 cells, nprobe=2) routes each
    probe; only probed cells' members are scored, by PQ-ADC lookup
    sums. Top-10 per probe. The canonical billion-scale index shape:
    one cell id + m code bytes per stored vector, candidates ≈
    N·nprobe/ncells per query."""
    return S.ivf_pq_topk(
        load(spark, sf_dir, "embeddings"),
        n_probes=10, k=10, ncells=16, nprobe=2, m=8, ncode=16,
    )


@register(
    "llm_random_projection",
    tags=("llm", "ann", "embedding", "projection"),
    oracle=f"""
WITH p AS (
  SELECT vec_id,
         {", ".join(f"{_jl_sql(k)} AS p{k}" for k in range(16))},
         list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                   for i in generate_series(1, 64)]) AS nx
  FROM embeddings)
SELECT vec_id,
       floor(p0 * 1000000 + 0.5) / 1000000.0 AS p0_q,
       md5(concat_ws(',',
           {", ".join(f"CAST(floor(p{k} * 1000000 + 0.5) AS BIGINT)" for k in range(16))}
       )) AS proj_digest,
       floor(({_JL_SUMSQ}) / nx * 1000000 + 0.5) / 1000000.0 AS norm_ratio
FROM p
WHERE nx > 0.0
""",
)
def llm_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss RANDOM PROJECTION 64→16 dims — the
    dimensionality-reduction front end an embedding dedup/ANN stack
    runs before clustering or coarse quantization: a ±1 sign matrix
    (Achlioptas' database-friendly JL construction) scaled by
    1/√16 = 0.25 (exact). The matrix is a deterministic md5-derived
    CONSTANT inlined as literals on both engines — no per-row hashing.
    Every output component is pinned: the 16 projected values are
    6-dp-quantized into BIGINTs and md5-digested per vector, and the
    emitted norm_ratio (‖proj‖²/‖x‖², the quantity JL bounds around 1)
    is the distortion metric an operator actually monitors.

    100 TB shape: embarrassingly parallel — one narrow projection per
    row (16 fixed left-to-right folds over 64 terms, whole-stage
    codegen), no shuffle, no Python; the oracle computes the same
    left-to-right list_sum folds (the proven ANN-family pairing).
    All-zero embeddings are FILTERED on both engines (nx > 0): a zero
    vector has no norm ratio, and under Spark-4 default ANSI mode an
    unguarded /0 would throw mid-job rather than NULL (r9 ADVICE)."""
    e = load(spark, sf_dir, "embeddings")
    p = e.select(
        "vec_id",
        *[F.expr(_jl_spark(k)).alias(f"p{k}") for k in range(16)],
        F.expr(
            "aggregate(embedding, cast(0.0 AS double), "
            "(acc, x) -> acc + cast(x AS double) * cast(x AS double))"
        ).alias("nx"),
    ).where(F.col("nx") > 0.0)
    qs = [
        F.floor(F.col(f"p{k}") * F.lit(1e6) + F.lit(0.5)).cast("bigint").cast("string")
        for k in range(16)
    ]
    return p.select(
        "vec_id",
        fround(F.col("p0"), 6).alias("p0_q"),
        F.md5(F.concat_ws(",", *qs)).alias("proj_digest"),
        fround(F.expr(_JL_SUMSQ) / F.col("nx"), 6).alias("norm_ratio"),
    )


@register(
    "llm_ann_mrr",
    tags=("llm", "similarity", "ann", "quality", "mrr"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm,
                  {_lsh_sig_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bucket
      FROM n WHERE vec_id < 10),
brute AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n.vec_id AS n_id,
           row_number() OVER (
             PARTITION BY q_id
             ORDER BY floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm))
                            * 1000000 + 0.5) / 1000000.0 DESC, n.vec_id)
             AS rank
    FROM n CROSS JOIN q
    WHERE n.vec_id <> q_id)
  WHERE rank = 1),
lshk AS (
  SELECT q_id, n_id, rank FROM (
    SELECT q_id, n.vec_id AS n_id,
           row_number() OVER (
             PARTITION BY q_id
             ORDER BY floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm))
                            * 1000000 + 0.5) / 1000000.0 DESC, n.vec_id)
             AS rank
    FROM n JOIN q USING (bucket)
    WHERE n.vec_id <> q_id)
  WHERE rank <= 10),
per AS (
  SELECT b.q_id, b.n_id AS true1,
         CAST(coalesce(l.rank, 0) AS BIGINT) AS lsh_rank,
         CAST(CASE WHEN l.rank IS NOT NULL THEN 1000000 // l.rank
                   ELSE 0 END AS BIGINT) AS rr_micro
  FROM brute b LEFT JOIN lshk l ON l.q_id = b.q_id AND l.n_id = b.n_id),
tot AS (SELECT CAST(sum(rr_micro) // count(*) AS BIGINT) AS mrr_micro FROM per)
SELECT q_id, true1, lsh_rank, rr_micro, (SELECT mrr_micro FROM tot) AS mrr_micro
FROM per
""",
)
def llm_ann_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN MEAN RECIPROCAL RANK — the graded retrieval metric next to
    llm_ann_recall's set-overlap recall@5: for each probe, WHERE in
    the LSH index's top-10 does the TRUE nearest neighbor (brute-force
    rank 1) land? rr = 1/rank, 0 if it missed the bucket entirely.
    Recall says "did the right answers show up"; MRR says "do they
    show up FIRST", which is what an embedding-dedup or RAG cutoff
    actually consumes. Every reciprocal is the exact integer
    1000000 DIV rank (rank ≤ 10) and the mean is integer-floored —
    zero floating point in the metric itself, so unlike textbook
    MRR there is nothing to round and nothing engine-dependent.

    100 TB shape: both rankings are the existing probe-broadcast
    kernels (brute = the recall baseline, LSH = the production path);
    the metric adds one probe-sized left join and a 1-row aggregate
    broadcast back (aggregate-below)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    true1 = (
        S.brute_force_topk(e, q, k=1)
        .where(F.col("rank") == 1)
        .select("q_id", F.col("n_id").alias("true1"))
    )
    lsh = S.lsh_bucketed_topk(e, q, k=10, nb=8, dim=64).select(
        "q_id", F.col("n_id").alias("true1"), F.col("rank").cast("long").alias("lsh_rank0")
    )
    per = (
        true1.join(lsh, ["q_id", "true1"], "left")
        .select(
            "q_id",
            "true1",
            F.coalesce(F.col("lsh_rank0"), F.lit(0)).cast("long").alias("lsh_rank"),
            F.when(
                F.col("lsh_rank0").isNotNull(),
                F.expr("1000000 DIV lsh_rank0"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_micro"),
        )
        # NOTE (r13-opt, measured NEGATIVE result): per feeds two
        # consumers (the 1-row mrr aggregate and the final crossJoin),
        # so materializing the 10-row relation looks free — but
        # localCheckpoint LOST wall time decisively (1.69 -> 3.4 s at
        # sf0.1, idle host, eager and lazy both): the two copies of
        # the brute+LSH pipeline execute in parallel on idle cores,
        # while the checkpoint serializes them and strips the stats
        # AQE uses to size the downstream joins. Kept the
        # parallel-duplicate plan deliberately.
    )
    tot = per.agg(
        F.expr("sum(rr_micro) DIV count(1)").cast("long").alias("mrr_micro")
    )
    return per.crossJoin(F.broadcast(tot))


@register(
    "llm_ann_multiprobe",
    tags=("llm", "similarity", "ann", "lsh", "multiprobe"),
    oracle=f"""
WITH n AS (SELECT vec_id, embedding, {_norm_sql('embedding')} AS nrm,
                  {_lsh_sig_sql('embedding')} AS bucket
           FROM embeddings),
q0 AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, bucket AS qb
       FROM n WHERE vec_id < 10),
probes AS (
  SELECT q_id, qv, qn,
         CASE WHEN j = 0 THEN qb
              ELSE substr(qb, 1, j - 1)
                   || (CASE WHEN substr(qb, j, 1) = '1' THEN '0' ELSE '1' END)
                   || substr(qb, j + 1, 8 - j)
         END AS bucket
  FROM q0, unnest(generate_series(0, 8)) AS u(j)),
scored AS (
  SELECT q_id, n.vec_id AS n_id,
         floor(({_dot_sql('qv', 'n.embedding')} / (qn * n.nrm)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
  FROM n JOIN probes USING (bucket)
  WHERE n.vec_id <> q_id)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored)
WHERE rank <= 5
""",
)
def llm_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE LSH ANN (Lv et al., VLDB 2007): the recall lever
    that does NOT require more hash tables. Single-probe LSH
    (llm_ann_lsh) misses any true neighbor whose signature differs
    from the query's in even one hyperplane bit; multi-probe also
    visits every bucket at Hamming distance 1 (flip each of the 8
    signature bits), so the candidate set covers all 9 buckets a
    near-miss most likely fell into — in production this replaces
    building 9 separate tables, cutting index memory 9x for the same
    recall. Candidates stay bucket-keyed (a corpus vector lives in
    exactly ONE bucket, so the 9 probe keys never produce duplicate
    candidates); exact cosine rescoring + top-5 per query is identical
    to the single-probe path — same output shape, strictly wider
    candidate set, the recall delta visible as rows llm_ann_lsh's
    result lacks.

    100 TB shape: the probe-side fan-out is 9 rows per QUERY (query-
    set-sized, never corpus-sized); the join stays a bucket-keyed
    equi-join against the one-entry-per-vector index — no cross
    product, no extra corpus shuffle vs single-probe."""
    e = load(spark, sf_dir, "embeddings")
    sig = S.lsh_signature("embedding", 8, 64)
    n = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_vec"),
        S.norm("embedding").alias("n_norm"),
        sig.alias("bucket"),
    )
    q0 = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        S.norm("embedding").alias("q_norm"),
        sig.alias("qb"),
    )
    probes = q0.select(
        "q_id",
        "q_vec",
        "q_norm",
        F.explode(
            F.expr(
                "transform(sequence(0, 8), j -> CASE WHEN j = 0 THEN qb "
                "ELSE concat(substring(qb, 1, j - 1), "
                "CASE WHEN substring(qb, j, 1) = '1' THEN '0' ELSE '1' END, "
                "substring(qb, j + 1, 8 - j)) END)"
            )
        ).alias("bucket"),
    )
    # same bounded-by-construction broadcast as similarity.lsh_bucketed_topk:
    # the probe side is <= 9 x 10 rows (constant-predicate query set)
    scored = (
        n.join(F.broadcast(probes), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            S.fl6(
                S.dot("q_vec", "n_vec") / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "n_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )
