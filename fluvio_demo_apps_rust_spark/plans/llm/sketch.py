"""Sketch-backed dedup operators: Bloom-filter membership dedup and
b-bit minwise signature compression.

Split from plans/llm/dedup.py at the 2500-line module bound
(r10 verdict #5 rule, enforced by tests/test_registry_order.py).
Registration order across the split is irrelevant — plans/__init__
orders the driver-visible enumeration by canonical_order.ORDER.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ...functions import dedup as X  # noqa: F401
from ..base import load, register  # noqa: F401
from .common import _MINHASH_CTE  # noqa: F401


@register(
    "llm_bloom_dedup",
    tags=("llm", "dedup", "sketch", "bloom"),
    oracle="""
WITH pos AS (
  SELECT doc_id, doc_id % 2 = 0 AS in_snap,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || text), 1, 15))::BIGINT
           % 65536 AS pos
  FROM documents, unnest(generate_series(0, 2)) AS u(j)),
bloom AS (
  SELECT pos // 60 AS widx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 60 AS INTEGER)) AS word
  FROM pos WHERE in_snap GROUP BY pos // 60),
fill AS (SELECT CAST(sum(bit_count(word)) AS BIGINT) AS bits_set FROM bloom),
hits AS (
  SELECT p.doc_id,
         bool_and(COALESCE(
           (b.word & (CAST(1 AS BIGINT) << CAST(p.pos % 60 AS INTEGER))) <> 0,
           false)) AS member
  FROM pos p LEFT JOIN bloom b ON b.widx = p.pos // 60
  GROUP BY p.doc_id),
truth AS (
  SELECT d.doc_id,
         d.text IN (SELECT text FROM documents WHERE doc_id % 2 = 0) AS is_member
  FROM documents d),
v AS (
  SELECT CASE WHEN h.member AND t.is_member THEN 'hit_true'
              WHEN h.member THEN 'hit_fp'
              ELSE 'miss' END AS status
  FROM hits h JOIN truth t USING (doc_id))
SELECT status, CAST(count(*) AS BIGINT) AS n, fill.bits_set
FROM v, fill GROUP BY status, fill.bits_set
""",
)
def llm_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER membership dedup — the Dolma pipeline's exact-dedup
    primitive (Soldaini et al. 2024 use a Bloom filter, not a hash
    join, to dedup 3T tokens in bounded memory): insert every SNAPSHOT
    document (here the even doc_ids) into an m-bit Bloom filter
    (m = 65536, k = 3 md5-derived hash functions), then probe EVERY
    document and classify the verdicts against exact ground truth:
    ``hit_true`` (in snapshot, correctly flagged), ``hit_fp`` (Bloom
    false positive — the price of constant memory), ``miss`` (genuinely
    new; Bloom filters have NO false negatives, so a miss needs no
    verification). The filter is materialized as bit-packed BIGINT
    words of 60 bits each (shift <= 59 keeps 1 << b in signed-64 range
    on BOTH engines — DuckDB throws on 1 << 63) built with a bit_or
    aggregate; ``bits_set`` (the fill level that determines the FP
    rate, here via bit_count) rides along so the oracle pins the exact
    bitmap, not just the verdict counts.

    100 TB shape: the filter is a FIXED-SIZE mergeable sketch — the
    bit_or aggregate is map-side combinable and yields m/60 rows
    regardless of corpus size (a real deployment sizes m ~ 10 bits per
    expected document and shards the filter by hash prefix; m is a
    workload parameter, not data-derived). Probing is an equi-join
    against the bitmap-sized relation (AQE broadcasts it at runtime —
    no hint, per the no-forced-broadcast rule); the ground-truth join
    is the one corpus-keyed shuffle and exists only for the quality
    audit, not the production path."""
    d = load(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("in_snap"),
        F.explode(
            F.expr(
                "transform(sequence(0, 2), j -> "
                "CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', text)), "
                "1, 15), 16, 10) AS BIGINT) % 65536)"
            )
        ).alias("pos"),
    )
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 60 AS INT))")
    bloom = (
        pos.where("in_snap")
        .select(F.expr("pos DIV 60").alias("widx"), mask.alias("mask"))
        .groupBy("widx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    fill = bloom.agg(
        F.sum(F.bit_count("word")).cast("long").alias("bits_set")
    )
    probe = pos.select("doc_id", F.expr("pos DIV 60").alias("widx"), mask.alias("mask"))
    hits = (
        probe.join(bloom, "widx", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("word").bitwiseAND(F.col("mask")) != 0, F.lit(False)
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.expr("bool_and(hit)").alias("member"))
    )
    snap_t = (
        d.where(F.col("doc_id") % 2 == 0)
        .select("text")
        .distinct()
        .withColumn("m", F.lit(1))
    )
    truth = (
        d.select("doc_id", "text")
        .join(snap_t, "text", "left")
        .select("doc_id", F.col("m").isNotNull().alias("is_member"))
    )
    v = hits.join(truth, "doc_id").select(
        F.when(F.col("member") & F.col("is_member"), F.lit("hit_true"))
        .when(F.col("member"), F.lit("hit_fp"))
        .otherwise(F.lit("miss"))
        .alias("status")
    )
    # 1-row fill aggregate: unhinted crossJoin, AQE broadcasts at runtime
    return (
        v.groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(fill)
    )


@register(
    "llm_minhash_bbit",
    tags=("llm", "dedup", "minhash", "sketch", "estimate"),
    oracle=f"""
WITH {_MINHASH_CTE},
buckets AS (
  SELECT doc_id, j % 4 AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY j)) AS bucket
  FROM mh GROUP BY doc_id, band),
pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y USING (band, bucket)
  WHERE x.doc_id < y.doc_id),
m AS (
  SELECT p.a, p.b,
         CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS BIGINT) AS m_full,
         CAST(sum(CASE WHEN x.mh % 16 = y.mh % 16 THEN 1 ELSE 0 END) AS BIGINT)
           AS m_bbit
  FROM pairs p
  JOIN mh x ON x.doc_id = p.a
  JOIN mh y ON y.doc_id = p.b AND y.j = x.j
  GROUP BY p.a, p.b)
SELECT a, b, m_full, m_bbit,
       CAST((m_full * 1000) // 16 AS BIGINT) AS j_full_permille,
       CAST(CASE WHEN m_bbit >= 1 THEN ((m_bbit - 1) * 1000) // 15
                 ELSE 0 END AS BIGINT) AS j_bbit_permille
FROM m
""",
)
def llm_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-BIT MINWISE HASHING (Li & Koenig, WWW 2010) — the signature
    COMPRESSION lever for planet-scale dedup: store only the lowest
    b = 4 bits of each of the k = 16 minhash components (15x smaller
    signature store than the 60-bit values) and correct the estimator
    for accidental low-bit collisions: two unrelated documents agree
    on any 4-bit component with probability C = 1/16, so the unbiased
    estimate from the b-bit match count m is (m/k - C)/(1 - C) =
    (m - 1)/15 for k = 16. Emitted per LSH candidate pair alongside
    the full-width estimate (m_full/16) so the compression's accuracy
    cost is measurable on the same pairs. Integer-exact permille on
    both engines; the m_bbit = 0 case is clamped to 0 BEFORE the
    division (Spark DIV truncates toward zero, DuckDB // floors —
    negative operands would diverge).

    100 TB shape: identical to llm_minhash_jaccard_est — banded
    posting-list candidates, signature re-join keyed on doc_id, one
    16-component row-local comparison per candidate; the b-bit variant
    adds only a % 16 per component. The production win is the
    signature table's footprint, priced here by the j_full vs j_bbit
    delta."""
    d = load(spark, sf_dir, "documents")
    # the wide signature relation feeds THREE branches (band buckets +
    # both pair sides); materialize once or Spark re-executes the
    # shingle+minhash subtree per branch (README finding #8; the
    # cascade's stage-manifest pattern). No broadcast hint anywhere —
    # the joins stay AQE-sized (measured 1.61 -> 1.43 s at sf0.1).
    wide = X.minhash_wide(d).localCheckpoint()
    pairs = X.lsh_candidate_pairs(X.lsh_band_buckets_wide(wide, bands=4))
    a = wide.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(16)],
    )
    b = wide.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(16)],
    )
    m_full = sum(
        F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
        for j in range(16)
    )
    m_bbit = sum(
        F.when(F.col(f"a_{j}") % 16 == F.col(f"b_{j}") % 16, 1).otherwise(0)
        for j in range(16)
    )
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            m_full.cast("long").alias("m_full"),
            m_bbit.cast("long").alias("m_bbit"),
        )
        .select(
            "a",
            "b",
            "m_full",
            "m_bbit",
            F.expr("(m_full * 1000) DIV 16").cast("long").alias("j_full_permille"),
            F.expr(
                "CASE WHEN m_bbit >= 1 THEN ((m_bbit - 1) * 1000) DIV 15 "
                "ELSE 0 END"
            ).cast("long").alias("j_bbit_permille"),
        )
    )
