"""Curation-pipeline family: web extraction, mixtures/sampling, packing, shard writing/manifests, provenance, end-to-end curation pipelines.

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
    _BPE_VOCAB_CTE,
    _HEX60,
    _HTML_EXTRACT_SQL,
    _HTML_SYNTH_SQL,
    _MIX_TARGETS,
    _SHINGLES,
    _TOKS,
    _URL_CANON_CTE,
    _shard_manifest_frame,
)



@register(
    "llm_snapshot_diff",
    tags=("llm", "curation", "versioning", "diff"),
    oracle=f"""
WITH v1 AS (SELECT doc_id, md5(text) AS h, source FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 17 = 0 THEN text || ' [edited]' ELSE text END) AS h,
         source
  FROM documents WHERE doc_id % 23 <> 0
  UNION ALL
  SELECT doc_id + 1000000, md5('new: ' || text), source
  FROM documents WHERE doc_id % 31 = 0),
d AS (
  SELECT COALESCE(v2.source, v1.source) AS source,
         CASE WHEN v1.doc_id IS NULL THEN 'added'
              WHEN v2.doc_id IS NULL THEN 'removed'
              WHEN v1.h = v2.h THEN 'unchanged'
              ELSE 'changed' END AS status,
         COALESCE(v1.doc_id, v2.doc_id) AS doc_id
  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
SELECT source, status,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(sum({_HEX60.format(x="CAST(doc_id AS VARCHAR) || '_' || status")}
                % 1000000000) AS BIGINT) AS member_checksum
FROM d GROUP BY source, status
""",
)
def llm_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF — the dataset-versioning pass a curation pipeline
    runs between corpus releases: full-outer join of two snapshots on
    doc_id with a content-hash compare classifying every document as
    added / removed / changed / unchanged, rolled up per source with
    an order-independent membership checksum (a single misclassified
    doc anywhere breaks the hash). v2 is derived DETERMINISTICALLY
    from v1 on both engines (every 23rd doc deleted, every 17th
    edited, every 31st cloned as an addition under a shifted id), so
    the gate pins the diff operator, not the fixture.

    100 TB shape: two row-local hash projections + ONE full-outer
    shuffle join on the id (the exact shape any snapshot differ pays)
    + a per-(source,status)-bounded aggregate. No corpus-scale state
    or collect anywhere."""
    from ...functions.dedup import md5_int60

    d = load(spark, sf_dir, "documents")
    v1 = d.select("doc_id", F.md5("text").alias("h"), "source")
    v2 = (
        d.where(F.col("doc_id") % 23 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
                ).otherwise(F.col("text"))
            ).alias("h"),
            "source",
        )
        .unionByName(
            d.where(F.col("doc_id") % 31 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.md5(F.concat(F.lit("new: "), F.col("text"))).alias("h"),
                "source",
            )
        )
    )
    joined = v1.alias("v1").join(v2.alias("v2"), "doc_id", "full_outer")
    diff = joined.select(
        F.coalesce(F.col("v2.source"), F.col("v1.source")).alias("source"),
        F.when(F.col("v1.h").isNull(), "added")
        .when(F.col("v2.h").isNull(), "removed")
        .when(F.col("v1.h") == F.col("v2.h"), "unchanged")
        .otherwise("changed")
        .alias("status"),
        F.col("doc_id"),
    )
    return diff.groupBy("source", "status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.sum(
            md5_int60(
                F.concat(F.col("doc_id").cast("string"), F.lit("_"), F.col("status"))
            )
            % 1000000000
        ).alias("member_checksum"),
    )


@register(
    "llm_contamination",
    tags=("llm", "curation", "decontamination"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_SHINGLES}) AS sh FROM t WHERE len(t) >= 3),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0)
SELECT c.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       floor((sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) / count(*)::DOUBLE) * 1000000 + 0.5) / 1000000.0
           AS contamination
FROM corp c LEFT JOIN bench b ON c.sh = b.sh
GROUP BY c.doc_id
""",
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: every 50th document plays the
    held-out benchmark; each remaining document reports how many of its
    distinct 3-gram shingles appear anywhere in the benchmark set. The
    benchmark reduces to its distinct shingle set and broadcasts — the
    corpus-side explode never shuffles (the decontamination shape a
    100 TB pretraining pipeline runs before training)."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return C.benchmark_contamination(corpus, bench)


@register(
    "llm_stratified_sample",
    tags=("llm", "curation", "sampling"),
    oracle="""
WITH s AS (
  SELECT * FROM documents
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
        < CAST((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.25
                ELSE 0.1 END) * 1000000 AS BIGINT))
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY lang
""",
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified subsampling (rebalance the
    corpus by language: keep 50% of en, 25% of de/fr, 10% otherwise).
    A row-local md5-uniform filter — reproducible across engines and
    partition layouts, unlike seed-based ``df.sample`` — followed by a
    tiny per-stratum aggregate."""
    d = load(spark, sf_dir, "documents")
    s = C.stratified_sample(
        d, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, default_rate=0.1
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "llm_pii_scrub",
    tags=("llm", "curation", "scrub"),
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
       length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_len,
       md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_hash
FROM documents
""",
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing audit: digit-run count plus the hash and
    length of the text with every digit run replaced by ``<NUM>``.
    Pure row-local regexp projections inside codegen — the shape of a
    redaction pass over 100 TB (counts and content hashes, payloads
    never leave the executors)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *C.scrub_numbers("text"))


@register(
    "llm_sequence_pack",
    tags=("llm", "curation", "packing", "window"),
    oracle=f"""
WITH t AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
      FROM t)
SELECT doc_id, n_tokens, start_offset,
       (start_offset // 2048)::BIGINT AS pack_id,
       ((start_offset + n_tokens - 1) // 2048) <> (start_offset // 2048) AS crosses
FROM c
""",
)
def llm_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sample packing (2048-token windows): global
    token offsets via a two-phase prefix sum (range totals + intra-range
    windows) so no single partition ever holds the whole corpus; the
    oracle computes the same offsets with one global window."""
    return C.sequence_pack(load(spark, sf_dir, "documents"))


@register(
    "llm_pretrain_prep",
    tags=("llm", "curation", "pipeline", "packing"),
    oracle=f"""
WITH keepers AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
t AS (
  SELECT d.doc_id, {_TOKS} AS toks
  FROM documents d JOIN keepers USING (doc_id)),
g AS (
  SELECT doc_id, toks,
         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          for i in generate_series(1, len(toks) - 2)] AS g3
  FROM t),
survivors AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens
  FROM g
  WHERE (CASE WHEN len(g3) = 0 THEN 0.0
              ELSE floor(((len(g3) - len(list_distinct(g3))) / len(g3)::DOUBLE) * 10000 + 0.5) / 10000.0 END) < 0.1
    AND floor((0.4 * (len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','for','on')))
                     / len(toks)::DOUBLE)
              + 0.4 * (len(list_distinct(toks)) / len(toks)::DOUBLE)
              + 0.2 * least(len(toks)::DOUBLE, 100.0) / 100.0) * 10000 + 0.5) / 10000.0 >= 0.33),
packed AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
  FROM survivors)
SELECT (start_offset // 2048)::BIGINT AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       sum(n_tokens)::BIGINT AS pack_tokens,
       max(((start_offset + n_tokens - 1) // 2048) <> (start_offset // 2048)) AS has_split_doc
FROM packed
GROUP BY pack_id
""",
)
def llm_pretrain_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-shard prep flow, composed from the engine's
    own operators: exact dedup (keep lowest id per content hash) →
    boilerplate gate (duplicate 3-gram fraction < 0.1) → quality gate
    (pinned formula ≥ 0.33) → concat-then-chunk packing into 2048-token
    windows → per-pack stats. One hash shuffle for dedup, row-local
    gates, two-phase prefix sum for the pack offsets, one final tiny
    aggregate keyed by pack."""
    d = load(spark, sf_dir, "documents")
    keepers = X.exact_dup_clusters(d).select(F.col("keep_id").alias("doc_id"))
    kept = d.join(keepers, "doc_id", "left_semi")
    gated = (
        kept.select("doc_id", "text", *TX.repetition_columns(), *TX.quality_columns())
        .filter((F.col("dup3_frac") < 0.1) & (F.col("quality") >= 0.33))
        .select("doc_id", "text")
    )
    packed = C.sequence_pack(gated)
    pack_id = F.col("pack_id")
    return (
        packed.groupBy(pack_id)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.max("crosses").alias("has_split_doc"),
        )
    )


@register(
    "llm_domain_mixture",
    tags=("llm", "curation", "sampling"),
    oracle=f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(n_tokens)::DOUBLE AS tot_tokens, count(*) AS k FROM per)
SELECT source, n_docs, n_tokens,
       floor((n_tokens / tot_tokens) * 1000000 + 0.5) / 1000000.0 AS token_share,
       floor(((1.0 / k) / (n_tokens / tot_tokens)) * 1000000 + 0.5) / 1000000.0 AS uniform_weight
FROM per CROSS JOIN tot
""",
)
def llm_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token shares + uniform-target importance weights —
    the mixture-rebalancing step feeding stratified_sample rates. One
    k-key partial aggregate + a broadcast one-row totals join."""
    return C.domain_mixture(load(spark, sf_dir, "documents"))


@register(
    "llm_dsir_importance",
    tags=("llm", "text", "lm", "sampling"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS is_tgt, unnest({_TOKS}) AS t FROM documents),
model AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c_raw,
         CAST(count(*) FILTER (WHERE is_tgt) AS BIGINT) AS c_tgt
  FROM tok GROUP BY t),
tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS tot_raw,
               CAST(sum(c_tgt) AS BIGINT) AS tot_tgt,
               CAST(count(*) AS BIGINT) AS v
        FROM model)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       sum(CAST(floor(log2(((c_tgt + 1) * (tot_raw + v))::DOUBLE
                           / ((c_raw + 1) * (tot_tgt + v))) * 1000000000 + 0.5)
                AS BIGINT)) / (count(*) * 1000000000.0) AS log_ratio
FROM tok JOIN model USING (t) CROSS JOIN tot
GROUP BY doc_id
""",
)
def llm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting for domain-targeted selection:
    per-doc mean log-likelihood ratio under a target-domain (lang='en')
    vs raw-corpus unigram LM, add-one smoothed — ONE vocabulary-keyed
    aggregate builds both models via a conditional count, then a
    token-keyed join back and a per-doc aggregate. Linear; the ratio
    is one log2 of an exact-integer product ratio so both engines
    agree bit-for-bit."""
    return TX.dsir_importance(load(spark, sf_dir, "documents"))


@register(
    "llm_dsir_resample",
    tags=("llm", "text", "lm", "sampling", "curation"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS is_tgt, unnest({_TOKS}) AS t FROM documents),
model AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c_raw,
         CAST(count(*) FILTER (WHERE is_tgt) AS BIGINT) AS c_tgt
  FROM tok GROUP BY t),
tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS tot_raw,
               CAST(sum(c_tgt) AS BIGINT) AS tot_tgt,
               CAST(count(*) AS BIGINT) AS v
        FROM model),
lr AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         sum(CAST(floor(log2(((c_tgt + 1) * (tot_raw + v))::DOUBLE
                             / ((c_raw + 1) * (tot_tgt + v))) * 1000000000 + 0.5)
                  AS BIGINT)) / (count(*) * 1000000000.0) AS log_ratio
  FROM tok JOIN model USING (t) CROSS JOIN tot
  GROUP BY doc_id),
acc AS (
  SELECT d.lang, lr.doc_id, lr.n_tokens,
         ({_HEX60.format(x="CAST(lr.doc_id AS VARCHAR) || '_dsir'")} % 1000000)
           < CAST(floor(least(greatest(0.5 + lr.log_ratio, 0.0), 1.0)
                        * 1000000 + 0.5) AS BIGINT) AS accepted
  FROM lr JOIN documents d USING (doc_id))
SELECT lang, accepted,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum({_HEX60.format(x="CAST(doc_id AS VARCHAR) || '_m'")}
                % 1000000000) AS BIGINT) AS member_checksum
FROM acc GROUP BY lang, accepted
""",
)
def llm_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR RESAMPLING — the acceptance-sampling step that APPLIES the
    llm_dsir_importance weights (which that query only computes):
    each document is kept with probability p = clip(0.5 + log_ratio,
    0, 1), drawn against a salted-md5 uniform — so target-like docs
    (log_ratio > 0.5) are always kept, strongly off-domain docs are
    always dropped, and the band between resamples proportionally.
    The LINEAR acceptance is a deliberate surrogate for DSIR's
    exp-weight sampling: exp is 1-ulp engine-dependent (repo
    transcendental rule) while clip(0.5 + x) over the identical
    doubles both engines already compute is bit-exact; production
    would swap the surrogate for exp-weights and carry the 1-ulp
    residual instead. The decision compares micro-integers
    (hash % 10⁶ < floor(p·10⁶ + 0.5)), and per-(lang, accepted)
    membership is checksum-pinned doc by doc.

    100 TB shape: the importance model is ONE vocabulary-keyed
    aggregate (the probed llm_dsir_importance shape); the acceptance
    is row-local; the rollup is ≤ 2·#langs rows."""
    from ...functions.dedup import md5_int60

    d = load(spark, sf_dir, "documents")
    lr = TX.dsir_importance(d)
    p_micro = F.floor(
        F.least(F.greatest(F.lit(0.5) + F.col("log_ratio"), F.lit(0.0)), F.lit(1.0))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    acc = lr.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "doc_id",
        "n_tokens",
        (
            md5_int60(F.concat(F.col("doc_id").cast("string"), F.lit("_dsir")))
            % 1000000
            < p_micro
        ).alias("accepted"),
    )
    return acc.groupBy("lang", "accepted").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(
            md5_int60(F.concat(F.col("doc_id").cast("string"), F.lit("_m")))
            % 1000000000
        ).alias("member_checksum"),
    )


@register(
    "llm_corpus_report",
    tags=("llm", "curation", "report"),
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
       floor((1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS dup_ratio,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       floor((sum(len({_TOKS})) / CAST(count(*) AS DOUBLE)) * 100 + 0.5) / 100.0 AS avg_doc_tokens
FROM documents
GROUP BY source
""",
)
def llm_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report — the dashboard aggregate every
    curation pipeline runs first: volume (docs/chars/tokens), exact-dup
    rate (distinct content hashes), language spread, mean doc length.
    ONE scan, one source-keyed aggregate with map-side partials; the
    distinct counts are the only expansion and stay keyed by source."""
    d = load(spark, sf_dir, "documents")
    toks = TX.tokens()
    return (
        d.select(
            "source", "n_chars", "lang",
            F.size(toks).alias("ntok"),
            F.md5("text").alias("h"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("ntok").alias("total_tokens"),
            F.count_distinct("h").alias("n_distinct_texts"),
            fround(
                F.lit(1.0) - F.count_distinct("h") / F.count(F.lit(1)).cast("double"), 4
            ).alias("dup_ratio"),
            F.count_distinct("lang").alias("n_langs"),
            fround(F.sum("ntok") / F.count(F.lit(1)).cast("double"), 2).alias(
                "avg_doc_tokens"
            ),
        )
    )


@register(
    "llm_train_split",
    tags=("llm", "curation", "split"),
    oracle="""
WITH tagged AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 100 < 80 THEN 'train'
              WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM tagged GROUP BY split, lang
""",
)
def llm_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by salted content
    hash — the reproducibility primitive every training pipeline
    needs: a document's split is a pure function of its id (md5 of a
    salted key, mod 100), so re-running on different partition
    layouts, engines, cluster sizes, or data ORDER yields the
    identical assignment, and adding documents never moves existing
    ones between splits (unlike any sample()/rand()-based split). The
    salt ('split:') decorrelates this hash from every other md5-bucket
    decision in the pipeline (sampling, sharding), so the split is
    independent of them. Emitted as the per-(split, lang) audit table
    a pipeline records: row-local tagging, one partial-aggregating
    shuffle — no sort, no window, scale-free."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )
    tagged = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )
    return tagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "llm_global_shuffle",
    tags=("llm", "curation", "shuffle"),
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('shuffle:42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           AS shuffle_key
  FROM documents),
r AS (
  SELECT doc_id, lang, shuffle_key,
         row_number() OVER (ORDER BY shuffle_key, doc_id) AS rank
  FROM keyed)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, lang, shuffle_key
FROM r WHERE rank <= 100
""",
)
def llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle — reproducible example
    ordering for training: each document's position is the rank of a
    salted hash ('shuffle:<seed>:' || id), so the permutation is a
    pure function of (seed, ids): identical across engines, partition
    layouts and re-runs, and changing the seed re-deals the whole
    order (unlike orderBy(rand()), which is neither reproducible nor
    restart-safe). Emits the first 100 positions as the audit window.

    Scale posture: hash values are uniform in [0, 2^60), so the
    ORDER BY is a RANGE-PARTITIONED sort with no skew by
    construction — Spark samples the key space and every executor
    writes one contiguous, already-shuffled shard (the exact layout a
    training data loader wants); the tie-break on doc_id makes the
    permutation total even under hash collisions. The top-100 window
    here takes the per-partition top-k merge path (TakeOrderedAndProject),
    never a global sort on the driver."""
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "lang",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shuffle:42:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("shuffle_key"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 100)
        .select("rank", "doc_id", "lang", "shuffle_key")
    )


@register(
    "llm_epoch_upsample",
    tags=("llm", "curation", "mixture"),
    oracle=f"""
WITH avail AS (
  SELECT CASE WHEN lang IN ('en', 'de', 'fr') THEN lang ELSE 'other' END AS lang_bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS avail_tokens
  FROM documents GROUP BY 1),
tgt AS (
  SELECT unnest(['en', 'de', 'fr', 'other']) AS lang_bucket,
         unnest([{_MIX_TARGETS["en"]}, {_MIX_TARGETS["de"]},
                 {_MIX_TARGETS["fr"]}, {_MIX_TARGETS["other"]}])::BIGINT
           AS target_tokens)
SELECT a.lang_bucket, a.n_docs, a.avail_tokens, t.target_tokens,
       (t.target_tokens * 1000000) // a.avail_tokens AS epochs_micro,
       CASE WHEN t.target_tokens > a.avail_tokens
            THEN t.target_tokens - a.avail_tokens ELSE 0 END AS upsampled_tokens
FROM avail a JOIN tgt t ON t.lang_bucket = a.lang_bucket
""",
)
def llm_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture epoch plan — the "how many times do we repeat each
    domain" computation a pretraining pipeline runs before writing
    shards (the DoReMi/LLaMA-style fixed-weight mixture, computed from
    what the corpus actually has): per language bucket, the available
    whitespace-token supply vs an integer per-bucket token target
    (exact 0.5/0.2/0.2/0.1 splits of a 2M budget), the repeat factor
    as an EXACT micro-scaled integer ((target·10⁶) DIV avail — epochs
    > 1e6 means upsampling/repeating, < 1e6 means subsampling), and
    the token shortfall to be covered by repeats. Pure BIGINT
    arithmetic end to end — nothing to round, no doubles anywhere.

    Scale posture: one scan with a row-local token count (single
    split reference — no lambda-CSE trap), ONE partial-aggregating
    shuffle down to 4 bucket rows, broadcast-joined to the constant
    target table. The per-doc application step (repeat each doc
    floor/ceil(epochs) times) is a deterministic-hash Bernoulli on the
    fractional part — the same md5-uniform machinery as
    llm_stratified_sample — and is omitted here to keep the audit
    table tiny."""
    d = load(spark, sf_dir, "documents")
    tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    avail = (
        d.select(
            F.when(F.col("lang").isin("en", "de", "fr"), F.col("lang"))
            .otherwise("other")
            .alias("lang_bucket"),
            tok.alias("tok"),
        )
        .groupBy("lang_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("long").alias("avail_tokens"),
        )
    )
    tgt = spark.createDataFrame(
        [(k, v) for k, v in _MIX_TARGETS.items()], "lang_bucket string, target_tokens long"
    )
    return avail.join(F.broadcast(tgt), "lang_bucket").select(
        "lang_bucket",
        "n_docs",
        "avail_tokens",
        "target_tokens",
        F.expr("(target_tokens * 1000000) DIV avail_tokens").alias("epochs_micro"),
        F.when(
            F.col("target_tokens") > F.col("avail_tokens"),
            F.col("target_tokens") - F.col("avail_tokens"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("upsampled_tokens"),
    )


@register(
    "llm_mixture_materialize",
    tags=("llm", "curation", "mixture", "sampling"),
    oracle=f"""
WITH avail AS (
  SELECT CASE WHEN lang IN ('en', 'de', 'fr') THEN lang ELSE 'other' END AS lang_bucket,
         doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_toks
  FROM documents),
ag AS (SELECT lang_bucket, CAST(sum(n_toks) AS BIGINT) AS avail_tokens
       FROM avail GROUP BY 1),
tgt AS (
  SELECT unnest(['en', 'de', 'fr', 'other']) AS lang_bucket,
         unnest([{_MIX_TARGETS["en"]}, {_MIX_TARGETS["de"]},
                 {_MIX_TARGETS["fr"]}, {_MIX_TARGETS["other"]}])::BIGINT
           AS target_tokens),
plan AS (
  SELECT a.lang_bucket,
         (t.target_tokens * 1000000) // a.avail_tokens AS epochs_micro
  FROM ag a JOIN tgt t USING (lang_bucket) WHERE a.avail_tokens >= 1),
rep AS (
  SELECT v.lang_bucket, v.doc_id, v.n_toks,
         p.epochs_micro // 1000000
           + CASE WHEN {_HEX60.format(x="CAST(v.doc_id AS VARCHAR) || '_mix_mat'")}
                       % 1000000 < p.epochs_micro % 1000000
                  THEN 1 ELSE 0 END AS n_rep
  FROM avail v JOIN plan p USING (lang_bucket)),
mat AS (
  SELECT lang_bucket, doc_id, n_toks,
         unnest(generate_series(1, n_rep)) AS epoch_no
  FROM rep WHERE n_rep >= 1)
SELECT lang_bucket,
       CAST(count(CASE WHEN epoch_no = 1 THEN 1 END) AS BIGINT) AS n_docs_kept,
       CAST(count(*) AS BIGINT) AS n_rows_out,
       CAST(sum(n_toks) AS BIGINT) AS out_tokens,
       CAST(sum({_HEX60.format(x="CAST(doc_id AS VARCHAR) || '_' || CAST(epoch_no AS VARCHAR)")}
                % 1000000000) AS BIGINT) AS row_checksum
FROM mat GROUP BY lang_bucket
""",
)
def llm_mixture_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZE the mixture — the per-doc application step
    llm_epoch_upsample's docstring declared omitted: every document is
    repeated floor(epochs) times plus one Bernoulli extra on the
    fractional part, drawn from a salted md5 hash of its id (the same
    deterministic-uniform machinery as llm_stratified_sample — never a
    seed-fragile RNG), so a bucket with epochs_micro < 10⁶ is
    SUBSAMPLED (some docs get 0 repeats and drop out) and one above it
    is UPSAMPLED (all docs kept, some twice+). The materialized
    (doc_id, epoch_no) stream is what a shard writer actually
    consumes; the gate pins it with per-bucket counts, token mass, and
    an order-independent row checksum (sum of bounded per-row hashes —
    commutative, so partitioning can never affect it).

    100 TB shape: one token-count scan, a 4-row mixture plan joined
    back (aggregate-below, AQE broadcasts), a sequence-explode whose
    fan-out is the policy-bounded epoch factor (≤3 here, never
    corpus-dependent), and ONE ≤4-row aggregate. The row checksum
    sums values < 10⁹ — overflow-safe to ~9·10⁹ output rows per
    bucket at BIGINT, documented bound. Guards mirror the oracle:
    avail_tokens >= 1 before the integer DIV (ANSI rule)."""
    from ...functions.dedup import md5_int60

    d = load(spark, sf_dir, "documents")
    tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    docs = d.select(
        "doc_id",
        F.when(F.col("lang").isin("en", "de", "fr"), F.col("lang"))
        .otherwise("other")
        .alias("lang_bucket"),
        tok.cast("long").alias("n_toks"),
    )
    avail = docs.groupBy("lang_bucket").agg(
        F.sum("n_toks").cast("long").alias("avail_tokens")
    )
    tgt = spark.createDataFrame(
        [(k, v) for k, v in _MIX_TARGETS.items()],
        "lang_bucket string, target_tokens long",
    )
    plan = (
        avail.join(tgt, "lang_bucket")
        .where(F.col("avail_tokens") >= 1)
        .select(
            "lang_bucket",
            F.expr("(target_tokens * 1000000) DIV avail_tokens").alias(
                "epochs_micro"
            ),
        )
    )
    rep = (
        docs.join(plan, "lang_bucket")
        .select(
            "lang_bucket",
            "doc_id",
            "n_toks",
            (
                F.expr("epochs_micro DIV 1000000")
                + (
                    md5_int60(
                        F.concat(F.col("doc_id").cast("string"), F.lit("_mix_mat"))
                    )
                    % 1000000
                    < F.col("epochs_micro") % 1000000
                ).cast("long")
            ).alias("n_rep"),
        )
        .where(F.col("n_rep") >= 1)
    )
    mat = rep.select(
        "lang_bucket",
        "doc_id",
        "n_toks",
        F.explode(F.sequence(F.lit(1), F.col("n_rep").cast("int"))).alias("epoch_no"),
    )
    return mat.groupBy("lang_bucket").agg(
        F.count(F.when(F.col("epoch_no") == 1, 1)).alias("n_docs_kept"),
        F.count(F.lit(1)).alias("n_rows_out"),
        F.sum("n_toks").alias("out_tokens"),
        F.sum(
            md5_int60(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    F.col("epoch_no").cast("string"),
                )
            )
            % 1000000000
        ).alias("row_checksum"),
    )


@register(
    "llm_html_extract",
    tags=("llm", "web", "html", "extract"),
    oracle=f"""
WITH h AS (SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents),
x AS (SELECT doc_id, html, {_HTML_EXTRACT_SQL} AS txt FROM h)
SELECT doc_id,
       CAST(length(html) AS BIGINT) AS html_len,
       CAST(length(txt) AS BIGINT) AS text_len,
       CAST(CASE WHEN txt = '' THEN 0
                 ELSE length(txt) - length(replace(txt, chr(10), '')) + 1
            END AS BIGINT) AS n_lines,
       md5(txt) AS text_digest,
       floor(length(txt)::DOUBLE / length(html)::DOUBLE * 1000000 + 0.5)
         / 1000000.0 AS extract_ratio
FROM x
""",
)
def llm_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> TEXT extraction — the crawl-pipeline stage that runs
    BEFORE llm_url_dedup's dedup and FEEDS the C4/boilerplate/quality
    kernels: strip <script>/<style>/comments, turn block-tag closes
    and <br> into line breaks (the C4 line kernels consume line
    structure), strip remaining tags, decode basic entities, and
    normalize whitespace. The testdata has no HTML column, so a
    deterministic messy page is synthesized per row (4 variants —
    script with a bare '<' inside, style + comment, attribute-heavy
    + <br>, plain) with the document text ENTITY-ESCAPED into it; the
    md5 digest of the extracted text hash-gates the full round-trip
    against the DuckDB twin (functions/web.py keeps both regex sets
    side by side). Property-tested idempotent and '<'-free in
    tests/test_web_html.py.

    100 TB shape: entirely row-local regexp/replace codegen — no
    shuffle, no Python; the one scan prunes to (doc_id, source,
    text)."""
    d = load(spark, sf_dir, "documents")
    html = W.synth_html(F.col("doc_id"), F.col("source"), F.col("text"))
    x = d.select("doc_id", html.alias("html")).select(
        "doc_id", "html", W.extract_html_text(F.col("html")).alias("txt")
    )
    nl = F.length("txt") - F.length(F.replace(F.col("txt"), F.lit("\n"), F.lit("")))
    return x.select(
        "doc_id",
        F.length("html").cast("long").alias("html_len"),
        F.length("txt").cast("long").alias("text_len"),
        F.when(F.col("txt") == "", F.lit(0)).otherwise(nl + 1).cast("long").alias("n_lines"),
        F.md5("txt").alias("text_digest"),
        fround(F.length("txt").cast("double") / F.length("html").cast("double"), 6).alias(
            "extract_ratio"
        ),
    )


@register(
    "llm_robots_filter",
    tags=("llm", "web", "robots", "filter"),
    oracle=f"""
WITH canon AS (
{_URL_CANON_CTE}
),
u AS (
  SELECT doc_id,
         regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) AS host,
         regexp_extract(canonical_url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path
  FROM canon),
rules AS (
{W.ORACLE_ROBOTS_RULES}
)
SELECT u.doc_id, u.host, u.path,
       CAST(len(list_filter(r.prefixes, p -> starts_with(u.path, p))) AS BIGINT)
           AS n_rules_matched,
       len(list_filter(r.prefixes, p -> starts_with(u.path, p))) > 0 AS disallowed
FROM u JOIN rules r ON r.host = u.host
""",
)
def llm_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style crawl filtering — the politeness gate between
    URL canonicalization (llm_url_dedup) and fetching/extraction
    (llm_html_extract): per-host disallow PATH-PREFIX rules (real
    robots semantics: a rule matches any path it prefixes, so
    '/docs/page-1' also blocks page-10..19), any match → disallowed.
    The testdata has no robots corpus, so rules are derived
    deterministically per host (two prefixes: one keyed on
    length(source) % 8, plus the wide '/docs/page-1') identically on
    both engines; the logic under the gate is host extraction, path
    extraction, and the prefix-match fold.

    100 TB shape: the rules relation is HOST-count sized (a distinct
    over the low-cardinality source column, never a corpus-keyed
    shuffle on the probe side); the join is left UNHINTED because the
    rules subtree still SCANS the sf-linear documents table — AQE
    picks the broadcast at runtime from the measured post-distinct
    size, which stays correct even if host cardinality explodes (the
    repo's no-forced-broadcast-of-sf-linear-scans invariant). The
    corpus side is one row-local projection + the hash join + a
    codegen filter/size fold over the per-host prefix array."""
    docs = load(spark, sf_dir, "documents")
    url = W.synth_url(F.col("doc_id"), F.col("source"))
    canon = docs.select(
        "doc_id", W.canonicalize_url(url).alias("canonical_url")
    ).select(
        "doc_id",
        W.url_host(F.col("canonical_url")).alias("host"),
        F.regexp_extract(F.col("canonical_url"), r"^[a-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
    )
    rules = W.robots_rules(docs)
    matched = F.size(
        F.filter(F.col("prefixes"), lambda p: F.startswith(F.col("path"), p))
    )
    return (
        canon.join(rules, "host")
        .select(
            "doc_id",
            "host",
            "path",
            matched.cast("long").alias("n_rules_matched"),
            (matched > 0).alias("disallowed"),
        )
    )


@register(
    "llm_pack_token_ids",
    tags=("llm", "curation", "packing", "tokenizer", "bpe"),
    oracle=f"""
WITH RECURSIVE
{_BPE_VOCAB_CTE},
pw AS (
  SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_toks
  FROM st3),
dt AS (
  SELECT wq.doc_id, CAST(sum(pw.n_toks) AS BIGINT) AS n_tokens
  FROM wq JOIN pw ON pw.w = wq.w
  GROUP BY wq.doc_id
  HAVING sum(pw.n_toks) >= 1),
off AS (
  SELECT d.doc_id, dt.n_tokens, d.lang,
         COALESCE(sum(dt.n_tokens) OVER (ORDER BY dt.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM dt JOIN documents d USING (doc_id)),
pk AS (
  SELECT lang, n_tokens, start_offset,
         start_offset // 512 AS pack_id,
         (start_offset + n_tokens - 1) // 512 AS last_pack
  FROM off)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(CASE WHEN last_pack > pack_id THEN 1 END) AS BIGINT)
         AS n_crossing,
       CAST(count(DISTINCT pack_id) AS BIGINT) AS n_head_packs,
       CAST(sum(start_offset % 1000000000) AS BIGINT) AS offset_checksum
FROM pk GROUP BY lang
""",
)
def llm_pack_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE PACKING by TRAINED-TOKENIZER counts — the production
    packing layout (GPT-style concat+chunk into 512-token context
    windows) computed over the BPE token counts a trainer actually
    packs by, not whitespace counts (llm_sequence_pack's layout): each
    doc's global token start offset via an exact prefix sum in doc_id
    order, its head pack id, and whether it straddles a window
    boundary. The gate pins the layout per language with doc/token
    totals, boundary-crossing counts, distinct head packs, and an
    order-independent checksum over EVERY start offset (sum of bounded
    residues — a single shifted offset anywhere in the corpus breaks
    it). Zero-token docs are excluded on both engines (they have no
    position in the packed stream).

    100 TB shape: the tokenizer join is the probed llm_bpe_tokenize
    shape; the prefix sum is the TWO-PHASE range-bucket pattern
    (functions/curation.sequence_pack — per-range totals get their
    running sum over an aggregate, the corpus-scale window is
    partitioned per range), never a single global-order window over
    the corpus; the oracle's single ORDER BY window computes the
    identical offsets in one partition because DuckDB may. Checksum
    residues < 10⁹: overflow-safe to ~9·10⁹ docs per lang at BIGINT,
    documented bound."""
    from pyspark.sql import Window

    from ...functions.text import bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    wx = d.select("doc_id", F.explode(TX.tokens("text")).alias("w")).where(
        F.length("w") >= 1
    )
    words = wx.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    state, _merges = bpe_train(bpe_spaced_state(words))
    pw = state.select(
        "w", F.size(F.split(F.trim("s"), " ")).cast("long").alias("n_toks")
    )
    dt = (
        wx.join(pw, "w")
        .groupBy("doc_id")
        .agg(F.sum("n_toks").alias("n_tokens"))
        .where(F.col("n_tokens") >= 1)
        .withColumn("rk", F.floor(F.col("doc_id") / 4096))
    )
    range_tot = dt.groupBy("rk").agg(F.sum("n_tokens").alias("rtot"))
    w_ranges = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, -1)
    range_off = range_tot.select(
        "rk", F.coalesce(F.sum("rtot").over(w_ranges), F.lit(0)).alias("roff")
    )
    w_intra = (
        Window.partitionBy("rk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # range_off is corpus/4096 rows — sf-linear with a big divisor, so
    # it stays UNHINTED (AQE broadcasts it at any sane size; a forced
    # hint would pin an OOM at extreme scale — exactly what the
    # LogicalRDD broadcast lint now refuses, and it fired on the first
    # draft of this query)
    off = (
        dt.join(range_off, "rk")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("roff")
                + F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
            ).alias("start_offset"),
        )
        .join(d.select("doc_id", "lang"), "doc_id")
    )
    pk = off.select(
        "lang",
        "n_tokens",
        "start_offset",
        F.expr("start_offset DIV 512").alias("pack_id"),
        F.expr("(start_offset + n_tokens - 1) DIV 512").alias("last_pack"),
    )
    return pk.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count(F.when(F.col("last_pack") > F.col("pack_id"), 1)).alias("n_crossing"),
        F.countDistinct("pack_id").alias("n_head_packs"),
        F.sum(F.col("start_offset") % 1000000000).alias("offset_checksum"),
    )


@register(
    "llm_web_pipeline",
    tags=("llm", "web", "pipeline", "e2e"),
    oracle=f"""
WITH canon AS (
{_URL_CANON_CTE}
),
u AS (
  SELECT doc_id, canonical_url,
         regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) AS host,
         regexp_extract(canonical_url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path
  FROM canon),
rules AS (
{W.ORACLE_ROBOTS_RULES}
),
f AS (
  SELECT u.doc_id, u.canonical_url, u.host,
         len(list_filter(r.prefixes, p -> starts_with(u.path, p))) > 0 AS disallowed
  FROM u JOIN rules r ON r.host = u.host),
s1 AS (
  SELECT host,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(sum(CASE WHEN disallowed THEN 1 ELSE 0 END) AS BIGINT) AS n_robots_blocked
  FROM f GROUP BY host),
d AS (
  SELECT canonical_url, host, min(doc_id) AS doc_id
  FROM f WHERE NOT disallowed
  GROUP BY canonical_url, host),
x AS (
  SELECT d.host, length({_HTML_EXTRACT_SQL}) AS text_len
  FROM d JOIN (SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents) h
    ON h.doc_id = d.doc_id),
s2 AS (
  SELECT host,
         CAST(count(*) AS BIGINT) AS n_unique_pages,
         CAST(sum(CASE WHEN text_len >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass,
         CAST(sum(CASE WHEN text_len >= 200 THEN text_len ELSE 0 END) AS BIGINT) AS total_text_chars
  FROM x GROUP BY host)
SELECT s1.host, s1.n_urls, s1.n_robots_blocked,
       s2.n_unique_pages, s2.n_quality_pass, s2.total_text_chars
FROM s1 JOIN s2 ON s2.host = s1.host
""",
)
def llm_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed WEB FIRST STAGE end-to-end — what a crawl-derived
    pretraining corpus runs before any content-level curation, chained
    from the engine's own proven operators: URL canonicalization
    (llm_url_dedup's kernel) → robots path-prefix filter
    (llm_robots_filter) → canonical-URL dedup (keep min doc_id per
    page) → HTML→text extraction (llm_html_extract) → a minimum-length
    quality gate (≥200 extracted chars) → the per-host ATTRITION
    LEDGER (urls seen, robots-blocked, unique pages, quality passes,
    total extracted chars) — the table a crawl operator actually reads
    to monitor the funnel.

    100 TB shape: two corpus shuffles total — the canonical-URL dedup
    hash-aggregate and the per-host ledger aggregates; robots rules
    are host-count sized (AQE broadcast, unhinted); extraction runs
    only on dedup SURVIVORS (the funnel order matters: extract after
    dedup, never before); everything else is row-local codegen."""
    docs = load(spark, sf_dir, "documents")
    url = W.synth_url(F.col("doc_id"), F.col("source"))
    u = docs.select(
        "doc_id", W.canonicalize_url(url).alias("canonical_url")
    ).select(
        "doc_id",
        "canonical_url",
        W.url_host(F.col("canonical_url")).alias("host"),
        F.regexp_extract(F.col("canonical_url"), r"^[a-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
    )
    f = u.join(W.robots_rules(docs), "host").select(
        "doc_id",
        "canonical_url",
        "host",
        (
            F.size(F.filter(F.col("prefixes"), lambda p: F.startswith(F.col("path"), p)))
            > 0
        ).alias("disallowed"),
    )
    # ONE corpus aggregate to page granularity (all URLs sharing a
    # canonical form share its path, hence its robots verdict), then
    # host stats and dedup survivors both derive from the page-sized
    # relation — two aggregates over the corpus-scale join would
    # re-run the canonicalization chain once per consumer (README
    # plan-audit #8, the recompute face of it).
    page = f.groupBy("host", "canonical_url").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("disallowed").cast("long")).alias("nb"),
        F.min(F.when(~F.col("disallowed"), F.col("doc_id"))).alias("keep_id"),
    ).localCheckpoint()  # page-sized; 3 consumers (s1, d, extraction join)
    s1 = page.groupBy("host").agg(
        F.sum("n").alias("n_urls"),
        F.sum("nb").alias("n_robots_blocked"),
    )
    d = page.where(F.col("keep_id").isNotNull()).select(
        "host", F.col("keep_id").alias("doc_id")
    )
    # join FIRST, extract AFTER: only dedup survivors pay the regex
    # chain (the funnel order the docstring promises — a pre-join
    # projection would extract every doc, and Catalyst cannot prune
    # compute through a join build side)
    html = W.synth_html(F.col("doc_id"), F.col("source"), F.col("text"))
    kept = d.join(docs.select("doc_id", "source", "text"), "doc_id").select(
        "host", F.length(W.extract_html_text(html)).alias("text_len")
    )
    s2 = (
        kept.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_unique_pages"),
            F.sum((F.col("text_len") >= 200).cast("long")).alias("n_quality_pass"),
            F.sum(
                F.when(F.col("text_len") >= 200, F.col("text_len")).otherwise(F.lit(0))
            ).cast("long").alias("total_text_chars"),
        )
    )
    return s1.join(s2, "host").select(
        "host",
        "n_urls",
        "n_robots_blocked",
        "n_unique_pages",
        "n_quality_pass",
        "total_text_chars",
    )


@register(
    "llm_decontam_ngram_overlap",
    tags=("llm", "curation", "decontamination", "eval"),
    oracle=f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
s8 AS (
  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_toks,
         list_distinct([array_to_string(t[i:i+7], ' ')
                        for i in generate_series(1, len(t) - 7)]) AS shs
  FROM t),
bench AS (SELECT DISTINCT unnest(shs) AS sh FROM s8 WHERE doc_id % 50 = 0),
bad AS (
  SELECT DISTINCT c.doc_id
  FROM (SELECT doc_id, unnest(shs) AS sh FROM s8 WHERE doc_id % 50 <> 0) c
  JOIN bench b ON b.sh = c.sh),
led AS (
  SELECT s.source, s.n_toks, (bad.doc_id IS NOT NULL) AS removed
  FROM s8 s LEFT JOIN bad ON bad.doc_id = s.doc_id
  WHERE s.doc_id % 50 <> 0)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       floor(sum(CASE WHEN removed THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE
             * 1000000 + 0.5) / 1000000.0 AS removed_frac,
       CAST(sum(CASE WHEN removed THEN 0 ELSE n_toks END) AS BIGINT) AS tokens_kept
FROM led
GROUP BY source
""",
)
def llm_decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION as a REMOVAL pass with its audit
    ledger — the GPT-3-style long-n-gram collision rule
    (an 8-gram here; Brown et al. used 13-grams on much longer
    documents) where llm_contamination only SCORES: any corpus
    document sharing at least one 8-gram with the held-out benchmark
    set (every 50th doc) is dropped, and the ledger reports per-source
    attrition — docs seen, docs removed, removal fraction, and the
    token budget that SURVIVES (the number the mixture/packing stages
    consume). Long n-grams make the rule high-precision: only
    verbatim-overlap docs (the planted near-dups) trip it.

    100 TB shape: the benchmark side reduces to its distinct 8-gram
    set (eval benchmarks are tiny vs the corpus); the corpus explode
    feeds ONE semi-join on the gram key and a distinct on doc_id; the
    ledger is a |sources|-row aggregate. Same kernel scale class as
    the probed llm_contamination (docs/SCALING.md coverage policy)."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    # fixture parquet is one row group per file: spread the corpus-side
    # 8-gram explode (the per-row-heavy stage) across executors; the
    # 2%-sample bench side is small enough to stay single-task
    # (measured 1.10 -> 0.89 s at sf0.1, r13)
    corpus = d.filter(F.col("doc_id") % 50 != 0).repartition(16)
    bsh = bench.select(F.explode(X.word_shingles("text", n=8)).alias("sh")).distinct()
    csh = corpus.select("doc_id", F.explode(X.word_shingles("text", n=8)).alias("sh"))
    bad = csh.join(bsh, "sh", "left_semi").select("doc_id").distinct()
    led = (
        corpus.select("doc_id", "source", TX.ws_token_count("text").cast("long").alias("n_toks"))
        .join(bad.withColumn("removed", F.lit(True)), "doc_id", "left")
        .select("source", "n_toks", F.coalesce("removed", F.lit(False)).alias("removed"))
    )
    return led.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("removed").cast("long")).alias("n_removed"),
        fround(
            F.sum(F.col("removed").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("removed_frac"),
        F.sum(F.when(F.col("removed"), F.lit(0)).otherwise(F.col("n_toks"))).cast(
            "long"
        ).alias("tokens_kept"),
    )


@register(
    "llm_event_sequences",
    tags=("llm", "events", "curation", "sequences"),
    oracle="""
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
s AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct_types,
         CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_seconds
  FROM r GROUP BY user_id),
d AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(count(*) AS BIGINT) AS seq_len,
         md5(string_agg(event_type, '|' ORDER BY rn)) AS seq_digest
  FROM r WHERE rn <= 256 GROUP BY user_id)
SELECT s.user_id, s.n_events, d.seq_len, d.seq_digest,
       s.n_distinct_types, s.span_seconds
FROM s JOIN d ON d.user_id = s.user_id
""",
)
def llm_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT STREAMS → TRAINING SEQUENCES — the prep step a behavioral/
    recommendation model's pretraining pipeline runs on clickstream
    data: per user, the time-ordered event-type token sequence
    (tie-broken by event_id — deterministic at any parallelism),
    TRUNCATED to a 256-token context window, digest-pinned so the gate
    verifies the exact sequence content and order, plus the stats the
    sampling stage consumes (event count, type vocabulary, active-span
    seconds — epoch arithmetic, never raw timestamps).

    100 TB shape: ONE window (row_number per user — linear, no
    buffering beyond the sort spill Spark manages) feeding a filtered
    (rn ≤ 256) per-user aggregate, so whale users cost 256 collected
    rows, never their full history — the collect_list-then-slice
    formulation would buffer unbounded per-user arrays. Stats
    aggregate runs over the same ranked scan."""
    from pyspark.sql import Window as _W

    from ..events import _events

    e = _events(spark, sf_dir)
    r = e.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        "ts",
        "event_id",
    ).withColumn(
        "rn",
        F.row_number().over(_W.partitionBy("user_id").orderBy("ts", "event_id")),
    )
    s = r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_distinct_types"),
        (
            F.max(F.col("ts").cast("timestamp_ltz").cast("long"))
            - F.min(F.col("ts").cast("timestamp_ltz").cast("long"))
        ).alias("span_seconds"),
    )
    d = (
        r.where(F.col("rn") <= 256)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("seq_len"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                        lambda x: x["event_type"],
                    ),
                    "|",
                )
            ).alias("seq_digest"),
        )
    )
    return s.join(d, "user_id").select(
        "user_id", "n_events", "seq_len", "seq_digest", "n_distinct_types", "span_seconds"
    )


@register(
    "llm_shard_manifest",
    tags=("llm", "curation", "shard", "manifest"),
    oracle=f"""
WITH s AS (
  SELECT doc_id, text,
         {_HEX60.format(x="CAST(doc_id AS VARCHAR) || '_shard'")} % 8 AS shard_id,
         len({_TOKS}) AS n_toks
  FROM documents)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       md5(string_agg(md5(text), '|' ORDER BY md5(text), doc_id)) AS manifest_digest
FROM s
GROUP BY shard_id
""",
)
def llm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output SHARD MANIFEST — the reproducibility artifact the final
    writer of a curated corpus emits next to each shard (the data-card
    table): every document lands in a shard by a salted md5 hash of
    its id (deterministic across engines, partitionings and reruns —
    never a seed-fragile random split), and each shard row carries its
    doc count, token budget, and a CONTENT digest (md5 over the
    shard's sorted per-doc content hashes) — the checksum a training
    job verifies before reading, and the diff key for detecting that
    a re-run of the pipeline produced byte-identical shards.

    100 TB shape: row-local hashing, ONE shuffle keyed by shard id
    (exactly the shuffle the physical shard write performs anyway),
    then a CONSTANT-MEMORY digest: repartition("shard_id") guarantees
    every shard lands whole in one partition, sortWithinPartitions
    puts its hashes in manifest order, and an Arrow mapInPandas folds
    each Arrow batch into a running hashlib.md5 per shard — the digest
    of the full '|'-joined string without ever materializing it. The
    r9 shape (md5(array_join(array_sort(collect_list(...))))) buffered
    O(corpus/shards) structs in ONE aggregation buffer — an OOM the
    moment shards carry real data (r9 VERDICT #2); state here is one
    16-byte md5 context + two counters per shard-in-partition. Digest
    ties break on doc_id for duplicate texts, so the manifest is
    total-order deterministic at any partition/batch boundary."""
    return _shard_manifest_frame(load(spark, sf_dir, "documents"))


@register(
    "llm_shard_writer",
    tags=("llm", "curation", "shard", "manifest", "write"),
    oracle=_REGISTRY["llm_shard_manifest"].oracle,
)
def llm_shard_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHYSICAL SHARD WRITE + read-back verification — the step that
    actually ships a curated corpus: documents are written as
    parquet PARTITIONED BY the salted-hash shard id (the directory
    layout a trainer's data loader consumes), read back, and the
    manifest fold runs over the READ-BACK rows using the shard ids
    recovered from the directory structure. Gated against the
    IDENTICAL DuckDB oracle as llm_shard_manifest — so the write →
    directory-partition → read path is pinned content-exact: a
    dropped/duplicated/mis-partitioned row or any text mangling in
    the parquet round trip breaks the digest. This is the strongest
    form of write-path verification short of byte-diffing files.

    100 TB shape: partitionBy(shard_id) writes are the exact physical
    layout the batch manifest's repartition models; the verification
    fold is the same constant-memory chained-md5 pass. The tmpdir is
    removed after a localCheckpoint materializes the result
    (plans/advanced.py:1405 pattern)."""
    import shutil
    import tempfile

    from ...functions.curation import md5_int60

    d = load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="q_shardw_")
    try:
        (
            d.select(
                "doc_id",
                "text",
                (
                    md5_int60(
                        F.concat(F.col("doc_id").cast("string"), F.lit("_shard"))
                    )
                    % 8
                )
                .cast("long")
                .alias("shard_id"),
            )
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(out)
        )
        back = spark.read.parquet(out)
        return _shard_manifest_frame(back, shard_col="shard_id").localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "llm_temperature_mixture",
    tags=("llm", "curation", "mixture", "sampling"),
    oracle=f"""
WITH per AS (SELECT source, len({_TOKS}) AS t FROM documents),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(t) AS BIGINT) AS n_tokens
  FROM per GROUP BY source),
q AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
                 AS BIGINT) AS s_micro
  FROM s),
tot AS (SELECT CAST(sum(s_micro) AS BIGINT) AS tot FROM q)
SELECT source, n_docs, n_tokens, s_micro,
       CAST((s_micro * 1000000) // (SELECT tot FROM tot) AS BIGINT) AS w_ppm,
       CAST((s_micro * 100000) // (SELECT tot FROM tot) AS BIGINT) AS draws
FROM q
""",
)
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED SOURCE MIXTURE (the T5/mT5 sampling rule,
    α = 0.5) — per-source sampling weights proportional to
    (token mass)^α, the standard fix for head-domain domination: a
    source with 100× the tokens gets only 10× the sampling weight.
    α = 0.5 is computed as sqrt — IEEE-correctly-rounded on BOTH
    engines (unlike pow/exp/ln, sqrt carries no transcendental
    residual), and each source's scaled mass is quantized to a
    micro-BIGINT BEFORE the normalizing sum, so the weight ratios and
    the per-source draw counts (for a 100k-doc budget) are exact
    integer arithmetic end to end. Complements llm_domain_mixture /
    llm_epoch_upsample (uniform-target importance weights): this is
    the power-law-target variant an actual pretrain mix uses.

    100 TB shape: one map-side-combinable per-source aggregate
    (O(sources) rows), then scalar arithmetic against the 1-row total
    (aggregate-below broadcast). Nothing corpus-keyed after the first
    aggregate."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.ws_token_count("text").cast("long")).cast("long").alias("n_tokens"),
    )
    q = s.withColumn(
        "s_micro",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long"),
    )
    tot = q.agg(F.sum("s_micro").cast("long").alias("tot"))
    return q.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "s_micro",
        F.expr("(s_micro * 1000000) DIV tot").alias("w_ppm"),
        F.expr("(s_micro * 100000) DIV tot").alias("draws"),
    )


@register(
    "llm_span_corruption",
    tags=("llm", "curation", "training", "denoising"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
m AS (
  SELECT doc_id, len(ts) AS n_tokens,
         [('0x' || substr(md5(doc_id::VARCHAR || '_sc_' || i::VARCHAR), 1, 15))::BIGINT % 100 < 15
          for i in generate_series(1, len(ts))] AS noisy
  FROM t WHERE len(ts) >= 1)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(list_filter(noisy, x -> x)) AS BIGINT) AS n_noisy,
       CAST(len(list_filter([noisy[i] AND (i = 1 OR NOT noisy[i-1])
                             for i in generate_series(1, len(noisy))],
                            x -> x)) AS BIGINT) AS n_spans
FROM m
""",
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION LAYOUT (T5 denoising objective prep) — for each
    document, the deterministic noise mask a span-corruption trainer
    applies: position i is corrupted iff a salted hash of (doc_id, i)
    lands under the 15 % rate, and each MAXIMAL RUN of corrupted
    positions becomes one sentinel span. Emits the per-doc ledger the
    packing step consumes — token count, corrupted-token count, and
    span count (= positions where a noisy run STARTS). Salted-hash
    masking instead of an RNG is the repo's determinism rule: the
    same doc gets the same mask on any executor, any retry, any
    engine — both sides compute the identical md5-derived mask, so
    every count is exact. Run detection pins the span semantics
    (noisy[i] ∧ ¬noisy[i−1]), not just the marginal rate.

    100 TB shape: ENTIRELY row-local — the mask, the filter, and the
    run detection are higher-order array expressions inside one
    projection (no explode, no shuffle before the driver-side
    collect the gate does); the noisy array is LET-bound per row by
    the list comprehension, never recomputed per reference (README
    plan-audit #2 class)."""
    d = load(spark, sf_dir, "documents")
    from ...functions.dedup import md5_int60  # noqa: F401  (formula doc)

    noisy = (
        "transform(sequence(1, size(ts)), i -> "
        "cast(conv(substring(md5(concat(cast(doc_id AS string), '_sc_', "
        "cast(i AS string))), 1, 15), 16, 10) AS bigint) % 100 < 15)"
    )
    m = (
        d.select("doc_id", TX.tokens("text").alias("ts"))
        .where(F.size("ts") >= 1)
        .select(
            "doc_id",
            F.size("ts").cast("long").alias("n_tokens"),
            F.expr(noisy).alias("noisy"),
        )
    )
    return m.select(
        "doc_id",
        "n_tokens",
        F.expr("size(filter(noisy, x -> x))").cast("long").alias("n_noisy"),
        # IF guards the i=1 case so noisy[-1] is NEVER evaluated (ANSI
        # INVALID_ARRAY_INDEX — same class as the try_element_at rule;
        # the oracle's 1-based noisy[0] is a safe NULL absorbed by OR)
        F.expr(
            "size(filter(transform(sequence(1, size(noisy)), "
            "i -> IF(i = 1, noisy[0], noisy[i-1] AND NOT noisy[i-2])), "
            "x -> x))"
        )
        .cast("long")
        .alias("n_spans"),
    )


@register(
    "llm_text_export_roundtrip",
    tags=("llm", "curation", "export", "write"),
    oracle="""
WITH l AS (
  SELECT doc_id::VARCHAR || chr(9) || text AS line FROM documents),
h AS (
  SELECT ('0x' || substr(md5(line), 1, 15))::BIGINT % 1000000007 AS hm
  FROM l)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(hm) AS BIGINT) AS line_checksum
FROM h
""",
)
def llm_text_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-ORIENTED TEXT EXPORT + READ-BACK INTEGRITY — the third
    physical sink next to the parquet shard writer and the hive
    partition layout: curated documents exported as delimited TEXT
    lines (what a trainer's streaming loader actually tails when it
    doesn't speak parquet), read back through the text SOURCE, and
    checksummed line-by-line. The checksum is an order-insensitive
    exact SUM of per-line md5-residues (mod 1e9+7 keeps 500k lines
    inside BIGINT with 10⁶× head-room — README finding #13 class),
    computed on the READ-BACK lines by Spark and on the rendered
    lines directly by DuckDB: a dropped, duplicated, truncated,
    re-encoded, or newline-mangled line anywhere in the write → read
    path moves the sum. Fixture text is single-line ASCII, so the
    TAB delimiter is injective here; a production exporter escapes —
    that's a format choice, the gate pins the TRANSPORT.

    100 TB shape: text write is partition-parallel (one file per
    task, no shuffle); the checksum is one map-side-combinable
    aggregate over the read-back scan."""
    import shutil
    import tempfile

    from ...functions.dedup import md5_int60

    d = load(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="q_textexp_")
    try:
        (
            d.select(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("\t"), F.col("text")
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(out)
        )
        back = spark.read.text(out)
        return (
            back.select(
                (md5_int60(F.col("value")) % F.lit(1000000007)).alias("hm")
            )
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum("hm").cast("long").alias("line_checksum"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "llm_priority_sample",
    tags=("llm", "curation", "sampling"),
    oracle="""
WITH d AS (
  SELECT source, doc_id,
         ('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents),
n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY source),
s AS (
  SELECT d.source, d.doc_id, d.h, n.n_docs
  FROM d JOIN n USING (source)
  WHERE d.h % 1000000 < (80 * 1000000) // n.n_docs),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY h % 1000000, h, doc_id) AS rn
      FROM s)
SELECT source,
       CAST(any_value(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM r WHERE rn <= 20 GROUP BY source
""",
)
def llm_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIORITY SAMPLING (bottom-k by content-keyed hash) — the
    deterministic, RNG-free way to draw a fixed-size uniform sample per
    source from a corpus of ANY size: rank every document by a hash
    priority and keep the k smallest. Unlike rand()-based sampling it
    is reproducible across engines, re-runs, and cluster layouts, and
    membership is stable under corpus growth (a doc only leaves the
    sample when displaced by a lower priority) — the property data-card
    and eval-set pipelines rely on.

    The PRIORITY is the lexicographic key (h %% 1e6, h, doc_id) — the
    same quantity the pre-filter thresholds on leads the ordering, so
    the filter is a true PREFIX of the priority order (r11 ADVICE fix:
    ranking by raw h while filtering on the low bits made membership
    depend on the threshold, i.e. on corpus size). With that
    alignment, the filtered window computes the EXACT global bottom-k
    whenever at least k candidates survive (expected ~4k), and the
    sample is genuinely growth-stable.

    The SCALE story is the two-phase shape: a per-source count (one
    map-side-combinable aggregate, O(sources) rows joined back at
    broadcast scale) sizes an ADAPTIVE pre-filter h %% 1e6 <
    (4k * 1e6) DIV n — expected survivors ~4k per source REGARDLESS of
    corpus size — so the exact bottom-k window runs over a
    bounded-by-construction candidate set, never an sf-linear
    partition (the q43 densification trap). The %% 1e6 fold of the
    60-bit hash is a hair non-uniform (2^59 is not a multiple of 1e6);
    that bias is irrelevant to the gate — both engines compute the
    identical integer predicate. On a tiny fixture the threshold
    saturates (>= 1e6) and every doc is a candidate; the sample stays
    exact either way.

    100 TB shape: one scan + one O(sources) aggregate + a filtered
    window whose partitions hold ~4k rows by construction; all
    integer arithmetic, no RNG state."""
    k = 20
    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        X.md5_int60(
            F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    n = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    s = d.join(n, "source").where(
        F.col("h") % 1000000 < F.expr(f"({4 * k} * 1000000) DIV n_docs")
    )
    w = Window.partitionBy("source").orderBy(
        (F.col("h") % 1000000).asc(), F.col("h").asc(), F.col("doc_id").asc()
    )
    r = s.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return r.groupBy("source").agg(
        F.first("n_docs").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )
