"""Text-analysis family: quality heuristics, language ID, token statistics, BPE train/apply, LM scoring, fingerprinting, eval metrics.

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
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BPE_VOCAB_CTE,
    _LANGID_CTE,
    _SENT_NEG,
    _SENT_POS,
    _TOKS,
    _bm25_term_sql,
    _bpe_gen_sql,
)



@register(
    "llm_fingerprint",
    tags=("llm", "text"),
    oracle=f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
FROM documents
""",
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-distinct-token fingerprint (near-dup clustering key)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint().alias("fp"))


@register(
    "llm_text_quality",
    headline=True,
    tags=("llm", "text"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       floor((len(list_distinct(toks)) / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS distinct_ratio,
       floor((len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','for','on')))
             / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS stop_ratio,
       floor((list_sum(list_transform(toks, t -> length(t))) / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS avg_word_len,
       floor((0.4 * (len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','for','on')))
                    / len(toks)::DOUBLE)
             + 0.4 * (len(list_distinct(toks)) / len(toks)::DOUBLE)
             + 0.2 * least(len(toks)::DOUBLE, 100.0) / 100.0) * 10000 + 0.5) / 10000.0 AS quality
FROM t
""",
)
def llm_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned quality formula over length/stopword/distinct ratios."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *TX.quality_columns())


@register(
    "llm_langid",
    tags=("llm", "text"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
h AS (
  SELECT doc_id,
         len(list_filter(toks, t -> t IN ('the','a','and','of','to')))        AS en_hits,
         len(list_filter(toks, t -> t IN ('der','und','die','das','nicht')))  AS de_hits,
         len(list_filter(toks, t -> t IN ('le','la','et','les','des')))       AS fr_hits,
         len(list_filter(toks, t -> t IN ('el','los','las','una','por')))     AS es_hits,
         len(list_filter(toks, t -> t IN ('de5','shi4','bu4','le5','wo3')))   AS zh_hits
  FROM t)
SELECT doc_id, en_hits, de_hits, fr_hits, es_hits, zh_hits,
       CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits, zh_hits) THEN 'en'
            WHEN de_hits >= greatest(fr_hits, es_hits, zh_hits) THEN 'de'
            WHEN fr_hits >= greatest(es_hits, zh_hits) THEN 'fr'
            WHEN es_hits >= zh_hits THEN 'es'
            ELSE 'zh' END AS pred_lang
FROM h
""",
)
def llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with fixed tie precedence."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *TX.langid_columns())


@register(
    "llm_token_stats",
    tags=("llm", "text"),
    oracle=f"""
SELECT doc_id,
       len({_TOKS}) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
       n_chars
FROM documents
""",
)
def llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.ws_token_count().alias("ws_tokens"),
        TX.bpe_token_count().alias("bpe_tokens"),
        "n_chars",
    )


@register(
    "llm_repetition_loops",
    tags=("llm", "text", "quality", "degenerate"),
    oracle=f"""
WITH t AS (
  SELECT doc_id, substr(text, length(text) - least(length(text), 64) + 1) AS tail
  FROM documents),
p AS (
  SELECT doc_id, tail,
         list_filter(range(1, 17),
           p -> length(tail) >= 2 * p
                AND substr(tail, length(tail) - 2 * p + 1, p)
                    = substr(tail, length(tail) - p + 1, p)) AS periods
  FROM t)
SELECT doc_id,
       len(periods) > 0 AS has_loop,
       CAST(COALESCE(periods[1], 0) AS BIGINT) AS min_period,
       CAST(len(periods) AS BIGINT) AS n_periods
FROM p
""",
)
def llm_repetition_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGENERATE-LOOP detection — the tail-repetition check a
    training-data pipeline runs to catch model-generated or
    scraper-glitched text that ends in a repeating cycle ("the the
    the", "ha ha ha ha"): over the last 64 chars, a period p ≤ 16 is
    flagged when the final p chars equal the p chars before them
    (one cycle of evidence; Gopher-style duplicate-n-gram fractions —
    llm_doc_repetition — catch global repetition, this catches the
    TAIL loop an autoregressive generator falls into). Emits the
    smallest flagged period and the flagged-period count per doc.

    100 TB shape: entirely row-local (one bounded substring + a
    16-candidate filter in codegen), no shuffle, scan prunes to
    (doc_id, text)."""
    d = load(spark, sf_dir, "documents")
    tail = F.expr("substring(text, length(text) - least(length(text), 64) + 1)")
    t = d.select("doc_id", tail.alias("tail"))
    periods = F.expr(
        "filter(sequence(1, 16), p -> length(tail) >= 2 * p "
        "AND substring(tail, length(tail) - 2 * p + 1, p) "
        "= substring(tail, length(tail) - p + 1, p))"
    )
    p = t.select("doc_id", periods.alias("periods"))
    return p.select(
        "doc_id",
        (F.size("periods") > 0).alias("has_loop"),
        # try_element_at: ANSI element_at THROWS on an empty array
        # (same strictness class as the /0 guards)
        F.coalesce(F.try_element_at("periods", F.lit(1)), F.lit(0))
        .cast("long")
        .alias("min_period"),
        F.size("periods").cast("long").alias("n_periods"),
    )


@register(
    "llm_pmi_collocations",
    tags=("llm", "text", "mining", "collocations"),
    oracle=f"""
WITH t AS (SELECT {_TOKS} AS ts FROM documents),
big AS (
  SELECT unnest(ts[1:len(ts)-1]) AS a, unnest(ts[2:len(ts)]) AS b
  FROM t WHERE len(ts) >= 2),
cb AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
  FROM big WHERE a <> '' AND b <> ''
  GROUP BY a, b HAVING count(*) >= 5),
cu AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(ts) AS w FROM t)
  WHERE w <> '' GROUP BY w),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cu),
r AS (
  SELECT cb.a, cb.b, cb.c_ab,
         (cb.c_ab * (SELECT n FROM n) * 1000000) // (ua.c * ub.c)
           AS pmi_ratio_micro
  FROM cb JOIN cu ua ON ua.w = cb.a JOIN cu ub ON ub.w = cb.b)
SELECT a, b, c_ab, pmi_ratio_micro, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi_ratio_micro DESC, a, b) AS rank
  FROM r)
WHERE rank <= 20
""",
)
def llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION MINING — the top-20 adjacent word pairs by
    pointwise mutual information, the classic corpus-analysis pass for
    finding multiword expressions worth protecting from a tokenizer or
    auditing in a data card. PMI itself is ln(N·c_ab/(c_a·c_b)); ln is
    1-ulp engine-dependent (repo transcendental rule), so the RANKING
    uses the exact integer ratio (c_ab·N·10⁶) DIV (c_a·c_b) — strictly
    monotone in PMI, engine-exact BIGINT arithmetic, nothing to
    round. Support floor c_ab ≥ 5 kills singleton noise.

    100 TB shape: one bigram explode + two hash aggregates (bigram
    and unigram counts, both map-side combinable), the 1-row total
    joined back (aggregate-below), two vocabulary-sized joins, and a
    top-20 WindowGroupLimit over the AGGREGATED pair relation (never
    a corpus-scale global sort). Overflow bound: c_ab·N·10⁶ needs
    N·c_ab < 9·10¹² — at real corpus sizes the production variant
    ranks on log-space doubles instead (documented tradeoff; the gate
    fixture is exact)."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    t = d.select(TX.tokens("text").alias("ts"))
    big = (
        t.where(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1), "
                    "i -> struct(ts[i-1] AS a, ts[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .where((F.col("a") != "") & (F.col("b") != ""))
    )
    cb = (
        big.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= 5)
    )
    cu = (
        t.select(F.explode("ts").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = cu.agg(F.sum("c").alias("n"))
    r = (
        cb.join(cu.select(F.col("w").alias("a"), F.col("c").alias("c_a")), "a")
        .join(cu.select(F.col("w").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "c_ab",
            F.expr("(c_ab * n * 1000000) DIV (c_a * c_b)").alias(
                "pmi_ratio_micro"
            ),
        )
    )
    w = Window.orderBy(F.desc("pmi_ratio_micro"), F.asc("a"), F.asc("b"))
    return (
        r.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("a", "b", "c_ab", "pmi_ratio_micro", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "llm_doc_repetition",
    tags=("llm", "text", "quality"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id,
             [toks[i] || ' ' || toks[i+1] for i in generate_series(1, len(toks) - 1)] AS g2,
             [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
              for i in generate_series(1, len(toks) - 2)] AS g3
      FROM t)
SELECT doc_id,
       CASE WHEN len(g2) = 0 THEN 0.0
            ELSE floor(((len(g2) - len(list_distinct(g2))) / len(g2)::DOUBLE) * 10000 + 0.5) / 10000.0 END AS dup2_frac,
       CASE WHEN len(g3) = 0 THEN 0.0
            ELSE floor(((len(g3) - len(list_distinct(g3))) / len(g3)::DOUBLE) * 10000 + 0.5) / 10000.0 END AS dup3_frac,
       (CASE WHEN len(g3) = 0 THEN 0.0
             ELSE floor(((len(g3) - len(list_distinct(g3))) / len(g3)::DOUBLE) * 10000 + 0.5) / 10000.0 END) >= 0.1 AS repetitive
FROM g
""",
)
def llm_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style duplicate n-gram
    fractions): row-local array arithmetic, no shuffle; flags
    boilerplate/keyword-stuffed documents at dup3_frac >= 0.1."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *TX.repetition_columns())


@register(
    "llm_doc_chunking",
    tags=("llm", "text", "chunking"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
idx AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, CAST(ceil(len(toks) / 48.0) AS INT) - 1)) AS chunk_id
  FROM t)
SELECT doc_id, chunk_id::INT AS chunk_id,
       len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64])::INT AS n_chunk_tokens,
       md5(array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')) AS chunk_hash
FROM idx
""",
)
def llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window passage chunking (64-token chunks, stride 48 →
    16-token overlap): each document explodes into its chunk set with
    per-chunk token counts and content hashes. Row-multiplying but
    row-local — no shuffle; the chunk text itself never leaves the
    expression (hash only), so the scan stays narrow."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(TX.chunk_columns()).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("c.chunk_hash").alias("chunk_hash"),
    )


@register(
    "llm_gopher_rules",
    tags=("llm", "text", "quality"),
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks,
                  string_split(text, chr(10)) AS lines
           FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         floor((list_sum(list_transform(toks, t -> length(t))) / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS mean_word_len,
         floor((((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) / 3)
               / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS symbol_ratio,
         floor((len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')))
               / len(lines)::DOUBLE) * 10000 + 0.5) / 10000.0 AS bullet_frac,
         floor((len(list_filter(lines, l -> ends_with(rtrim(l), '...')))
               / len(lines)::DOUBLE) * 10000 + 0.5) / 10000.0 AS ellipsis_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         w -> list_contains(toks, w))) AS stop_hits
  FROM t)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac, stop_hits,
       (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
        AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND stop_hits >= 2) AS passes
FROM m
""",
)
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate (word-count / word-length
    bounds, symbol ratio, bullet- and ellipsis-line fractions, minimum
    function-word hits) — the standard pretraining drop rules as one
    row-local codegen projection, no shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *TX.gopher_columns())


@register(
    "llm_unigram_surprise",
    tags=("llm", "text", "quality", "lm"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
tot AS (SELECT sum(c)::DOUBLE AS tot FROM freq)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       floor((avg(-log2(c / tot))) * 10000 + 0.5) / 10000.0 AS surprise
FROM tok JOIN freq USING (t) CROSS JOIN tot
GROUP BY doc_id
""",
)
def llm_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM surprise score (perplexity-proxy quality
    filter): one token-keyed model aggregate, one token-keyed join
    back, one per-doc aggregate — the CCNet-style band-pass signal
    without any external model."""
    return TX.unigram_surprise(load(spark, sf_dir, "documents"))


@register(
    "llm_tfidf_topterms",
    tags=("llm", "text", "tfidf"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, t),
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, t,
         floor((tf * (ln((n + 1) / (df + 1)::DOUBLE) + 1)) * 1000000 + 0.5) / 1000000.0 AS score
  FROM tf JOIN dfreq USING (t) CROSS JOIN nd)
SELECT doc_id, t AS term, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rank
  FROM scored)
WHERE rank <= 3
""",
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, 6-dp-pinned
    ranking): per-(doc, term) map-side counts, one term-keyed document-
    frequency aggregate, a term-keyed idf join, and a doc-keyed top-k
    window — linear in token volume, no all-pairs."""
    return TX.tfidf_top_terms(load(spark, sf_dir, "documents"), k=3)


@register(
    "llm_bpe_merge_counts",
    tags=("llm", "text", "tokenizer", "bpe"),
    oracle=f"""
WITH w AS (SELECT unnest({_TOKS}) AS word FROM documents),
chars AS (SELECT word, string_split(word, '') AS cs FROM w WHERE length(word) >= 2),
pairs AS (
  SELECT unnest([cs[i] || cs[i+1] for i in generate_series(1, len(cs) - 1)]) AS pair
  FROM chars),
counted AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs GROUP BY pair)
SELECT pair, cnt, rank FROM (
  SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rank
  FROM counted)
WHERE rank <= 20
""",
)
def llm_bpe_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of one BPE merge round (the tokenizer-training
    inner loop): adjacent character-pair frequencies over all token
    occurrences, top-20 merge candidates (count desc, pair asc). One
    explode into pairs, ONE pair-keyed aggregate (pair-vocabulary
    sized, not corpus sized), and a top-k over the tiny aggregate —
    linear in character volume."""
    d = load(spark, sf_dir, "documents")
    pairs = d.select(F.explode(TX.tokens()).alias("word")).filter(
        F.length("word") >= 2
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(0, length(word) - 2), "
                "i -> concat(substring(word, i + 1, 1), substring(word, i + 2, 1)))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )


@register(
    "llm_c4_clean",
    tags=("llm", "text", "quality", "c4"),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM documents),
m AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         len(list_filter(lines, l ->
             (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!') OR ends_with(rtrim(l), '?'))
             AND len(string_split_regex(trim(l), '\\s+')) >= 3)) AS kept_lines
  FROM t)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(kept_lines AS BIGINT) AS kept_lines,
       floor((kept_lines / n_lines::DOUBLE) * 10000 + 0.5) / 10000.0 AS kept_frac,
       kept_lines >= 3 AS passes
FROM m
""",
)
def llm_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning gate (terminal punctuation + >= 3
    words per line, >= 3 kept lines per doc) — one row-local codegen
    projection, no shuffle, trivially parallel at any scale."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *TX.c4_line_columns())


@register(
    "llm_surprise_buckets",
    tags=("llm", "text", "quality", "lm"),
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
tot AS (SELECT sum(c)::DOUBLE AS tot FROM freq),
per AS (
  SELECT doc_id, floor((avg(-log2(c / tot))) * 10000 + 0.5) / 10000.0 AS surprise
  FROM tok JOIN freq USING (t) CROSS JOIN tot GROUP BY doc_id),
cuts AS (SELECT quantile_cont(surprise, 1.0/3) AS c1,
                quantile_cont(surprise, 2.0/3) AS c2 FROM per)
SELECT doc_id, surprise,
       CASE WHEN surprise <= c1 THEN 'head'
            WHEN surprise <= c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM per CROSS JOIN cuts
""",
)
def llm_surprise_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity banding: tercile cutoffs
    of the unigram-LM surprise (exact interpolated percentiles on the
    4-dp-rounded score) assigned by row-local comparison against a
    broadcast two-value aggregate — no global sort/ntile anywhere in
    the plan, so the shape survives 100 TB."""
    return TX.surprise_buckets(load(spark, sf_dir, "documents"))


@register(
    "llm_bm25_topk",
    tags=("llm", "text", "retrieval", "bm25"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
m AS (SELECT doc_id, len(toks) AS dl,
        {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM t),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}" for i in range(len(_BM25_TERMS)))}
      FROM m),
scored AS (
  SELECT doc_id,
         floor(({" + ".join(_bm25_term_sql(i) for i in range(len(_BM25_TERMS)))}) * 1000000 + 0.5) / 1000000.0 AS score
  FROM m CROSS JOIN s)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored)
WHERE rank <= 20
""",
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-20 documents for a fixed 4-term query
    (score desc, doc_id asc). Zero wide shuffles — row-local term
    frequencies, one broadcast stats row, TakeOrdered top-k."""
    d = load(spark, sf_dir, "documents")
    scored = TX.bm25_scores(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B)
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


@register(
    "llm_sentiment",
    tags=("llm", "text", "sentiment"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n,
         len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in _SENT_POS)}))) AS pos,
         len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in _SENT_NEG)}))) AS neg
  FROM t)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
       floor(((pos - neg) / CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS polarity,
       CASE WHEN pos > neg THEN 'pos' WHEN neg > pos THEN 'neg' ELSE 'neutral' END AS label
FROM m
""",
)
def llm_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring (the EDBT'16 Spark-sentiment
    shape): per-document positive/negative lexicon hits and a
    length-normalized polarity in [-1, 1]. Row-local codegen — the
    lexicons inline as literal IN-lists, token counts via
    size/array_remove (no lambda), zero shuffles."""
    d = load(spark, sf_dir, "documents")
    toks_df = d.select("doc_id", TX.tokens().alias("toks"))

    def hits(words: tuple[str, ...]) -> F.Column:
        c = None
        for w in words:
            h = F.size("toks") - F.size(F.array_remove("toks", w))
            c = h if c is None else c + h
        return c

    m = toks_df.select(
        "doc_id",
        F.size("toks").alias("n"),
        hits(_SENT_POS).cast("long").alias("pos"),
        hits(_SENT_NEG).cast("long").alias("neg"),
    )
    return m.select(
        "doc_id",
        "pos",
        "neg",
        fround((F.col("pos") - F.col("neg")) / F.col("n").cast("double"), 4).alias(
            "polarity"
        ),
        F.when(F.col("pos") > F.col("neg"), "pos")
        .when(F.col("neg") > F.col("pos"), "neg")
        .otherwise("neutral")
        .alias("label"),
    )


@register(
    "llm_bigram_lm",
    tags=("llm", "text", "quality", "lm"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bgs AS (
  SELECT doc_id,
         unnest([struct_pack(u := t[i], v := t[i+1])
                 for i in generate_series(1, len(t) - 1)]) AS bg
  FROM t WHERE len(t) >= 2),
b AS (SELECT doc_id, bg.u AS u, bg.v AS v FROM bgs),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM t) GROUP BY w),
tot AS (SELECT sum(c)::DOUBLE AS tot FROM uni),
c2 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c2 FROM b GROUP BY u, v),
scored AS (
  SELECT b.doc_id,
         CAST(floor(
           -log2(0.9 * (c2.c2 / cu.c::DOUBLE) + 0.1 * (cv.c / tot.tot))
           * 1000000000.0 + 0.5) AS BIGINT) AS nlog
  FROM b
  JOIN c2 USING (u, v)
  JOIN uni cu ON cu.w = b.u
  JOIN uni cv ON cv.w = b.v
  CROSS JOIN tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(sum(nlog) / CAST(count(*) AS DOUBLE) / 100000.0 + 0.5) / 10000.0
           AS bits_per_bigram
FROM scored GROUP BY doc_id
""",
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM surprise (Jelinek-Mercer lam=0.9) — the
    perplexity-proxy quality filter one model order above
    llm_unigram_surprise: sees word ORDER, so shuffled word salad that
    fools the unigram filter scores high here. Per-bigram scores are
    nano-quantized BIGINTs summed exactly; the residual cross-engine
    risk is the documented 1-ulp log2 class (llm_naive_bayes
    docstring). Model aggregates are vocabulary-sized, the score join
    is (u,v)-keyed, no window — linear in token volume."""
    return TX.bigram_surprise(load(spark, sf_dir, "documents"))


@register(
    "llm_langid_confusion",
    tags=("llm", "text", "langid", "eval"),
    oracle=f"""
WITH {_LANGID_CTE},
cm AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2)
SELECT lang, pred_lang, n,
       floor(n::DOUBLE / (sum(n) OVER (PARTITION BY lang))::DOUBLE * 1000000 + 0.5)
           / 1000000.0 AS recall_frac,
       floor(n::DOUBLE / (sum(n) OVER (PARTITION BY pred_lang))::DOUBLE * 1000000 + 0.5)
           / 1000000.0 AS precision_frac
FROM cm
""",
)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the EVALUATION face of llm_langid:
    declared corpus `lang` (truth) x stopword-marker prediction, with
    per-cell recall (n / truth-row total) and precision (n / predicted-
    column total). The operator a curation pipeline runs before
    trusting a cheap classifier to route 100 TB: which language pairs
    does the heuristic confuse, and at what rate?

    100 TB shape: the per-doc prediction is row-local codegen (five
    filter-count expressions); the confusion matrix is ONE hash
    aggregate keyed (lang, pred_lang) with map-side combine — at most
    |langs|^2 rows — and the windows run over that tiny aggregate, not
    the corpus. Fractions are floor-quantized to 6 dp on both engines
    (repo round standard)."""
    d = load(spark, sf_dir, "documents")
    pred = d.select("lang", *TX.langid_columns()).select("lang", "pred_lang")
    cm = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    w_truth = Window.partitionBy("lang")
    w_pred = Window.partitionBy("pred_lang")
    return cm.select(
        "lang",
        "pred_lang",
        "n",
        fround(F.col("n").cast("double") / F.sum("n").over(w_truth).cast("double"), 6).alias(
            "recall_frac"
        ),
        fround(F.col("n").cast("double") / F.sum("n").over(w_pred).cast("double"), 6).alias(
            "precision_frac"
        ),
    )


@register(
    "llm_quality_ablation",
    tags=("llm", "text", "quality", "eval"),
    oracle=f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, lang,
         len(toks) AS n_words,
         floor((len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','for','on')))
               / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS stop_ratio,
         floor((len(list_distinct(toks)) / len(toks)::DOUBLE) * 10000 + 0.5) / 10000.0 AS distinct_ratio,
         len(list_filter(toks, t -> t IN ('the','a','and','of','to')))        AS en_hits,
         len(list_filter(toks, t -> t IN ('der','und','die','das','nicht')))  AS de_hits,
         len(list_filter(toks, t -> t IN ('le','la','et','les','des')))       AS fr_hits,
         len(list_filter(toks, t -> t IN ('el','los','las','una','por')))     AS es_hits,
         len(list_filter(toks, t -> t IN ('de5','shi4','bu4','le5','wo3')))   AS zh_hits
  FROM t),
flags AS (
  SELECT doc_id,
         n_words >= 40 AS f_len,
         stop_ratio >= 0.05 AS f_stop,
         distinct_ratio >= 0.45 AS f_distinct,
         (CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits, zh_hits) THEN 'en'
               WHEN de_hits >= greatest(fr_hits, es_hits, zh_hits) THEN 'de'
               WHEN fr_hits >= greatest(es_hits, zh_hits) THEN 'fr'
               WHEN es_hits >= zh_hits THEN 'es'
               ELSE 'zh' END) = lang AS f_langid
  FROM m),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS p_len,
         CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS p_stop,
         CAST(sum(CASE WHEN f_distinct THEN 1 ELSE 0 END) AS BIGINT) AS p_distinct,
         CAST(sum(CASE WHEN f_langid THEN 1 ELSE 0 END) AS BIGINT) AS p_langid,
         CAST(sum(CASE WHEN NOT f_len AND f_stop AND f_distinct AND f_langid THEN 1 ELSE 0 END) AS BIGINT) AS u_len,
         CAST(sum(CASE WHEN f_len AND NOT f_stop AND f_distinct AND f_langid THEN 1 ELSE 0 END) AS BIGINT) AS u_stop,
         CAST(sum(CASE WHEN f_len AND f_stop AND NOT f_distinct AND f_langid THEN 1 ELSE 0 END) AS BIGINT) AS u_distinct,
         CAST(sum(CASE WHEN f_len AND f_stop AND f_distinct AND NOT f_langid THEN 1 ELSE 0 END) AS BIGINT) AS u_langid,
         CAST(sum(CASE WHEN f_len AND f_stop AND f_distinct AND f_langid THEN 1 ELSE 0 END) AS BIGINT) AS p_all
  FROM flags)
SELECT f.filter_name, a.n AS n_docs,
       CASE f.filter_name WHEN 'len' THEN p_len WHEN 'stop' THEN p_stop
            WHEN 'distinct' THEN p_distinct WHEN 'langid' THEN p_langid
            ELSE p_all END AS n_pass,
       floor(CASE f.filter_name WHEN 'len' THEN p_len WHEN 'stop' THEN p_stop
                  WHEN 'distinct' THEN p_distinct WHEN 'langid' THEN p_langid
                  ELSE p_all END::DOUBLE / a.n::DOUBLE * 1000000 + 0.5) / 1000000.0 AS pass_frac,
       CASE f.filter_name WHEN 'len' THEN u_len WHEN 'stop' THEN u_stop
            WHEN 'distinct' THEN u_distinct WHEN 'langid' THEN u_langid
            ELSE CAST(0 AS BIGINT) END AS unique_kills
FROM a CROSS JOIN (
  SELECT unnest(['len','stop','distinct','langid','ALL']) AS filter_name) f
""",
)
def llm_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ABLATION — the readout that decides a curation
    stack: per filter (length floor n_words >= 40, stopword-density
    floor stop_ratio >= 0.05 "is it prose", lexical-diversity floor
    distinct_ratio >= 0.45 "not repetition spam", langid-agrees-with-
    declared-lang), how many docs pass, the pass fraction, and the
    filter's UNIQUE KILLS (docs it alone rejects while the other three
    pass) — plus the ALL row (conjunction survivors). High unique
    kills = the filter carries independent signal; near-zero =
    redundant at this corpus mix. Thresholds sit at this corpus's
    quartiles so every filter discriminates (the composite
    Gopher/C4 gates from llm_gopher_rules/llm_c4_clean pass nothing
    on the short single-line synthetic docs — their per-doc metric
    faces stay the standalone queries).

    100 TB shape: every flag is a row-local codegen predicate (the
    frounded ratios shared with llm_text_quality, independently
    hash-green), computed in ONE corpus scan; the ablation is a single
    global aggregate (map-side partial, 1 row) exploded into 5 labeled
    rows. No join, no window, no second scan."""
    d = load(spark, sf_dir, "documents")
    q = TX.quality_columns()  # n_tokens, distinct_ratio, stop_ratio, ...
    flags = d.select(
        (q[0] >= 40).alias("f_len"),
        (q[2] >= 0.05).alias("f_stop"),
        (q[1] >= 0.45).alias("f_distinct"),
        (TX.langid_columns()[-1] == F.col("lang")).alias("f_langid"),
    )
    i = lambda c: F.col(c).cast("long")  # noqa: E731
    agg = flags.agg(
        F.count("*").alias("n"),
        F.sum(i("f_len")).alias("p_len"),
        F.sum(i("f_stop")).alias("p_stop"),
        F.sum(i("f_distinct")).alias("p_distinct"),
        F.sum(i("f_langid")).alias("p_langid"),
        F.sum((~F.col("f_len") & F.col("f_stop") & F.col("f_distinct") & F.col("f_langid")).cast("long")).alias("u_len"),
        F.sum((F.col("f_len") & ~F.col("f_stop") & F.col("f_distinct") & F.col("f_langid")).cast("long")).alias("u_stop"),
        F.sum((F.col("f_len") & F.col("f_stop") & ~F.col("f_distinct") & F.col("f_langid")).cast("long")).alias("u_distinct"),
        F.sum((F.col("f_len") & F.col("f_stop") & F.col("f_distinct") & ~F.col("f_langid")).cast("long")).alias("u_langid"),
        F.sum((F.col("f_len") & F.col("f_stop") & F.col("f_distinct") & F.col("f_langid")).cast("long")).alias("p_all"),
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("filter_name"),
                        F.col("n").alias("n_docs"),
                        F.col(p).alias("n_pass"),
                        F.col(u).cast("long").alias("unique_kills"),
                    )
                    for name, p, u in [
                        ("len", "p_len", "u_len"),
                        ("stop", "p_stop", "u_stop"),
                        ("distinct", "p_distinct", "u_distinct"),
                        ("langid", "p_langid", "u_langid"),
                    ]
                ],
                F.struct(
                    F.lit("ALL").alias("filter_name"),
                    F.col("n").alias("n_docs"),
                    F.col("p_all").alias("n_pass"),
                    F.lit(0).cast("long").alias("unique_kills"),
                ),
            )
        ).alias("e")
    ).select("e.filter_name", "e.n_docs", "e.n_pass", "e.unique_kills")
    return rows.select(
        "filter_name",
        "n_docs",
        "n_pass",
        fround(F.col("n_pass").cast("double") / F.col("n_docs").cast("double"), 6).alias(
            "pass_frac"
        ),
        "unique_kills",
    )


@register(
    "llm_udf_tokenize_arrow",
    tags=("llm", "text", "tokenize", "arrow"),
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
       len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS n_distinct,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       floor(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::DOUBLE
             / strlen(text)::DOUBLE * 100.0 * 10000 + 0.5) / 10000.0 AS tokens_per_100b
FROM documents
""",
)
def llm_udf_tokenize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched TOKENIZER harness — the plumbing a real BPE/
    SentencePiece tokenizer (a Python library, unavoidable at training
    time) runs through at 100 TB: ``mapInPandas`` over Arrow batches,
    one vectorized pass per batch, emitting per-doc token statistics.
    Here the tokenizer is the repo's BPE-ish regex so DuckDB can
    verify the ENTIRE path hash-exactly (the real tokenizer swaps into
    the same iterator body with zero plan changes — exactly the
    decode_png_auto capability-gate pattern).

    100 TB shape: no shuffle at all — a narrow mapInPandas projection
    after an explicit repartition (testdata parquet is one row group
    per file; real corpora split by size). Batch-columnar in/out;
    the only Python loop is pandas' vectorized str.findall. The
    quantized ratio uses numpy float64 floor — the same binary
    semantics as both engines' floor."""
    import pandas as pd  # noqa: F401 (signature clarity)

    def tok(batches):
        import numpy as np
        import pandas as pd

        # Whitespace class spelled out as RE2's EXACT \s set
        # ([\t\n\f\r ] — no \v, no Unicode): Python re's \s is
        # Unicode-aware, so a document with U+00A0 would drop it while
        # the DuckDB oracle emits it as a punctuation token (r8
        # ADVICE); \v is a token in RE2 (verified against DuckDB).
        # Spelling out the set makes both engines agree on ANY input,
        # not just the ASCII synthetic corpus.
        pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]"
        for pdf in batches:
            toks = pdf["text"].str.findall(pat)
            n_tokens = toks.str.len().astype("int64")
            n_distinct = toks.map(lambda ts: len(set(ts))).astype("int64")
            n_bytes = pdf["text"].str.encode("utf-8").str.len().astype("int64")
            ratio = n_tokens.to_numpy(dtype=np.float64) / n_bytes.to_numpy(dtype=np.float64) * 100.0
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_tokens": n_tokens,
                    "n_distinct": n_distinct,
                    "n_bytes": n_bytes,
                    "tokens_per_100b": np.floor(ratio * 1e4 + 0.5) / 1e4,
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text").repartition(32)
    return d.mapInPandas(
        tok,
        "doc_id bigint, n_tokens bigint, n_distinct bigint, n_bytes bigint, tokens_per_100b double",
    )


@register(
    "llm_corpus_profile",
    tags=("llm", "text", "profile", "selection"),
    oracle=f"""
WITH t AS (SELECT source, len({_TOKS}) AS n_toks FROM documents),
r AS (SELECT source, n_toks,
             row_number() OVER (PARTITION BY source ORDER BY n_toks) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM t)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(max(n_toks) AS BIGINT) AS max_tokens,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN n_toks END) AS BIGINT) AS median_tokens
FROM r
GROUP BY source
""",
)
def llm_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus PROFILE — the first table a curation run
    prints: doc count, total/max token counts, and the EXACT token
    median per source computed by the distributed two-pass histogram
    selection (operators/selection.grouped_kth on an integer column —
    no per-group buffering, no sort of raw rows; the oracle sorts, as
    the semantic spec). Token counts feed the mixture/packing stages,
    so their per-source distribution is what decides sampling weights.

    100 TB shape: one tokenize scan into (source, n_toks); the profile
    aggregate is |sources| rows; the median adds two histogram passes
    whose windows run over per-(source, bin) aggregates."""
    from ...operators.selection import grouped_kth

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.col("source"), F.size(TX.tokens("text")).cast("long").alias("n_toks")
    )
    stats = toks.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.max("n_toks").alias("max_tokens"),
    )
    med = grouped_kth(
        toks.select("source", F.col("n_toks").cast("double").alias("n_toks")),
        "source",
        "n_toks",
        lambda n: (n + 1) / 2,
    ).select(F.col("grp").alias("source"), F.col("value").cast("long").alias("median_tokens"))
    return stats.join(med, "source").select(
        "source", "n_docs", "total_tokens", "max_tokens", "median_tokens"
    )


@register(
    "llm_bpe_tokenize",
    tags=("llm", "text", "tokenizer", "bpe"),
    oracle=f"""
WITH RECURSIVE
wx AS (
  SELECT doc_id,
         unnest({_TOKS}) AS w,
         unnest(range(1, len({_TOKS}) + 1)) AS pos
  FROM documents),
wq AS (SELECT doc_id, w, pos FROM wx WHERE length(w) >= 1),
words AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wq GROUP BY w),
st0 AS (
  SELECT w, c, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
  FROM words),
{_bpe_gen_sql('st0', 'm1', 'walk1', 'st1', 8)},
{_bpe_gen_sql('st1', 'm2', 'walk2', 'st2', 8)},
{_bpe_gen_sql('st2', 'm3', 'walk3', 'st3', 8)},
pw AS (
  SELECT w, trim(s) AS toks_str,
         len(string_split(trim(s), ' ')) AS n_toks,
         len(list_filter(string_split(trim(s), ' '), t -> length(t) > 1)) AS n_merged
  FROM st3),
per_doc AS (
  SELECT wq.doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(pw.n_toks) AS BIGINT) AS n_tokens,
         CAST(sum(pw.n_merged) AS BIGINT) AS n_merged_tokens,
         md5(string_agg(pw.toks_str, '|' ORDER BY wq.pos)) AS tok_digest
  FROM wq JOIN pw ON pw.w = wq.w
  GROUP BY wq.doc_id)
SELECT d.doc_id,
       COALESCE(p.n_words, 0) AS n_words,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_merged_tokens, 0) AS n_merged_tokens,
       COALESCE(p.tok_digest, md5('')) AS tok_digest
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""",
)
def llm_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a BPE merge table and APPLY it — the end-to-end tokenizer
    a pretrain pipeline actually runs, closing the r8 loop where
    llm_bpe_merge_counts computed merge statistics that nothing ever
    applied. Batched-generation BPE: 3 generations × 8 merges; each
    generation counts adjacent token pairs over the CURRENT state of
    the word-frequency table (classic BPE trains on word frequencies,
    a vocabulary-sized relation, not the corpus), takes the top 8
    (count DESC, pair ASC), and applies them as a chained JVM
    replace() over the spaced token string — replace()'s leftmost-
    nonoverlapping all-occurrence semantics ARE BPE's single-rule
    application, and within a generation each rule pairs tokens that
    existed before the generation, so one pass per rule in rank order
    is exact (functions/text.py bpe_train). Per-doc output: word and
    token counts, merged-token count, and an md5 digest of the full
    token sequence ('|'-joined per-word token strings in document
    order) — the digest pins the EXACT tokenization, so the DuckDB
    oracle (which retrains the same table via three recursive-CTE
    walks) verifies token identity, not just counts.

    100 TB shape: training is per-generation ONE pair-keyed aggregate
    over the vocabulary + an 8-row driver collect; apply is 24
    codegen replaces over the vocabulary; the only corpus-scale ops
    are the word explode and ONE hash join words→tokenized-word
    (broadcastable when the vocab fits, AQE decides) + per-doc
    aggregate. The trained merge list is exactly what
    functions/text.bpe_apply_merges_pandas ships into the Arrow
    tokenizer harness (llm_udf_tokenize_arrow's swap-in slot); the
    two apply paths are pinned equal in tests."""
    from ...functions.text import bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    wx = d.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos", "w")
    ).where(F.length("w") >= 1)
    words = wx.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    state, _merges = bpe_train(bpe_spaced_state(words))
    pw = state.select("w", F.trim("s").alias("toks_str")).select(
        "w",
        "toks_str",
        F.split("toks_str", " ").alias("ta"),
    ).select(
        "w",
        "toks_str",
        F.size("ta").cast("long").alias("n_toks"),
        F.size(F.filter("ta", lambda t: F.length(t) > 1)).cast("long").alias("n_merged"),
    )
    per_doc = (
        wx.join(pw, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_merged").alias("n_merged_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "toks_str"))),
                        lambda x: x["toks_str"],
                    ),
                    "|",
                )
            ).alias("tok_digest"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_merged_tokens", F.lit(0)).cast("long").alias("n_merged_tokens"),
            F.coalesce("tok_digest", F.md5(F.lit(""))).alias("tok_digest"),
        )
    )


@register(
    "llm_wer_eval",
    tags=("llm", "text", "eval", "wer"),
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter({_TOKS}, w -> length(w) >= 1) AS ref_toks,
         substr(trim(text), 1, 500) AS ref_sub
  FROM documents),
h AS (
  SELECT doc_id, ref_toks, ref_sub,
         list_transform(
           list_filter(ref_toks, (w, i) -> (i - 1) % 7 != 3),
           w -> CASE WHEN w = 'the' THEN 'teh' ELSE w END) AS hyp_toks
  FROM t),
e AS (
  SELECT doc_id,
         CAST(len(ref_toks) AS BIGINT) AS n_ref_words,
         CAST(len(hyp_toks) AS BIGINT) AS n_hyp_words,
         array_to_string(list_transform(ref_toks,
           w -> chr(CAST(97 + (length(w) * 7 + ascii(w)) % 26 AS INTEGER))), '') AS enc_ref,
         array_to_string(list_transform(hyp_toks,
           w -> chr(CAST(97 + (length(w) * 7 + ascii(w)) % 26 AS INTEGER))), '') AS enc_hyp,
         ref_sub,
         substr(array_to_string(hyp_toks, ' '), 1, 500) AS hyp_sub
  FROM h)
SELECT doc_id, n_ref_words, n_hyp_words,
       CAST(levenshtein(enc_ref, enc_hyp) AS BIGINT) AS wer_dist,
       floor(levenshtein(enc_ref, enc_hyp)::DOUBLE / n_ref_words::DOUBLE
             * 1000000 + 0.5) / 1000000.0 AS wer,
       floor(levenshtein(ref_sub, hyp_sub)::DOUBLE / length(ref_sub)::DOUBLE
             * 1000000 + 0.5) / 1000000.0 AS cer
FROM e
WHERE n_ref_words >= 1 AND length(ref_sub) >= 1
""",
)
def llm_wer_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WER/CER EVALUATION — the metric layer an ASR/OCR-sourced
    training-data pipeline runs to score transcription quality before
    admitting text. The hypothesis is a deterministic corruption of
    the reference (drop every 7th word, 'the'→'teh'), mirrored on
    both engines, so the gate verifies the METRIC implementation.
    WER: word-level Levenshtein computed by compressing each word to
    one of 26 symbols (chr(97 + (7·len + ascii-of-first-char) % 26))
    and running the engines' native character Levenshtein on the
    encoded strings — a true word-alignment distance up to encoding
    collisions (~1/26 per differing word pair, an UNDERCOUNT; the
    encoding is identical on both engines so the gate is exact even
    where the metric is approximate — documented like the
    transcendental residuals). CER: character Levenshtein on the
    first 500 chars (capped: Levenshtein is O(len²) per row, so a
    100 TB eval bounds the window; the cap is part of the metric's
    definition here, both engines).

    100 TB shape: entirely row-local (split, HOF transforms, two
    levenshteins) — no shuffle, no Python; the scan prunes to
    (doc_id, text). Empty/whitespace-only documents are FILTERED on
    both engines (n_ref_words >= 1 AND length(ref_sub) >= 1) — an
    unscoreable transcription has no WER, and under Spark-4 default
    ANSI mode an unguarded /0 would throw mid-job rather than NULL
    (r9 ADVICE)."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.filter(TX.tokens("text"), lambda w: F.length(w) >= 1).alias("ref_toks"),
        F.substring(F.trim(F.col("text")), 1, 500).alias("ref_sub"),
    )
    h = t.select(
        "doc_id",
        "ref_toks",
        "ref_sub",
        F.transform(
            F.filter(F.col("ref_toks"), lambda w, i: (i % 7) != 3),
            lambda w: F.when(w == "the", F.lit("teh")).otherwise(w),
        ).alias("hyp_toks"),
    )
    enc = "w -> char(97 + (length(w) * 7 + ascii(w)) % 26)"
    e = h.select(
        "doc_id",
        F.size("ref_toks").cast("long").alias("n_ref_words"),
        F.size("hyp_toks").cast("long").alias("n_hyp_words"),
        F.array_join(F.expr(f"transform(ref_toks, {enc})"), "").alias("enc_ref"),
        F.array_join(F.expr(f"transform(hyp_toks, {enc})"), "").alias("enc_hyp"),
        "ref_sub",
        F.substring(F.array_join("hyp_toks", " "), 1, 500).alias("hyp_sub"),
    )
    return e.where(
        (F.col("n_ref_words") >= 1) & (F.length("ref_sub") >= 1)
    ).select(
        "doc_id",
        "n_ref_words",
        "n_hyp_words",
        F.levenshtein("enc_ref", "enc_hyp").cast("long").alias("wer_dist"),
        fround(
            F.levenshtein("enc_ref", "enc_hyp").cast("double")
            / F.col("n_ref_words").cast("double"),
            6,
        ).alias("wer"),
        fround(
            F.levenshtein("ref_sub", "hyp_sub").cast("double")
            / F.length("ref_sub").cast("double"),
            6,
        ).alias("cer"),
    )


@register(
    "llm_bpe_tokenize_arrow",
    tags=("llm", "text", "tokenizer", "bpe", "arrow"),
    oracle=_REGISTRY["llm_bpe_tokenize"].oracle,
)
def llm_bpe_tokenize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED BPE table applied through the ARROW iterator at
    CORPUS scale — the production shape when the tokenizer is a Python
    library: train the merge table distributed (functions/text.
    bpe_train — the same 3×8 batched generations as llm_bpe_tokenize),
    ship the 24-rule list into a mapInPandas closure, and tokenize
    each document batch-columnar with a per-batch UNIQUE-WORD cache
    (tokenize each distinct word once via the vectorized pandas
    replace chain, then map — the word-level memoization every real
    BPE implementation does). Gated against the IDENTICAL DuckDB
    oracle as llm_bpe_tokenize, so the JVM replace-chain path and the
    Arrow path are both hash-pinned to the same retrained-in-SQL
    truth — the strongest form of the swap-in guarantee.

    100 TB shape: training cost is vocabulary-sized (shared kernel);
    apply is embarrassingly parallel — no join at all (unlike the JVM
    path's word join): one narrow Arrow projection per partition
    after an explicit repartition off the single-row-group fixture
    files, with the merge table as a 24-element closure constant."""
    import pandas as pd  # noqa: F401

    from ...functions.text import bpe_apply_merges_pandas, bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(TX.tokens("text")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    _state, merges = bpe_train(bpe_spaced_state(words))

    def tok(batches):
        import hashlib

        import pandas as pd

        cache: dict[str, str] = {}

        def word_lists(texts: pd.Series) -> pd.Series:
            # Java \s spelled out ([ \t\n\x0B\f\r] — ASCII-only, unlike
            # Python's Unicode \s), same divergence class as the
            # llm_udf_tokenize_arrow r8 ADVICE fix; empty edge tokens
            # from leading/trailing whitespace are filtered below on
            # all three paths (JVM, Arrow, oracle)
            return texts.str.lower().str.split(r"[ \t\n\x0b\f\r]+", regex=True)

        for pdf in batches:
            wls = word_lists(pdf["text"])
            # batch-level unique-word memoization: tokenize each new
            # distinct word ONCE through the vectorized replace chain
            fresh = sorted(
                {w for ws in wls for w in ws if w and w not in cache}
            )
            if fresh:
                s = pd.Series(fresh)
                cache.update(zip(fresh, bpe_apply_merges_pandas(s, merges)))
            n_words, n_tokens, n_merged, digests = [], [], [], []
            for ws in wls:
                ws = [w for w in ws if w]
                toks = [cache[w] for w in ws]
                n_words.append(len(ws))
                n_tokens.append(sum(t.count(" ") + 1 for t in toks))
                n_merged.append(
                    sum(1 for t in toks for p in t.split(" ") if len(p) > 1)
                )
                digests.append(hashlib.md5("|".join(toks).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "n_merged_tokens": pd.Series(n_merged, dtype="int64"),
                    "tok_digest": digests,
                }
            )

    return d.select("doc_id", "text").repartition(32).mapInPandas(
        tok,
        "doc_id bigint, n_words bigint, n_tokens bigint, "
        "n_merged_tokens bigint, tok_digest string",
    )


@register(
    "llm_bpe_encode_ids",
    tags=("llm", "text", "tokenizer", "bpe", "arrow", "ids"),
    oracle=f"""
WITH RECURSIVE
{_BPE_VOCAB_CTE},
wt AS (
  SELECT w,
         unnest(string_split(trim(s), ' ')) AS tok,
         unnest(range(1, len(string_split(trim(s), ' ')) + 1)) AS tpos
  FROM st3),
wids AS (
  SELECT wt.w,
         string_agg(v.id::VARCHAR, ',' ORDER BY wt.tpos) AS ids_str,
         CAST(count(*) AS BIGINT) AS n_toks
  FROM wt JOIN vocab v ON v.tok = wt.tok
  GROUP BY wt.w),
per_doc AS (
  SELECT wq.doc_id,
         CAST(sum(wids.n_toks) AS BIGINT) AS n_ids,
         string_agg(wids.ids_str, ',' ORDER BY wq.pos) AS full_str
  FROM wq JOIN wids ON wids.w = wq.w
  GROUP BY wq.doc_id)
SELECT d.doc_id,
       COALESCE(p.n_ids, 0) AS n_ids,
       (SELECT CAST(count(*) AS BIGINT) FROM vocab) AS n_vocab,
       COALESCE(md5(p.full_str), md5('')) AS ids_digest,
       COALESCE(array_to_string(string_split(p.full_str, ',')[1:8], ','), '')
         AS head_ids
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""",
)
def llm_bpe_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN IDS out of the trained BPE — the artifact a trainer
    actually reads (r9 VERDICT missing #2): llm_bpe_tokenize pins the
    token STRINGS; a pretrain pipeline ships INTEGER ids against a
    frozen vocabulary. The vocabulary is enumerated deterministically
    from the trained table alone: base characters (every distinct
    character of the word-frequency table) sorted ascending get ids
    0..B-1, then each merge's output token a||b gets the next id in
    global merge-rank order, first occurrence wins on collisions —
    the standard BPE vocab layout (chars first, merges in training
    order), reproducible from the merge table with no extra state.
    Per doc: total id count, the md5 digest of the full comma-joined
    id sequence in document order (pins EVERY id), the first 8 ids as
    a comma-joined string (pins the id values themselves, not just
    the hash; a STRING because the driver canon cannot hash nested
    types — the q57 class, enforced by tests/test_oracle_schema_lint),
    and the vocab size. The DuckDB oracle retrains the same table via
    the recursive-CTE walks and re-derives the identical enumeration
    in SQL — token-id identity is verified end to end.

    100 TB shape: training and vocab are vocabulary-sized (the vocab
    dict is gens×per_gen + charset entries, a closure constant);
    encoding is the production Arrow iterator — embarrassingly
    parallel mapInPandas with per-batch unique-word memoization, no
    join, after an explicit repartition off the single-row-group
    fixture files. Same UTF-16-vs-codepoint astral-plane residual as
    the other BPE queries (ASCII fixture; documented, not hidden)."""
    import pandas as pd  # noqa: F401

    from ...functions.text import bpe_apply_merges_pandas, bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(TX.tokens("text")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    _state, merges = bpe_train(bpe_spaced_state(words))
    # charset-bounded collect: distinct characters of the vocabulary
    base = sorted(
        r.ch
        for r in words.select(
            F.explode(F.expr("filter(split(w, ''), c -> c <> '')")).alias("ch")
        )
        .distinct()
        .collect()
    )
    vocab: dict[str, int] = {ch: i for i, ch in enumerate(base)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    n_vocab = len(vocab)

    def enc(batches):
        import hashlib

        import pandas as pd

        cache: dict[str, list[int]] = {}

        for pdf in batches:
            # Java \s spelled ASCII-explicit (see llm_bpe_tokenize_arrow)
            wls = pdf["text"].str.lower().str.split(
                r"[ \t\n\x0b\f\r]+", regex=True
            )
            fresh = sorted({w for ws in wls for w in ws if w and w not in cache})
            if fresh:
                toks = bpe_apply_merges_pandas(pd.Series(fresh), merges)
                for w, t in zip(fresh, toks):
                    cache[w] = [vocab[p] for p in t.split(" ")]
            n_ids, digests, heads = [], [], []
            for ws in wls:
                ids = [i for w in ws if w for i in cache[w]]
                n_ids.append(len(ids))
                digests.append(
                    hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
                )
                heads.append(",".join(map(str, ids[:8])))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_ids": pd.Series(n_ids, dtype="int64"),
                    "n_vocab": pd.Series([n_vocab] * len(pdf), dtype="int64"),
                    "ids_digest": digests,
                    "head_ids": heads,
                }
            )

    return d.select("doc_id", "text").repartition(32).mapInPandas(
        enc,
        "doc_id bigint, n_ids bigint, n_vocab bigint, "
        "ids_digest string, head_ids string",
    )


@register(
    "llm_bpe_vocab",
    tags=("llm", "text", "tokenizer", "bpe", "vocab"),
    oracle=f"""
WITH RECURSIVE
{_BPE_VOCAB_CTE}
SELECT CAST(v.id AS BIGINT) AS id,
       v.tok AS token,
       v.id >= (SELECT count(*) FROM base) AS is_merged,
       CAST(length(v.tok) AS BIGINT) AS token_len
FROM vocab v
""",
)
def llm_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FROZEN VOCABULARY TABLE itself — the artifact a tokenizer
    ships next to the merge rules (tokenizer.json's vocab section):
    every (id, token) pair of the deterministic enumeration that
    llm_bpe_encode_ids encodes against, pinned ROW BY ROW instead of
    through a digest. Base characters (sorted) get ids 0..B-1, merge
    outputs follow in global training-rank order, first occurrence
    wins on collisions; is_merged marks the learned entries. Gated
    value-exact against the DuckDB re-derivation, so a drift anywhere
    in the enumeration (sort order, rank arithmetic, dedupe rule)
    shows as a specific wrong row, not just a changed hash.

    100 TB shape: the vocabulary is a BOUNDED artifact — charset +
    gens×per_gen entries regardless of corpus size (the training
    aggregates that produce it are probed via llm_bpe_tokenize). The
    driver assembles it from the trained merge list plus one
    charset-bounded distinct-character collect, then returns it as a
    local relation — the same sanctioned driver-state class as the
    ANN codebooks."""
    from ...functions.text import bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(TX.tokens("text")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    _state, merges = bpe_train(bpe_spaced_state(words))
    base = sorted(
        r.ch
        for r in words.select(
            F.explode(F.expr("filter(split(w, ''), c -> c <> '')")).alias("ch")
        )
        .distinct()
        .collect()
    )
    vocab: dict[str, int] = {ch: i for i, ch in enumerate(base)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    n_base = len(base)
    return spark.createDataFrame(
        [(i, tok, i >= n_base, len(tok)) for tok, i in vocab.items()],
        "id long, token string, is_merged boolean, token_len long",
    )


@register(
    "llm_tokenizer_fertility",
    tags=("llm", "text", "tokenizer", "bpe", "eval"),
    oracle=f"""
WITH RECURSIVE
{_BPE_VOCAB_CTE},
pw AS (
  SELECT w,
         CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_toks,
         CAST(len(list_filter(string_split(trim(s), ' '),
                              t -> length(t) > 1)) AS BIGINT) AS n_merged
  FROM st3),
wl AS (
  SELECT d.lang, wq.w
  FROM wq JOIN documents d USING (doc_id)),
agg AS (
  SELECT wl.lang,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(pw.n_toks) AS BIGINT) AS n_tokens,
         CAST(sum(pw.n_merged) AS BIGINT) AS n_merged_tokens,
         CAST(sum(length(wl.w)) AS BIGINT) AS n_chars
  FROM wl JOIN pw ON pw.w = wl.w
  GROUP BY wl.lang)
SELECT lang, n_words, n_tokens, n_merged_tokens,
       floor(n_tokens::DOUBLE / n_words::DOUBLE * 1000000 + 0.5)
         / 1000000.0 AS fertility,
       floor(n_chars::DOUBLE / n_tokens::DOUBLE * 1000000 + 0.5)
         / 1000000.0 AS chars_per_token
FROM agg
WHERE n_words >= 1 AND n_tokens >= 1
""",
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY per language — the standard tokenizer-
    quality evaluation a multilingual pretrain pipeline runs before
    freezing the vocab (fertility = subword tokens per word; a
    tokenizer trained on skewed data over-fragments the minority
    languages, inflating their effective sequence lengths and compute
    cost): per lang, word and token totals under the trained 3×8 BPE,
    the merged-token count (how much of the vocab the language
    actually uses), fertility, and chars-per-token (compression).
    Both ratios are 6-dp floor-quantized on both engines; the /0
    guards are mirrored WHEREs (empty langs can't divide — the ANSI
    rule from r9 ADVICE).

    100 TB shape: training is the shared vocabulary-sized kernel; the
    eval is ONE corpus-scale word explode joined to the tokenized
    word table (vocab-sized, AQE broadcasts it) and ONE ≤#langs-row
    aggregate — no new shuffle shape beyond the probed
    llm_bpe_tokenize."""
    from ...functions.text import bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    wx = d.select("lang", F.explode(TX.tokens("text")).alias("w")).where(
        F.length("w") >= 1
    )
    words = wx.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    state, _merges = bpe_train(bpe_spaced_state(words))
    pw = (
        state.select("w", F.split(F.trim("s"), " ").alias("ta"))
        .select(
            "w",
            F.size("ta").cast("long").alias("n_toks"),
            F.size(F.filter("ta", lambda t: F.length(t) > 1))
            .cast("long")
            .alias("n_merged"),
        )
    )
    agg = (
        wx.join(pw, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_merged").alias("n_merged_tokens"),
            F.sum(F.length("w")).alias("n_chars"),
        )
    )
    return agg.where((F.col("n_words") >= 1) & (F.col("n_tokens") >= 1)).select(
        "lang",
        "n_words",
        "n_tokens",
        "n_merged_tokens",
        fround(F.col("n_tokens").cast("double") / F.col("n_words").cast("double"), 6).alias(
            "fertility"
        ),
        fround(F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"), 6).alias(
            "chars_per_token"
        ),
    )


@register(
    "llm_tokenizer_heldout",
    tags=("llm", "text", "tokenizer", "bpe", "eval", "arrow"),
    oracle=f"""
WITH RECURSIVE
twx AS (SELECT unnest({_TOKS}) AS w FROM documents WHERE doc_id % 50 <> 0),
wq AS (SELECT w FROM twx WHERE length(w) >= 1),
words AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wq GROUP BY w),
st0 AS (
  SELECT w, c, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
  FROM words),
{_bpe_gen_sql('st0', 'm1', 'walk1', 'st1', 8)},
{_bpe_gen_sql('st1', 'm2', 'walk2', 'st2', 8)},
{_bpe_gen_sql('st2', 'm3', 'walk3', 'st3', 8)},
base AS (SELECT DISTINCT unnest(string_split(w, '')) AS ch FROM words),
m_all AS (
  SELECT a, b, (gen - 1) * 8 + rank AS grank FROM (
    SELECT a, b, 1 AS gen, rank FROM m1
    UNION ALL SELECT a, b, 2 AS gen, rank FROM m2
    UNION ALL SELECT a, b, 3 AS gen, rank FROM m3)),
rules AS (SELECT a, b, row_number() OVER (ORDER BY grank) AS step FROM m_all),
hwx AS (
  SELECT doc_id, unnest({_TOKS}) AS w
  FROM documents WHERE doc_id % 50 = 0),
hwq AS (SELECT doc_id, w FROM hwx WHERE length(w) >= 1),
hst0 AS (
  SELECT DISTINCT w,
         ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
  FROM hwq),
awalk(w, s, i) AS (
  SELECT w, s, 0 FROM hst0
  UNION ALL
  SELECT wk.w,
         replace(wk.s, ' ' || r.a || ' ' || r.b || ' ', ' ' || r.a || r.b || ' '),
         wk.i + 1
  FROM awalk wk JOIN rules r ON r.step = wk.i + 1),
happ AS (SELECT w, trim(s) AS ts FROM awalk
         WHERE i = (SELECT count(*) FROM rules)),
vocab_toks AS (
  SELECT ch AS tok FROM base
  UNION SELECT a || b FROM m_all),
htok AS (SELECT w, unnest(string_split(ts, ' ')) AS tok FROM happ),
hper AS (
  SELECT htok.w,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(count(CASE WHEN v.tok IS NULL THEN 1 END) AS BIGINT) AS n_oov
  FROM htok LEFT JOIN vocab_toks v USING (tok)
  GROUP BY htok.w)
SELECT hwq.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(hper.n_toks) AS BIGINT) AS n_tokens,
       CAST(sum(hper.n_oov) AS BIGINT) AS n_oov_tokens
FROM hwq JOIN hper ON hper.w = hwq.w
GROUP BY hwq.doc_id
""",
)
def llm_tokenizer_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER GENERALIZATION eval — train the BPE on a TRAIN split
    (doc_id % 50 ≠ 0) and apply it to the HELD-OUT split, the
    methodology a real tokenizer freeze requires (in-domain fertility
    on the training corpus, which llm_bpe_tokenize measures, is
    systematically optimistic): per held-out doc, word/token counts
    under the train-only merge table plus the OOV token count (tokens
    outside the train vocabulary — single characters never seen in
    training; merge outputs are in-vocab by construction). The DuckDB
    oracle retrains on the train split via the recursive walks and
    applies the 24 rules to the held-out word table through a
    rank-ordered apply walk — the exact mirror of shipping a FROZEN
    merge list to new data.

    100 TB shape: training is the vocabulary-sized shared kernel over
    the train split; apply is the production Arrow iterator over the
    held-out split with per-batch unique-word memoization (the
    llm_bpe_tokenize_arrow shape); the vocab set is a charset+merges
    closure constant."""
    import pandas as pd  # noqa: F401

    from ...functions.text import bpe_apply_merges_pandas, bpe_spaced_state, bpe_train

    d = load(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 50 != 0)
    held = d.where(F.col("doc_id") % 50 == 0)
    words = (
        train.select(F.explode(TX.tokens("text")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    _state, merges = bpe_train(bpe_spaced_state(words))
    base = {
        r.ch
        for r in words.select(
            F.explode(F.expr("filter(split(w, ''), c -> c <> '')")).alias("ch")
        )
        .distinct()
        .collect()
    }
    vocab = base | {a + b for a, b in merges}

    def ev(batches):
        import pandas as pd

        cache: dict[str, tuple[int, int]] = {}  # w -> (n_toks, n_oov)

        for pdf in batches:
            wls = pdf["text"].str.lower().str.split(
                r"[ \t\n\x0b\f\r]+", regex=True
            )
            fresh = sorted({w for ws in wls for w in ws if w and w not in cache})
            if fresh:
                toks = bpe_apply_merges_pandas(pd.Series(fresh), merges)
                for w, t in zip(fresh, toks):
                    parts = t.split(" ")
                    cache[w] = (len(parts), sum(1 for p in parts if p not in vocab))
            n_words, n_tokens, n_oov = [], [], []
            for ws in wls:
                ws = [w for w in ws if w]
                n_words.append(len(ws))
                n_tokens.append(sum(cache[w][0] for w in ws))
                n_oov.append(sum(cache[w][1] for w in ws))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "n_oov_tokens": pd.Series(n_oov, dtype="int64"),
                }
            )

    return (
        held.select("doc_id", "text")
        .repartition(32)
        .mapInPandas(
            ev,
            "doc_id bigint, n_words bigint, n_tokens bigint, n_oov_tokens bigint",
        )
        .where(F.col("n_words") >= 1)
    )


@register(
    "llm_quality_calibration",
    tags=("llm", "text", "eval", "calibration"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
q AS (
  SELECT doc_id,
         floor((0.4 * (len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','for','on')))
                      / len(toks)::DOUBLE)
               + 0.4 * (len(list_distinct(toks)) / len(toks)::DOUBLE)
               + 0.2 * least(len(toks)::DOUBLE, 100.0) / 100.0) * 10000 + 0.5) / 10000.0 AS quality
  FROM t),
b AS (
  SELECT e.label, q.quality,
         CAST(least(floor(q.quality * 10), 9) AS BIGINT) AS q_bucket
  FROM q JOIN embeddings e ON e.vec_id = q.doc_id)
SELECT CAST(label AS BIGINT) AS label, q_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT)) / 10000.0 AS quality_mass
FROM b
GROUP BY label, q_bucket
""",
)
def llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score CALIBRATION against ground-truth labels — the
    table an eval pass prints to decide whether the heuristic quality
    filter is separating classes or just cutting length: per
    (embedding label, quality decile bucket), document counts and the
    per-row-quantized quality mass (qsum pattern — summation-order-
    proof). A filter whose buckets look identical across labels adds
    no signal; one whose high buckets concentrate specific labels is
    doing real work — this is the evidence llm_quality_ablation's
    threshold choice reads. Bucketing floors the already-4-dp-
    quantized score times 10 on the BINARY double, so both engines
    agree even at decile boundaries (the repo floor standard).

    100 TB shape: one row-local quality projection, one hash join to
    the labels (vec_id aligns 1:1 with doc_id in the fixture; a real
    corpus joins its eval-label table the same way), one
    (label × ≤10)-key aggregate."""
    d = load(spark, sf_dir, "documents")
    q = d.select("doc_id", *TX.quality_columns()).select("doc_id", "quality")
    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("label").cast("long").alias("label")
    )
    b = q.join(e, "doc_id").select(
        "label",
        "quality",
        F.least(F.floor(F.col("quality") * 10), F.lit(9)).cast("long").alias("q_bucket"),
    )
    return b.groupBy("label", "q_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("bigint"))
            / F.lit(10000.0)
        ).alias("quality_mass"),
    )


@register(
    "llm_heaps_law",
    tags=("llm", "text", "stats", "vocabulary"),
    oracle=f"""
WITH m AS (SELECT max(doc_id) + 1 AS m FROM documents),
tk AS (
  SELECT least(9, doc_id * 10 // (SELECT m FROM m)) AS bucket,
         unnest({_TOKS}) AS w
  FROM documents),
tok AS (SELECT bucket, w FROM tk WHERE w <> ''),
tot AS (SELECT bucket, count(*) AS toks FROM tok GROUP BY bucket),
firstb AS (SELECT w, min(bucket) AS fb FROM tok GROUP BY w),
nv AS (SELECT fb AS bucket, count(*) AS new_types FROM firstb GROUP BY fb)
SELECT CAST(t.bucket AS BIGINT) AS bucket,
       CAST(sum(t.toks) OVER (ORDER BY t.bucket) AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(n.new_types, 0)) OVER (ORDER BY t.bucket) AS BIGINT)
         AS cum_types
FROM tot t LEFT JOIN nv n ON n.bucket = t.bucket
""",
)
def llm_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY-GROWTH CURVE (Heaps'-law audit) — cumulative token
    count vs cumulative distinct-type count at ten corpus-order
    checkpoints. The data-card statistic that tells a tokenizer team
    whether vocabulary is still growing at the corpus tail (natural
    text: V ≈ K·Nᵝ, β≈0.5; a FLAT tail is the signature of template/
    boilerplate saturation, a LINEAR tail of unfiltered noise/UUIDs).
    Checkpoints are deciles of doc_id order, derived from max(doc_id)
    rather than a global row_number — no corpus-scale global window.
    Everything is exact BIGINT counting: nothing to round, nothing
    transcendental.

    100 TB shape: one token explode feeding two map-side-combinable
    hash aggregates (per-bucket totals; min-bucket per type — the
    vocabulary-keyed shuffle shared with llm_unigram_surprise), then a
    10-row join + 10-row cumulative window OVER THE AGGREGATE (the
    two-phase prefix-sum pattern; the lint's reduced-window rule).
    The 1-row max(doc_id) aggregate is broadcast below the bucket
    projection — aggregate-below, never an sf-linear broadcast."""
    d = load(spark, sf_dir, "documents")
    m = d.agg((F.max("doc_id") + F.lit(1)).cast("long").alias("m"))
    tok = (
        d.crossJoin(F.broadcast(m))
        .select(
            F.least(F.lit(9).cast("long"), F.expr("doc_id * 10 DIV m")).alias(
                "bucket"
            ),
            F.explode(TX.tokens("text")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    tot = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("toks"))
    nv = (
        tok.groupBy("w")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tot.join(nv, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.sum("toks").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_types"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_types"),
        )
    )


@register(
    "llm_embedding_sq8",
    tags=("llm", "embeddings", "quantization", "compression"),
    oracle="""
WITH v AS (
  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS t(i)),
st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM v GROUP BY dim),
q AS (
  SELECT v.dim, v.x, st.mn, st.mx,
         CASE WHEN st.mx = st.mn THEN 0
              ELSE CAST(floor(((v.x - st.mn) / (st.mx - st.mn)) * 255.0 + 0.5)
                        AS BIGINT)
         END AS code
  FROM v JOIN st ON st.dim = v.dim),
e AS (
  SELECT dim, mn, mx,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(abs(x - (mn + (code * (mx - mn)) / 255.0))
                             * 1000000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS err_nano
  FROM q GROUP BY dim, mn, mx)
SELECT CAST(dim AS BIGINT) AS dim, mn, mx, n, err_nano FROM e
""",
)
def llm_embedding_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR (int8) EMBEDDING QUANTIZATION — the per-dimension
    min/max affine codec every production vector store offers as its
    cheapest 4× compression (SQ8), with an exact reconstruction-error
    ledger per dimension. Complements the trained-codebook PQ path
    (llm_ann_pq): SQ8 needs no training loop, just one stats pass, so
    it is the first compression a 100 TB embedding corpus gets.

    Engine-exactness: min/max are order-independent; the affine code
    floor(((x−mn)/span)·255 + 0.5) and the dequantized error are the
    SAME IEEE double expression on both engines (float32 inputs widen
    exactly), and the error is quantized per-row to nano-unit BIGINTs
    BEFORE summation (repo money rule), so aggregation order cannot
    matter. The span=0 constant-dimension case is CASE-guarded on
    both sides — ANSI mode never sees the zero division (repo ANSI /0
    rule).

    100 TB shape: posexplode to (dim, x) — a 64× row fan-out but a
    3-column projection — into ONE map-side-combinable 64-row
    min/max aggregate; the stats join back is a 64-row build side
    (aggregate-below, AQE broadcasts it at runtime — never hinted);
    then one 64-group hash aggregate. No corpus-keyed shuffle at all:
    both aggregates key on the dimension."""
    e = load(spark, sf_dir, "embeddings")
    v = (
        e.select(F.posexplode("embedding").alias("p", "xr"))
        .select(
            (F.col("p") + 1).cast("long").alias("dim"),
            F.col("xr").cast("double").alias("x"),
        )
    )
    st = v.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    q = v.join(st, "dim").withColumn(
        "code",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
            F.floor(
                ((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                * F.lit(255.0)
                + F.lit(0.5)
            ).cast("long")
        ),
    )
    err = F.abs(
        F.col("x")
        - (F.col("mn") + (F.col("code") * (F.col("mx") - F.col("mn"))) / F.lit(255.0))
    )
    return (
        q.groupBy("dim", "mn", "mx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(err * F.lit(1000000000.0) + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("err_nano"),
        )
        .select("dim", "mn", "mx", "n", "err_nano")
    )


@register(
    "llm_stupid_backoff",
    tags=("llm", "text", "lm", "backoff", "eval"),
    oracle=f"""
WITH tt AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
train AS (SELECT * FROM tt WHERE doc_id % 5 <> 0),
test AS (SELECT * FROM tt WHERE doc_id % 5 = 0 AND len(ts) >= 3),
tr3 AS (
  SELECT unnest(ts[1:len(ts)-2]) AS a, unnest(ts[2:len(ts)-1]) AS b,
         unnest(ts[3:len(ts)]) AS c
  FROM train WHERE len(ts) >= 3),
c3 AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS c3 FROM tr3 GROUP BY 1,2,3),
bi AS (
  SELECT unnest(ts[1:len(ts)-1]) AS a, unnest(ts[2:len(ts)]) AS b
  FROM train WHERE len(ts) >= 2),
c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1,2),
un AS (SELECT unnest(ts) AS w FROM train),
c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM un GROUP BY w),
nn AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM c1),
pos AS (
  SELECT doc_id, unnest(ts[1:len(ts)-2]) AS a, unnest(ts[2:len(ts)-1]) AS b,
         unnest(ts[3:len(ts)]) AS c
  FROM test),
sc AS (
  SELECT p.doc_id,
    CASE
      WHEN t3.c3 IS NOT NULL THEN CAST(t3.c3 AS DOUBLE) / ctx.c2
      WHEN b2.c2 IS NOT NULL
        THEN CAST(0.4 AS DOUBLE) * (CAST(b2.c2 AS DOUBLE) / u1.c1)
      WHEN u0.c1 IS NOT NULL
        THEN CAST(0.4 AS DOUBLE)
             * (CAST(0.4 AS DOUBLE)
                * (CAST(u0.c1 AS DOUBLE) / (SELECT n FROM nn)))
      ELSE CAST(0.4 AS DOUBLE)
           * (CAST(0.4 AS DOUBLE)
              * (CAST(1 AS DOUBLE) / (SELECT n FROM nn)))
    END AS s,
    CASE WHEN t3.c3 IS NOT NULL THEN 3
         WHEN b2.c2 IS NOT NULL THEN 2 ELSE 1 END AS lvl
  FROM pos p
  LEFT JOIN c3 t3 ON t3.a = p.a AND t3.b = p.b AND t3.c = p.c
  LEFT JOIN c2 ctx ON ctx.a = p.a AND ctx.b = p.b
  LEFT JOIN c2 b2 ON b2.a = p.b AND b2.b = p.c
  LEFT JOIN c1 u1 ON u1.w = p.b
  LEFT JOIN c1 u0 ON u0.w = p.c)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_pos,
       CAST(sum(CAST(floor(s * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS score_micro_sum,
       CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
       CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
       CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni
FROM sc GROUP BY doc_id
""",
)
def llm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STUPID-BACKOFF n-GRAM LM SCORING (Brants et al. 2007 — the LM
    Google built precisely because it's the one that scales to
    web-corpus counts with NO normalization pass): a trigram model is
    counted on the 80 % train split and every held-out document
    (doc_id % 5 == 0) is scored position-by-position — c₃/c₂ when the
    trigram was seen, else 0.4·(c₂/c₁), else 0.4²·(c₁/N), with an OOV
    floor of 0.4²·(1/N). This is the perplexity-proxy quality filter
    of CCNet/KenLM pipelines, expressed in pure count ratios — NO
    log/exp anywhere, so unlike the naive-bayes/LR scorers there is
    no transcendental residual: every score is a division of exact
    BIGINTs (IEEE-identical on both engines), every backoff constant
    is explicitly CAST(0.4 AS DOUBLE) with pinned association (a bare
    DuckDB `0.4 * 0.4` would be exact DECIMAL arithmetic and diverge
    from Spark's double 0.16000000000000003), and per-position scores
    are quantized to micro-BIGINTs BEFORE the per-doc sum (repo money
    rule — summation order can't matter). The per-doc backoff-level
    histogram (n_tri/n_bi/n_uni) pins the join logic in exact
    integers independently of the arithmetic.

    100 TB shape: three map-side-combinable count aggregates (n-gram
    vocabularies — sublinear in corpus size), then the held-out
    positions LEFT-JOIN the count tables on n-gram keys: the same
    vocabulary-keyed shuffle family as the probed llm_bigram_lm, five
    joins instead of two. The 1-row N total is an aggregate-below
    broadcast. Nothing corpus-keyed except the final per-doc
    aggregate."""
    d = load(spark, sf_dir, "documents")
    tt = d.select("doc_id", TX.tokens("text").alias("ts"))
    train = tt.where(F.col("doc_id") % 5 != 0)
    test = tt.where((F.col("doc_id") % 5 == 0) & (F.size("ts") >= 3))

    def tri(df: DataFrame) -> DataFrame:
        return (
            df.where(F.size("ts") >= 3)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ts) - 2), "
                        "i -> struct(ts[i-1] AS a, ts[i] AS b, ts[i+1] AS c))"
                    )
                ).alias("p"),
            )
            .select("doc_id", "p.*")
        )

    c3 = tri(train).groupBy("a", "b", "c").agg(F.count(F.lit(1)).alias("c3"))
    # NOTE (r13-opt, measured NEGATIVE result): c2 feeds two joins and
    # c1 three consumers (7 corpus tokenize passes total), so
    # checkpointing the vocabulary-sized count tables looks like the
    # batch-3 unigram/bigram-LM win — but it LOST wall time decisively
    # here (1.36 -> 2.70 s at sf0.1, idle host, eager and lazy both):
    # the five model joins are AQE-broadcast, so the duplicated count
    # branches run shuffle-free and IN PARALLEL on idle cores, while a
    # checkpointed c1/c2 joins as an unsized LogicalRDD and the
    # materialization serializes the DAG. Kept the parallel-duplicate
    # plan deliberately (the same adjudication as the batch-3 negative
    # result on the c2 count-window rewrite).
    c2 = (
        train.where(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1), "
                    "i -> struct(ts[i-1] AS a, ts[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    c1 = (
        train.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    nn = c1.agg(F.sum("c1").alias("n"))

    pos = tri(test)
    j = (
        pos.join(
            c3.select(
                F.col("a").alias("t3a"), F.col("b").alias("t3b"),
                F.col("c").alias("t3c"), "c3",
            ),
            (F.col("a") == F.col("t3a"))
            & (F.col("b") == F.col("t3b"))
            & (F.col("c") == F.col("t3c")),
            "left",
        )
        .join(
            c2.select(
                F.col("a").alias("cxa"), F.col("b").alias("cxb"),
                F.col("c2").alias("ctx_c2"),
            ),
            (F.col("a") == F.col("cxa")) & (F.col("b") == F.col("cxb")),
            "left",
        )
        .join(
            c2.select(
                F.col("a").alias("b2a"), F.col("b").alias("b2b"),
                F.col("c2").alias("b2_c2"),
            ),
            (F.col("b") == F.col("b2a")) & (F.col("c") == F.col("b2b")),
            "left",
        )
        .join(
            c1.select(F.col("w").alias("u1w"), F.col("c1").alias("u1_c1")),
            F.col("b") == F.col("u1w"),
            "left",
        )
        .join(
            c1.select(F.col("w").alias("u0w"), F.col("c1").alias("u0_c1")),
            F.col("c") == F.col("u0w"),
            "left",
        )
        .crossJoin(F.broadcast(nn))
    )
    alpha = F.lit(0.4)
    s = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("ctx_c2"))
        .when(
            F.col("b2_c2").isNotNull(),
            alpha * (F.col("b2_c2").cast("double") / F.col("u1_c1")),
        )
        .when(
            F.col("u0_c1").isNotNull(),
            alpha * (alpha * (F.col("u0_c1").cast("double") / F.col("n"))),
        )
        .otherwise(alpha * (alpha * (F.lit(1.0) / F.col("n"))))
    )
    lvl = (
        F.when(F.col("c3").isNotNull(), F.lit(3))
        .when(F.col("b2_c2").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        j.select("doc_id", s.alias("s"), lvl.alias("lvl"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(F.floor(F.col("s") * F.lit(1000000.0) + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("score_micro_sum"),
            F.sum(F.when(F.col("lvl") == 3, 1).otherwise(0)).cast("long").alias("n_tri"),
            F.sum(F.when(F.col("lvl") == 2, 1).otherwise(0)).cast("long").alias("n_bi"),
            F.sum(F.when(F.col("lvl") == 1, 1).otherwise(0)).cast("long").alias("n_uni"),
        )
    )


@register(
    "llm_perplexity_buckets",
    tags=("llm", "text", "quality", "lm", "ccnet"),
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bgs AS (
  SELECT doc_id,
         unnest([struct_pack(u := t[i], v := t[i+1])
                 for i in generate_series(1, len(t) - 1)]) AS bg
  FROM t WHERE len(t) >= 2),
b AS (SELECT doc_id, bg.u AS u, bg.v AS v FROM bgs),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM t) GROUP BY w),
tot AS (SELECT sum(c)::DOUBLE AS tot FROM uni),
c2 AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c2 FROM b GROUP BY u, v),
scored AS (
  SELECT b.doc_id,
         CAST(floor(
           -log2(0.9 * (c2.c2 / cu.c::DOUBLE) + 0.1 * (cv.c / tot.tot))
           * 1000000000.0 + 0.5) AS BIGINT) AS nlog
  FROM b
  JOIN c2 USING (u, v)
  JOIN uni cu ON cu.w = b.u
  JOIN uni cv ON cv.w = b.v
  CROSS JOIN tot),
perdoc AS (
  SELECT d.lang, s.doc_id,
         CAST(floor(sum(s.nlog) / CAST(count(*) AS DOUBLE) / 100000.0 + 0.5)
              AS BIGINT) AS score_e4
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
  GROUP BY d.lang, s.doc_id),
hist AS (SELECT lang, score_e4, CAST(count(*) AS BIGINT) AS c
         FROM perdoc GROUP BY lang, score_e4),
cum AS (
  SELECT lang, score_e4, c,
         sum(c) OVER (PARTITION BY lang ORDER BY score_e4) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM hist),
th AS (
  SELECT lang,
         min(CASE WHEN cum * 3 >= n THEN score_e4 END) AS t1,
         min(CASE WHEN cum * 3 >= 2 * n THEN score_e4 END) AS t2
  FROM cum GROUP BY lang)
SELECT p.lang,
       CASE WHEN p.score_e4 <= th.t1 THEN 'head'
            WHEN p.score_e4 <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.score_e4) AS BIGINT) AS sum_score_e4,
       CAST(min(p.score_e4) AS BIGINT) AS min_score_e4,
       CAST(max(p.score_e4) AS BIGINT) AS max_score_e4
FROM perdoc p JOIN th USING (lang)
GROUP BY p.lang, bucket
""",
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet PERPLEXITY BUCKETING (Wenzek et al. 2020 §4.3) — the
    quality-tiering stage CCNet runs after dedup: score every document
    with the language's LM (here the corpus bigram-LM surprise from
    llm_bigram_lm, bits-per-bigram), then split each language into
    HEAD / MIDDLE / TAIL thirds by perplexity — head feeds the model,
    tail gets dropped, middle is kept for ablations. This is the
    PER-LANGUAGE face of the banding that llm_surprise_buckets applies
    globally with a unigram score: CCNet trains one LM per language
    and cuts within each language (so "easy" languages don't absorb
    the whole head), and the order-aware bigram score resists the
    word-salad inflation the unigram filter misses. Thresholds are
    VALUE cuts selected from the quantized score histogram (smallest
    score whose cumulative count reaches 1/3 and 2/3 of the language),
    so tied documents always land in the same bucket — deterministic
    without any per-doc rank. Emits the per-(lang, bucket) ledger:
    doc count and exact sum/min/max of the e4-quantized scores (the
    sum pins every member's score, not just the counts).

    Cross-engine note: the per-bigram score is the nano-quantized
    BIGINT from llm_bigram_lm (same 1-ulp log2 residual class,
    documented there); the bucketing itself is exact integer
    arithmetic on the quantized values.

    100 TB shape: scoring is the llm_bigram_lm kernel (vocabulary-
    keyed joins, no window); the cumulative threshold pass runs over
    the (lang, score_e4) HISTOGRAM — value-domain-bounded, the q101
    exact-selection pattern, never a corpus-scale rank; docs then
    bucket via an equi-join against the |langs|-row threshold table
    (AQE broadcasts it at runtime)."""
    d = load(spark, sf_dir, "documents")
    scored = TX.bigram_surprise(d)
    # perdoc feeds BOTH the histogram/threshold pass and the final
    # bucket join; materialize once or the whole bigram-LM kernel runs
    # twice (README finding #8; cascade stage-manifest pattern). No
    # broadcast hint — joins stay AQE-sized (1.61 -> 1.49 s at sf0.1).
    perdoc = (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "lang",
            "doc_id",
            F.floor(F.col("bits_per_bigram") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("score_e4"),
        )
        .localCheckpoint()
    )
    hist = perdoc.groupBy("lang", "score_e4").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("score_e4")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_n = Window.partitionBy("lang")
    cum = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_n)
    )
    th = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("score_e4"))).alias("t1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("score_e4"))
        ).alias("t2"),
    )
    return (
        perdoc.join(th, "lang")
        .select(
            "lang",
            F.when(F.col("score_e4") <= F.col("t1"), F.lit("head"))
            .when(F.col("score_e4") <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
            "score_e4",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("score_e4").cast("long").alias("sum_score_e4"),
            F.min("score_e4").cast("long").alias("min_score_e4"),
            F.max("score_e4").cast("long").alias("max_score_e4"),
        )
    )
