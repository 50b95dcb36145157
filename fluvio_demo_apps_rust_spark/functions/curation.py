"""Corpus-curation operators for training-data pipelines: benchmark
contamination detection, deterministic stratified sampling, and PII-style
text scrubbing.

These extend the reference's query surface with the operations a
large-scale pretraining-data pipeline runs alongside dedup/quality
(SURVEY §2 extension family). Every kernel is pinned to a portable
formula so the DuckDB oracle computes the identical value.

Scale posture:
- Contamination is the canonical decontamination join: explode corpus
  shingles once, semi-probe the (small) distinct benchmark shingle set
  via broadcast — map-side at any corpus size; falls back to a
  shingle-keyed equi-join shuffle if the benchmark outgrows broadcast.
- Stratified sampling is a pure row-local filter on a deterministic
  md5-uniform — no shuffle, reproducible across engines and runs
  (unlike ``df.sample`` whose seed is partition-layout-dependent).
- Scrubbing is a row-local regexp projection inside codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .dedup import _spread, md5_int60, word_shingles

SAMPLE_BUCKETS = 1_000_000



def fround(col, scale):
    """Binary-deterministic fractional round (floor(x*10^n+0.5)/10^n):
    identical on Spark/DuckDB/numpy for identical doubles, no -0.0 for
    tiny negatives rounding to zero. See plans/base.py:fround."""
    col = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)

def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap stats: how many of the document's
    distinct word n-gram shingles appear in ANY benchmark document.

    Returns (id, n_shingles, n_contaminated, contamination) — documents
    with fewer than ``n`` tokens carry no shingles and drop out (same
    as the oracle's unnest of an empty list).

    The benchmark side reduces to its DISTINCT shingle set first (eval
    benchmarks are tiny relative to a pretraining corpus), so the probe
    is a broadcast left join carrying one boolean — the corpus-side
    explode never shuffles.
    """
    bsh = benchmark.select(
        F.explode(word_shingles(text_col, n=n)).alias("sh")
    ).distinct()
    csh = _spread(corpus, id_col).select(
        F.col(id_col), F.explode(word_shingles(text_col, n=n)).alias("sh")
    )
    hit = csh.join(
        F.broadcast(bsh.withColumn("_hit", F.lit(1))), "sh", "left"
    )
    return hit.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        fround(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6).alias("contamination"),
    )


def sample_uniform(id_col: str | Column = "doc_id") -> Column:
    """Deterministic uniform bucket in [0, SAMPLE_BUCKETS) from the md5
    of the row id — reproducible across engines (DuckDB mirror:
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT %
    1000000``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_int60(c.cast("string")) % SAMPLE_BUCKETS


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff its deterministic uniform falls under its
    stratum's rate — hash-based stratified subsampling (the standard
    way to rebalance a corpus by language/source without a shuffle or
    a seed-fragile ``sample``). Row-local filter; rates are exact in
    expectation and reproducible everywhere."""
    rate = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(float(v)))
            for k, v in rates.items()
        ],
        F.lit(float(default_rate)),
    )
    threshold = (rate * SAMPLE_BUCKETS).cast("long")
    return df.filter(sample_uniform(id_col) < threshold)


NUMBER_RE = "[0-9]+"


def scrub_numbers(col: str | Column = "text") -> list[Column]:
    """PII-style scrubbing columns: digit-run count and the md5 of the
    text with every digit run replaced by the ``<NUM>`` placeholder
    (the reversible-audit shape: counts + content hash, payload never
    collected). Row-local regexp projections."""
    c = F.col(col) if isinstance(col, str) else col
    n_numbers = F.size(F.regexp_extract_all(c, F.lit(NUMBER_RE), 0))
    redacted = F.regexp_replace(c, NUMBER_RE, "<NUM>")
    return [
        n_numbers.alias("n_numbers"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_hash"),
    ]


def sequence_pack(
    df: DataFrame,
    id_col: str = "doc_id",
    budget: int = 2048,
    range_size: int = 4096,
) -> DataFrame:
    """Concat-then-chunk sample packing: documents are concatenated in
    ``id_col`` order and split into fixed ``budget``-token context
    windows — each doc gets its global token ``start_offset``, its
    ``pack_id`` (the window its first token lands in), and a
    ``crosses`` flag (doc straddles a window boundary). This is the
    standard pretraining packing layout (GPT-style concat+chunk).

    Scale posture: the global prefix sum is computed in TWO phases so
    no window ever sees the whole corpus in one partition — (1) docs
    are range-bucketed by ``floor(id / range_size)``; per-range token
    totals (#docs / range_size rows) get their exclusive running sum
    on a driver-small stream; (2) the per-range offsets broadcast-join
    back and an intra-range window (partitioned by range, so fully
    parallel) adds the within-range exclusive cumsum. Identical output
    to a single global-order window at any size.
    """
    from pyspark.sql import Window

    from .text import ws_token_count

    base = df.select(
        F.col(id_col),
        ws_token_count().cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / range_size).alias("rk"),
    )
    range_tot = base.groupBy("rk").agg(F.sum("n_tokens").alias("rtot"))
    w_ranges = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, -1)
    range_off = range_tot.select(
        "rk", F.coalesce(F.sum("rtot").over(w_ranges), F.lit(0)).alias("roff")
    )
    w_intra = (
        Window.partitionBy("rk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.col("roff") + F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
    ).alias("start_offset")
    packed = base.join(F.broadcast(range_off), "rk").select(
        id_col, "n_tokens", start
    )
    pack_id = F.floor(F.col("start_offset") / budget)
    last_pack = F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget)
    return packed.select(
        id_col,
        "n_tokens",
        "start_offset",
        pack_id.alias("pack_id"),
        (last_pack != pack_id).alias("crosses"),
    )


def domain_mixture(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain mixture statistics + uniform-target resampling weights:
    for each stratum (source/domain), its document and token counts, its
    token share of the corpus, and the importance weight that would
    rebalance sampling to a uniform target mixture
    (``weight = (1/k) / share`` — domains over-represented in tokens get
    weight < 1, under-represented ones > 1). Feeding the weights into
    :func:`stratified_sample` rates is the standard domain-rebalancing
    step of a pretraining mixture.

    Scale posture: one map-side-partial aggregate keyed by the stratum
    (k rows out), then a broadcast of the one-row corpus totals — no
    second scan, no shuffle beyond the k-key aggregate."""
    from .text import ws_token_count

    per = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count(text_col).cast("long")).alias("n_tokens"),
    )
    totals = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count(F.lit(1)).alias("k"),
    )
    with_tot = per.crossJoin(F.broadcast(totals))
    share = F.col("n_tokens") / F.col("tot_tokens")
    return with_tot.select(
        strata_col,
        "n_docs",
        "n_tokens",
        fround(share, 6).alias("token_share"),
        fround((F.lit(1.0) / F.col("k")) / share, 6).alias("uniform_weight"),
    )


def incremental_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Incremental (snapshot) dedup: treat the lower half of the id
    space as the already-ingested corpus snapshot and keep only the NEW
    documents whose content hash does not appear in the snapshot — the
    anti-join every periodically-refreshed corpus runs instead of
    re-deduplicating from scratch.

    Scale posture: one hash anti-join shuffled on the content hash
    (AQE broadcasts the snapshot side when it is small; at 100 TB both
    sides shuffle on the hash key — linear, never all-pairs). The
    split threshold is computed distributively (a one-row aggregate
    broadcast into the scan filters)."""
    hashed = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    thr = df.agg(F.floor(F.max(id_col) / 2).cast("long").alias("thr"))
    with_thr = hashed.crossJoin(F.broadcast(thr))
    snapshot = with_thr.filter(F.col(id_col) <= F.col("thr")).select("content_hash")
    fresh = with_thr.filter(F.col(id_col) > F.col("thr")).select(
        id_col, "content_hash"
    )
    return fresh.join(snapshot, "content_hash", "left_anti").select(
        id_col, "content_hash"
    )
