"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in ``pyspark.sql.functions`` / SQL lambda
expressions — no Python UDFs in the hot path): tokenization, token
counting (whitespace + BPE-ish regex), quality scoring, n-gram
language ID, and document fingerprinting. Every kernel is pinned to a
portable formula so the DuckDB oracle can compute the identical value.

Scale posture: pure row-local projections — no shuffle, fully
pipelined inside whole-stage codegen, trivially parallel at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic (deterministic, mirrored in oracle SQL).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "und", "die", "das", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "por"),
    "zh": ("de5", "shi4", "bu4", "le5", "wo3"),
}

STOPWORDS = LANG_MARKERS["en"] + ("in", "is", "it", "for", "on")



def fround(col, scale):
    """Binary-deterministic fractional round (floor(x*10^n+0.5)/10^n):
    identical on Spark/DuckDB/numpy for identical doubles, no -0.0 for
    tiny negatives rounding to zero. See plans/base.py:fround."""
    col = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)

def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens of the lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def ws_token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def quality_columns(col: str | Column = "text") -> list[Column]:
    """n_tokens, distinct_ratio, stop_ratio, avg_word_len, quality —
    the pinned quality-score formula:
    ``0.4*stop_ratio + 0.4*distinct_ratio + 0.2*min(n_tokens,100)/100``.
    """
    toks = tokens(col)
    n = F.size(toks).cast("double")
    distinct_ratio = fround(F.size(F.array_distinct(toks)) / n, 4)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stops = F.expr(
        f"size(filter(split(lower(trim(text)), '\\\\s+'), t -> t in ({stop_list})))"
    )
    stop_ratio = fround(stops / n, 4)
    total_len = F.expr(
        "aggregate(split(lower(trim(text)), '\\\\s+'), 0L, (acc, t) -> acc + length(t))"
    )
    avg_word_len = fround(total_len / n, 4)
    quality = fround(
        0.4 * (stops / n)
        + 0.4 * (F.size(F.array_distinct(toks)) / n)
        + 0.2 * F.least(n, F.lit(100.0)) / 100.0,
        4)
    return [
        F.size(toks).alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stop_ratio"),
        avg_word_len.alias("avg_word_len"),
        quality.alias("quality"),
    ]


def langid_columns(col: str | Column = "text") -> list[Column]:
    """Per-language marker hit counts + argmax prediction (fixed
    precedence en > de > fr > es > zh on ties)."""
    hits = {}
    for lang, words in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hits[lang] = F.expr(
            f"size(filter(split(lower(trim(text)), '\\\\s+'), t -> t in ({lst})))"
        )
    en, de, fr, es, zh = (hits[x] for x in ("en", "de", "fr", "es", "zh"))
    pred = (
        F.when(en >= F.greatest(de, fr, es, zh), "en")
        .when(de >= F.greatest(fr, es, zh), "de")
        .when(fr >= F.greatest(es, zh), "fr")
        .when(es >= zh, "es")
        .otherwise("zh")
    )
    return [
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        es.alias("es_hits"),
        zh.alias("zh_hits"),
        pred.alias("pred_lang"),
    ]


def word_ngrams(col_name: str = "text", n: int = 2) -> Column:
    """NON-distinct word n-grams of the lowercased text (order kept,
    duplicates kept — the repetition metrics need multiplicity; the
    dedup shingles in functions/dedup.py use the distinct variant).

    The token split is LET-bound via a single-element transform so the
    inner lambda indexes a bound array: higher-order lambdas evaluate
    interpreted WITHOUT common-subexpression elimination, so inlining
    the split into ``t[i + k]`` would re-split the document once per
    element per reference — O(tokens²) per doc."""
    toks = f"split(lower(trim({col_name})), '\\\\s+')"
    parts = ", ".join(f"t[i + {k}]" for k in range(n))
    return F.expr(
        f"transform(array({toks}), t -> "
        f"CASE WHEN size(t) < {n} THEN cast(array() AS array<string>) "
        f"ELSE transform(sequence(0, size(t) - {n}), "
        f"i -> concat_ws(' ', {parts})) END)[0]"
    )


def repetition_columns(col_name: str = "text") -> list[Column]:
    """Within-document repetition metrics (Gopher-style quality rules):
    the fraction of word 2-grams / 3-grams that are duplicates of an
    earlier occurrence in the same document. High values flag the
    boilerplate/keyword-stuffing documents a pretraining pipeline
    drops. Row-local (no shuffle); the ``repetitive`` flag pins the
    pipeline's drop rule at dup3_frac >= 0.1."""

    def dup_frac(arr: Column) -> Column:
        # LET-binding: the ngram array is evaluated ONCE and bound to
        # the lambda variable; referencing the raw expression directly
        # would inline it into every use (size ×2, array_distinct,
        # condition), which pushed the projection out of codegen —
        # measured 80 s vs 0.5 s at sf0.1.
        return F.element_at(
            F.transform(
                F.array(arr),
                lambda a: F.when(F.size(a) == 0, F.lit(0.0)).otherwise(
                    fround(
                        (F.size(a) - F.size(F.array_distinct(a)))
                        / F.size(a).cast("double"),
                        4)
                ),
            ),
            1,
        )

    d2 = dup_frac(word_ngrams(col_name, 2))
    d3 = dup_frac(word_ngrams(col_name, 3))
    return [
        d2.alias("dup2_frac"),
        d3.alias("dup3_frac"),
        (d3 >= 0.1).alias("repetitive"),
    ]


# Gopher-rule marker stopwords: a document must contain at least two of
# these to pass (the "contains common English function words" rule).
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_columns(col_name: str = "text") -> list[Column]:
    """Gopher-style document-quality gate (Rae et al. 2021, §A1.1):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (# and ellipsis), bullet-line and ellipsis-line fractions, and a
    minimum count of distinct common function words. Every metric is
    pinned to a portable formula (the DuckDB oracle mirrors each one);
    ``passes`` is the conjunction used as the pipeline drop rule.

    Row-local projections (no shuffle, whole-stage codegen); the token
    split and the line split are each LET-bound via a single-element
    transform so no higher-order lambda re-evaluates them per element.
    """
    toks = f"split(lower(trim({col_name})), '\\\\s+')"
    lines = f"split({col_name}, '\\n')"
    n_words = F.expr(f"size({toks})")
    mean_wl = fround(
        F.expr(f"aggregate({toks}, 0L, (acc, t) -> acc + length(t))")
        / n_words.cast("double"),
        4)
    # substring-occurrence counts via the replace trick (identical
    # leftmost-non-overlapping semantics in Spark and DuckDB)
    n_hash = F.length(col_name) - F.length(F.regexp_replace(col_name, "#", ""))
    n_ell = (
        F.length(col_name) - F.length(F.regexp_replace(col_name, r"\.\.\.", ""))
    ) / 3
    symbol_ratio = fround((n_hash + n_ell) / n_words.cast("double"), 4)
    bullet_frac = fround(
        F.expr(
            f"size(filter({lines}, l -> startswith(ltrim(l), '-') "
            f"or startswith(ltrim(l), '*')))"
        )
        / F.expr(f"size({lines})").cast("double"),
        4)
    ellipsis_frac = fround(
        F.expr(f"size(filter({lines}, l -> endswith(rtrim(l), '...')))")
        / F.expr(f"size({lines})").cast("double"),
        4)
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPS)
    # LET-bind the token split: the filter lambda probes it once per
    # stopword, and lambda bodies get no common-subexpression
    # elimination — inlining would re-split the document 8 times.
    stop_hits = F.expr(
        f"transform(array({toks}), t -> "
        f"size(filter(array({stop_list}), w -> array_contains(t, w))))[0]"
    )
    passes = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_wl >= 3)
        & (mean_wl <= 10)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (stop_hits >= 2)
    )
    return [
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        stop_hits.alias("stop_hits"),
        passes.alias("passes"),
    ]


def unigram_surprise(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Corpus-unigram-LM quality score (the CCNet/perplexity-proxy
    shape): train a unigram model on the corpus itself (token relative
    frequencies), then score each document by the mean -log2 p(token)
    of its tokens. Boilerplate and keyword-stuffed documents score LOW
    (their tokens are corpus-frequent); lexically rich text scores
    high; gibberish scores highest — the standard band-pass filter
    keeps the middle of the distribution.

    Returns (id, n_tokens, surprise) with surprise rounded to 4 dp.

    Scale posture: one explode of the corpus into tokens, ONE
    aggregate shuffled on the token key (the model — vocabulary-sized,
    not corpus-sized), a token-keyed equi-join of the token stream
    against the model (AQE broadcasts small vocabularies), and a final
    per-doc aggregate. No all-pairs, no driver state; the one-row
    total-token count rides in via a broadcast cross join.
    """
    from .dedup import _spread

    tok = _spread(df, id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    )
    # freq feeds BOTH the total aggregate and the score join, each of
    # which would re-run the tokenize+explode+aggregate chain (README
    # finding #8); the checkpoint is VOCABULARY-sized, so it costs one
    # small job and removes a corpus pass (r13-opt — same reasoning as
    # bigram_surprise's uni checkpoint; heavier variants lost wall, see
    # OPTIMIZATION_r13.md).
    freq = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    )
    total = freq.agg(F.sum("c").alias("tot"))
    scored = (
        tok.join(freq, "t")
        .crossJoin(F.broadcast(total))
        .select(id_col, (-F.log2(F.col("c") / F.col("tot"))).alias("s"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        fround(F.avg("s"), 4).alias("surprise"),
    )


def bigram_surprise(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
    mu: float = 0.1,
):
    """Interpolated-bigram-LM surprise score — the CCNet-style
    perplexity filter one model order up from :func:`unigram_surprise`:
    train bigram + unigram counts on the corpus itself, score each
    document by the mean -log2 of the Jelinek-Mercer-interpolated
    conditional ``p(v|u) = lam*c2(u,v)/c1(u) + mu*c1(v)/T`` (mu is an
    explicit literal, NOT 1.0-lam — see the inline note)
    (c1(u) approximates the bigram-history mass — standard when
    boundary tokens aren't materialized; interpolation keeps p > 0 for
    every in-vocabulary continuation). Repetitive/boilerplate text
    scores LOW bits, gibberish word salad scores high — a sharper
    band-pass than the unigram model because it sees word ORDER.

    Returns (id, n_bigrams, bits_per_bigram): bits quantized via
    per-bigram nano-BIGINT scores summed exactly (sum < 2^53), so the
    only cross-engine risk is the documented 1-ulp log2 divergence at
    a 1e-9 quantize boundary (same residual as llm_naive_bayes).

    Scale posture: bigram + unigram model aggregates are
    VOCABULARY-sized shuffles, the score join is (u,v)-keyed against
    the model (AQE broadcasts small models), the one-row total rides
    in broadcast, and the final aggregate is per-doc. No window, no
    all-pairs, linear in token volume."""
    from .dedup import _spread

    toks_df = _spread(df, id_col).select(
        F.col(id_col), tokens(text_col).alias("toks")
    )
    b = (
        toks_df.filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i-1] AS u, toks[i] AS v))"
                )
            ).alias("bg"),
        )
        .select(id_col, "bg.u", "bg.v")
    )
    # uni feeds THREE consumers (tot / cu / cv), each of which would
    # re-run the tokenize+explode+aggregate chain (README finding #8);
    # the checkpoint is VOCABULARY-sized, so materializing it costs one
    # small job and removes three corpus passes (r13-opt: llm_bigram_lm
    # ~21 -> ~13 CPU-seconds at sf0.1, wall unchanged; the heavier
    # full-materialization variants — checkpointing the token stream,
    # or a count window over (u,v) replacing the c2 join — LOST wall
    # time: the model joins are AQE-broadcast so the duplicated
    # branches run shuffle-free and in parallel, while a corpus-sized
    # window shuffle serializes; see OPTIMIZATION_r13.md).
    uni = (
        toks_df.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    tot = uni.agg(F.sum("c").cast("double").alias("tot"))
    c2 = b.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c2"))
    cu = uni.select(F.col("w").alias("u"), F.col("c").alias("cu"))
    cv = uni.select(F.col("w").alias("v"), F.col("c").alias("cv"))
    # mu is an EXPLICIT weight, not computed as 1.0 - lam: the oracle
    # SQL carries the same decimal literals (0.9 / 0.1), and
    # 1.0 - 0.9 = 0.09999999999999998 != 0.1 as doubles — computing
    # the complement here would add a 1-ulp cross-engine constant
    # mismatch on top of the documented log2 residual.
    p = F.lit(lam) * (F.col("c2") / F.col("cu").cast("double")) + F.lit(mu) * (
        F.col("cv") / F.col("tot")
    )
    scored = (
        b.join(c2, ["u", "v"])
        .join(cu, "u")
        .join(cv, "v")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.floor(-F.log2(p) * F.lit(1000000000.0) + F.lit(0.5))
            .cast("long")
            .alias("nlog"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.floor(
                F.sum("nlog") / F.count(F.lit(1)).cast("double") / F.lit(100000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("bits_per_bigram"),
    )


def dsir_importance(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
    target: str = "en",
):
    """DSIR-style importance weight (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each
    document by the mean log-likelihood ratio of its tokens under a
    target-domain unigram LM vs the raw-corpus unigram LM (both
    add-one smoothed over the shared corpus vocabulary). Documents
    that look like the target domain get positive log_ratio — the
    importance-resampling signal for domain-targeted data selection.

    The ratio is computed as ONE log2 of an exact-integer product
    ratio ``((c_tgt+1)*(tot_raw+V)) / ((c_raw+1)*(tot_tgt+V))`` so the
    DuckDB oracle reproduces it bit-for-bit (products stay < 2^53).

    Returns (id, n_tokens, log_ratio); log_ratio is the quotient of an
    exact per-token nano-quantized integer sum (deterministic across
    engines and summation orders — no -0.0/0.0 ambiguity).

    Scale posture: identical to :func:`unigram_surprise` — one token
    explode, ONE vocabulary-sized aggregate building BOTH models
    (conditional count, no second pass over the corpus), a token-keyed
    join back, a broadcast one-row totals join, and a per-doc
    aggregate. Linear in token volume, no all-pairs.
    """
    from .dedup import _spread

    tok = _spread(df, id_col).select(
        F.col(id_col),
        (F.col(domain_col) == target).alias("is_tgt"),
        F.explode(tokens(text_col)).alias("t"),
    )
    model = tok.groupBy("t").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.count_if(F.col("is_tgt")).alias("c_tgt"),
    )
    totals = model.agg(
        F.sum("c_raw").alias("tot_raw"),
        F.sum("c_tgt").alias("tot_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = (
        tok.join(model, "t")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            # per-token quantize to exact nano BIGINTs BEFORE the mean:
            # avg() of doubles is summation-order-dependent and its 4-dp
            # round produced 0.0-vs-(-0.0) across engines at sf0.1; the
            # integer-sum quotient is deterministic and sign-clean
            F.floor(
                F.log2(
                    ((F.col("c_tgt") + 1) * (F.col("tot_raw") + F.col("v")))
                    / ((F.col("c_raw") + 1) * (F.col("tot_tgt") + F.col("v")))
                )
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("s_nano"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("s_nano") / (F.count(F.lit(1)) * F.lit(1e9))).alias("log_ratio"),
    )


def surprise_buckets(df, id_col: str = "doc_id", text_col: str = "text"):
    """CCNet-style head/middle/tail banding: split the corpus into
    terciles of :func:`unigram_surprise` (head = most-predictable
    third, the usual keep band; tail = highest-surprise third, the
    gibberish band). Cutoffs are the exact interpolated 1/3 and 2/3
    percentiles of the (4-dp-rounded) per-doc surprise, so bucket
    edges are engine-reproducible; boundary ties fall to the lower
    bucket on both engines.

    Returns (id, surprise, bucket).

    Scale posture: the per-doc surprise plan (linear, see
    unigram_surprise) plus ONE two-value percentile aggregate that
    rides back in via broadcast — bucketing is a row-local comparison,
    not a global sort/ntile, so the plan has no single-partition
    window at any size.
    """
    per = unigram_surprise(df, id_col, text_col)
    cuts = per.agg(
        F.percentile("surprise", F.lit(1.0 / 3)).alias("c1"),
        F.percentile("surprise", F.lit(2.0 / 3)).alias("c2"),
    )
    return per.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "surprise",
        F.when(F.col("surprise") <= F.col("c1"), F.lit("head"))
        .when(F.col("surprise") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def tfidf_top_terms(
    df, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
):
    """Top-k TF-IDF terms per document: tf = in-doc token count,
    idf = ln((N+1)/(df+1)) + 1 (smoothed), score = tf·idf rounded to
    6 dp before ranking (term-asc tiebreak) so ranking is
    engine-reproducible. The per-document keyword extraction primitive
    (indexing, topic labeling, boilerplate triage).

    Scale posture: per-(doc, term) counts aggregate map-side first;
    document frequencies are ONE more aggregate over the (doc, term)
    stream (already distinct by construction — no distinct shuffle);
    the idf join shuffles on the term key; the final top-k is a window
    over the doc key. Everything is linear in corpus token volume.
    """
    from pyspark.sql import Window

    from .dedup import _spread

    tf = (
        _spread(df, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "t")
        .crossJoin(F.broadcast(ndocs))
        .select(
            id_col,
            "t",
            fround(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1),
                6).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("t").alias("term"), "score", F.col("rank").cast("long").alias("rank"))
    )


def c4_line_columns(col_name: str = "text") -> list[Column]:
    """C4-style line-level cleaning signals (Raffel et al. 2020): a
    line is KEPT iff it ends in terminal punctuation (. ! ?) and has
    at least 3 whitespace words; a document passes with >= 3 kept
    lines. Returns n_lines, kept_lines, kept_frac (4 dp), passes —
    row-local, no shuffle, pinned so the oracle mirrors it exactly."""
    lines = f"split({col_name}, '\\n')"
    kept = (
        f"filter({lines}, l -> "
        f"(endswith(rtrim(l), '.') OR endswith(rtrim(l), '!') OR endswith(rtrim(l), '?')) "
        f"AND size(split(trim(l), '\\\\s+')) >= 3)"
    )
    n_lines = F.expr(f"size({lines})")
    kept_lines = F.expr(f"size({kept})")
    return [
        n_lines.cast("long").alias("n_lines"),
        kept_lines.cast("long").alias("kept_lines"),
        fround(kept_lines / n_lines.cast("double"), 4).alias("kept_frac"),
        (kept_lines >= 3).alias("passes"),
    ]


def boilerplate_lines(
    df, min_docs: int = 3, id_col: str = "doc_id", text_col: str = "text"
):
    """Cross-document boilerplate-line detection (the CCNet paragraph-
    dedup shape): a trimmed non-empty line is boilerplate when it
    appears in >= ``min_docs`` distinct documents (headers, footers,
    nav text). Returns per-doc (id, n_lines, bp_lines, bp_frac) where
    n_lines counts the doc's DISTINCT non-empty lines.

    Scale posture: explode lines → per-doc distinct (map-side combine
    on the (doc, line-hash) key) → document frequency via a COUNT
    WINDOW over the line-hash key (the distinct stream has one row per
    (doc, line), so the partition count IS the document frequency) →
    per-doc aggregate. One pass over the exploded lines: the previous
    aggregate-then-join-back formulation re-executed the whole
    explode+distinct subtree for both branches (README finding #8,
    r13-opt). Linear in line volume, no all-pairs.

    Skew note (r14, VERDICT r13 item 1): the distinct stream is
    already the per-(doc, key) pre-aggregate and the window key is
    already a hash, so both halves of the r13 skew-proofing
    prescription hold here by construction — a line's window partition
    is bounded by its document frequency, never by within-doc
    repeats. Residual: a line present once in a large fraction of ALL
    docs (the exact thing min_docs hunts) still lands its
    distinct-doc rows in one window partition, and AQE cannot split a
    window partition; the escape hatch at that scale is the
    aggregate+join-back form (AQE skew-splits the probe side) at the
    cost of a second explode+distinct build."""
    from pyspark.sql import Window

    lines = (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"filter(transform(split({text_col}, '\\n'), l -> trim(l)), "
                    f"l -> l != '')"
                )
            ).alias("line"),
        )
        .select(id_col, F.md5("line").alias("lh"))
        .distinct()
    )
    return (
        lines.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("lh")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count_if(F.col("df") >= min_docs).alias("bp_lines"),
            fround(
                F.count_if(F.col("df") >= min_docs)
                / F.count(F.lit(1)).cast("double"),
                4).alias("bp_frac"),
        )
    )


def fingerprint(col: str | Column = "text") -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (the classic "fingerprint clustering" key)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def chunk_columns(
    col_name: str = "text", size: int = 64, stride: int = 48
) -> Column:
    """Sliding token-window chunking: chunk ``i`` covers tokens
    ``[i*stride, i*stride + size)``; starts run while ``i*stride < n``
    (trailing chunks may be partial). ``stride < size`` gives
    overlapping passages — the standard pretraining/RAG splitting.

    Returns an array of structs (chunk_id, n_chunk_tokens, chunk_hash)
    for the caller to explode — row-local, computed from one LET-bound
    token split (no per-element re-tokenization; see word_ngrams)."""
    toks = f"split(lower(trim({col_name})), '\\\\s+')"
    return F.expr(
        f"transform(array({toks}), t -> "
        f"transform(sequence(0, cast(ceil(size(t) / {stride}.0) AS INT) - 1), "
        f"i -> struct(i AS chunk_id, "
        f"size(slice(t, i * {stride} + 1, {size})) AS n_chunk_tokens, "
        f"md5(array_join(slice(t, i * {stride} + 1, {size}), ' ')) AS chunk_hash)))[0]"
    )


def bm25_scores(
    df,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 relevance of every document against a fixed query-term set
    — the retrieval face of the text stack (Robertson/Spärck Jones).
    Output: (id, score) with score rounded to 6 dp.

    Plan shape: the query is bounded and known, so there is NO explode
    and NO term-keyed shuffle — per-document term frequencies are
    row-local ``size(filter(toks, ...))`` projections over a
    LET-bound token array (aliased into its own projection so the
    split runs once, not once per term); corpus stats (N, avgdl, per-
    term document frequencies) are ONE global aggregate broadcast back
    as a single row. Scoring is then row-local arithmetic in codegen.
    Two linear scans, zero wide shuffles — at 100 TB the only
    all-reduce is a handful of doubles.
    """
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("toks"))
    # Occurrence count WITHOUT a lambda: size(toks) - size(array_remove)
    # stays in whole-stage codegen, where filter(toks, ...) would drop
    # the whole projection to the interpreted HOF path.
    tf_cols = [
        (F.size("toks") - F.size(F.array_remove("toks", t))).alias(f"tf{i}")
        for i, t in enumerate(terms)
    ]
    m = toks_df.select(F.col(id_col), F.size("toks").alias("dl"), *tf_cols)
    stats = m.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double").alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log((F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1)
        term = F.when(tf > 0, idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return m.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), fround(score, 6).alias("score")
    )


# Karp-Rabin + winnowing parameters (Schleimer et al., SIGMOD 2003 —
# the MOSS fingerprinting scheme): char k-grams, polynomial rolling
# hash base/modulus, window w. M = 2^31-1 keeps every Horner step
# inside BIGINT on both engines ((M-1)*257 + 255 < 2^63).
WINNOW_K = 8
WINNOW_W = 16
WINNOW_B = 257
WINNOW_M = 2147483647


def winnow_fp_sets(df, id_col: str = "doc_id", text_col: str = "text"):
    """Winnowed rolling-hash document fingerprints: per doc, the
    distinct window-minima of the Karp-Rabin hashes of all character
    k-grams — the MOSS scheme, whose guarantee is that any shared
    substring of length >= k + w - 1 contributes at least one IDENTICAL
    fingerprint to both documents (local near-dup evidence robust to
    insertion/reordering, unlike the global sorted-token fingerprint).

    Returns (id, n_fingerprints, fp_digest): the selected-fingerprint
    count and an md5 digest of the sorted fingerprint set (compact,
    order-canonical). All hash arithmetic is exact BIGINT (Horner fold
    mod 2^31-1), so both engines compute identical fingerprints.

    Plan shape: four row-local projections — each array (char codes,
    k-gram hashes, window minima) is materialized as a COLUMN between
    steps, so no higher-order lambda ever re-evaluates an expensive
    subexpression (the lambda-CSE trap, README findings 1-3). Work is
    O(len·(k+w)) per row, embarrassingly parallel; no shuffle at all."""
    k, w, b, m = WINNOW_K, WINNOW_W, WINNOW_B, WINNOW_M
    # Per-row-heavy chain: spread off the testdata's single row group
    # first (one file = one split; at cluster scale this is a no-op
    # relative to the O(len·(k+w)) per-row work it parallelizes).
    par = df.sparkSession.sparkContext.defaultParallelism
    codes = df.repartition(par).select(
        F.col(id_col),
        F.expr(
            f"transform(split({text_col}, ''), ch -> CAST(ascii(ch) AS BIGINT))"
        ).alias("codes"),
    )
    hashes = codes.select(
        id_col,
        F.expr(
            f"""CASE WHEN size(codes) >= {k} THEN
                  transform(sequence(1, size(codes) - {k} + 1),
                    i -> aggregate(slice(codes, i, {k}), 0L,
                                   (a, x) -> (a * {b} + x) % {m}))
                ELSE array() END"""
        ).alias("hashes"),
    )
    fps = hashes.select(
        id_col,
        F.expr(
            f"""CASE WHEN size(hashes) >= {w} THEN
                  array_distinct(transform(sequence(1, size(hashes) - {w} + 1),
                    i -> array_min(slice(hashes, i, {w}))))
                ELSE array_distinct(hashes) END"""
        ).alias("fps"),
    )
    return fps


def winnow_fingerprints(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_fingerprints, fp_digest) — the compact per-doc summary of
    :func:`winnow_fp_sets` (count + md5 of the sorted fingerprint set)."""
    return winnow_fp_sets(df, id_col, text_col).select(
        id_col,
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.md5(
            F.concat_ws(
                ",", F.expr("transform(array_sort(fps), x -> CAST(x AS STRING))")
            )
        ).alias("fp_digest"),
    )


# ---------------------------------------------------------------------------
# Batched-generation BPE: train a merge table with bounded per-generation
# collects, apply it as a JVM replace chain. The tokenization state of a
# word is its space-separated token string wrapped in single spaces
# (' h e l l o '), so a merge rule (a, b) is the literal replacement
# ' a b ' -> ' ab ' — replace()'s leftmost-nonoverlapping all-occurrence
# semantics are exactly BPE's single-rule application, and the spaced
# form is unambiguous because whitespace-split tokens never contain
# spaces. Within one generation every rule pairs tokens that existed
# BEFORE the generation (merging removes adjacencies of its own inputs
# and only creates pairs involving the new longer token), so applying a
# generation's rules once each, in rank order, is exact.
# ---------------------------------------------------------------------------

BPE_GENS = 3
BPE_PER_GEN = 8


def bpe_spaced_state(words: "DataFrame") -> "DataFrame":
    """(w, c) word-frequency table -> (w, c, s) with s the initial
    per-character spaced state. Per-character via Java regex '(.)'
    (UTF-16 code units — identical to the oracle's string_split(w,'')
    on the BMP; astral plane is a documented residual, same class as
    llm_bpe_merge_counts' substring() chars)."""
    return words.withColumn(
        "s",
        F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 ")),
    )


def bpe_train(
    state: "DataFrame",
    gens: int = BPE_GENS,
    per_gen: int = BPE_PER_GEN,
    min_count: int = 1,
) -> tuple["DataFrame", list[tuple[str, str]]]:
    """Train ``gens`` generations of ``per_gen`` merges over a spaced
    state (w, c, s) and return (state-with-merges-applied, merge list
    in global rank order).

    Each generation: ONE distributed pair count over the current state
    (weighted by word frequency c — classic BPE trains on the word-
    frequency table, which is vocabulary-sized, not corpus-sized), a
    driver collect bounded at ``per_gen`` rows, then ``per_gen``
    chained JVM replace() columns. Ties break (count DESC, a ASC,
    b ASC) — deterministic on both engines. Total driver state:
    gens × per_gen merge rules. The state is localCheckpointed after
    each generation's replaces: generation g's training collect and
    the final apply are separate plan consumers, so without the
    barrier every later pass re-ran all earlier generations' replace
    chains from the raw scan (the cross-branch-re-execution trap,
    README plan-audit #8); the checkpointed relation is vocabulary-
    sized.

    ``min_count`` is the 100 TB-posture bound on the TRAINING relation
    (r12 VERDICT): "vocabulary-sized" is Heaps-law sublinear but can
    still reach billions of distinct words on raw web text, so real
    tokenizer trainers floor the word-frequency table (HuggingFace
    tokenizers ``min_frequency``, SentencePiece hard vocab caps).
    Words with c < min_count are excluded from every generation's pair
    aggregation — bounding its input to the frequent vocabulary whose
    size a corpus owner controls — but merges still APPLY to the full
    state, so tokenization covers every word. The default (1) is the
    exact uncapped path the fixture oracles pin; at fixture scale a
    small floor is additionally a measured no-op on the learned merges
    because top-``per_gen`` pairs are dominated by frequent words
    (pinned by tests/test_llm_functions.py::test_bpe_min_count_floor).
    """
    merges: list[tuple[str, str]] = []
    # entry barrier: the initial state's lineage is the corpus-wide
    # word explode + frequency aggregate — materialize it once so
    # generation 1's training pass doesn't re-run the corpus scan that
    # the caller already paid for building the frequency table
    state = state.localCheckpoint()
    for _ in range(gens):
        # LET-bind the token array (README plan-audit: no CSE inside
        # higher-order lambdas) before building adjacent pairs.
        train_src = state if min_count <= 1 else state.where(F.col("c") >= min_count)
        st = train_src.select("c", F.split(F.trim("s"), " ").alias("ts"))
        pairs = (
            st.where(F.size("ts") >= 2)
            .select(
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> struct(ts[i-1] AS a, ts[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(per_gen)
            .collect()  # bounded: per_gen rows
        )
        if not pairs:
            break
        for r in pairs:
            merges.append((r.a, r.b))
            state = state.withColumn(
                "s",
                F.replace(
                    F.col("s"),
                    F.lit(f" {r.a} {r.b} "),
                    F.lit(f" {r.a}{r.b} "),
                ),
            )
        state = state.localCheckpoint()
    return state, merges


def bpe_apply_merges_pandas(words, merges):
    """Reference APPLY path for the Arrow tokenizer harness: the same
    merge chain as vectorized pandas str.replace (regex=False —
    Python str.replace's leftmost-nonoverlapping semantics, identical
    to JVM/DuckDB replace). This is what a mapInPandas iterator body
    runs when the trained table is shipped to Arrow workers; pinned
    against the JVM chain by tests/test_llm_functions.py."""
    s = " " + words.str.replace("(.)", r"\1 ", regex=True)
    for a, b in merges:
        s = s.str.replace(f" {a} {b} ", f" {a}{b} ", regex=False)
    return s.str.strip()
