"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Hash arithmetic is pinned to md5 (portable across Spark and DuckDB):
``h(s) = int(md5(s)[0:15], 16)`` — 60 bits, fits a signed i64 — and
derived permutations ``(a_j * (h % P) + b_j) mod P`` with
P = 2147483647 (Mersenne 2^31-1) and a_j/b_j themselves md5-derived.
All kernels are JVM-side (explode + hash-aggregate + equi-join);
nothing touches Python row-by-row.

Scale posture (100 TB): every near-dup algorithm here reduces to
explode → shuffle on a *bucket key* → equi-join, the canonical
LSH-at-scale shape: candidate generation is linear in corpus size,
never all-pairs. The brute-force pair kernels exist for oracle checks
and small candidate sets only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import tokens, word_ngrams

MINHASH_P = 2147483647  # 2^31 - 1



def fround(col, scale):
    """Binary-deterministic fractional round (floor(x*10^n+0.5)/10^n):
    identical on Spark/DuckDB/numpy for identical doubles, no -0.0 for
    tiny negatives rounding to zero. See plans/base.py:fround."""
    col = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)

def ordered_pair_fanout(ds: str, fields: str = "x AS a, y AS b") -> str:
    """SQL snippet: ordered (i < j) pair fan-out over a sorted posting
    array ``ds`` — struct fields come from the caller (``x`` is the
    earlier element, ``y`` the later). Shared by the LSH-bucket and
    ngram-posting pair generators so the fan-out shape has one home."""
    return (
        f"flatten(transform({ds}, (x, i) -> "
        f"transform(slice({ds}, i + 2, size({ds})), y -> struct({fields}))))"
    )


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition the (small) doc rows on the id before a heavy
    explode so the fan-out parallelizes. The shuffle moves pre-explode
    rows — cheap relative to the shingle/token/bit blow-up it balances,
    at local scale (one small input split) and at cluster scale
    (explode skew from long documents)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)


def md5_int60(col: Column) -> Column:
    """First 15 hex chars of md5 → signed 60-bit int (portable:
    DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(col_name: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text: the
    distinct set over :func:`text.word_ngrams` (which carries the
    LET-bound tokenization — see its docstring for the O(tokens²)
    trap the binding avoids)."""
    return F.array_distinct(word_ngrams(col_name, n))


def exact_dup_clusters(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: one shuffle on the hash."""
    return (
        df.select(F.md5(F.col(col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_id"))
    )


def minhash_params(spark, k: int = 16) -> DataFrame:
    """k md5-derived permutation params (a_j odd-ish nonzero, b_j)."""
    j = F.col("id").cast("int").alias("j")
    a = (md5_int60(F.concat(F.lit("mh_a_"), F.col("id"))) % (MINHASH_P - 1) + 1).alias("a")
    b = (md5_int60(F.concat(F.lit("mh_b_"), F.col("id"))) % MINHASH_P).alias("b")
    return spark.range(k).select(j, a, b)


def _minhash_param_values(k: int) -> list[tuple[int, int]]:
    """Driver-side mirror of :func:`minhash_params` (same md5 formula,
    verified equal in tests): lets the signature kernel inline a_j/b_j
    as literals instead of cross-joining a params relation."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        (h60(f"mh_a_{j}") % (MINHASH_P - 1) + 1, h60(f"mh_b_{j}") % MINHASH_P)
        for j in range(k)
    ]


def minhash_wide(df: DataFrame, k: int = 16, id_col: str = "doc_id") -> DataFrame:
    """(id, mh_0..mh_{k-1}): min over shingles of (a_j*x + b_j) mod P.

    ONE wide hash-aggregate: explode(shingles) → groupBy(id) with k
    min-columns (params inlined as literals). Map-side partial rows
    are one wide row per (partition, doc) instead of k rows, so
    shuffle volume is 1/k of a param-cross-join plan. a*x stays below
    2^62 (a, x < 2^31), so the arithmetic never overflows the signed
    64-bit long.
    """
    sh = _spread(df, id_col).select(F.col(id_col), F.explode(word_shingles()).alias("sh"))
    x = md5_int60(F.col("sh")) % MINHASH_P
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % MINHASH_P).alias(f"mh_{j}")
        for j, (a, b) in enumerate(_minhash_param_values(k))
    ]
    return sh.select(F.col(id_col), x.alias("x")).groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame, spark, k: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """(id, j, mh) long form: unpivot (stack) of :func:`minhash_wide` —
    a narrow generate, no extra shuffle."""
    wide = minhash_wide(df, k, id_col)
    stack_args = ", ".join(f"{j}, mh_{j}" for j in range(k))
    return wide.select(
        F.col(id_col),
        F.expr(f"stack({k}, {stack_args}) AS (j, mh)"),
    ).select(id_col, F.col("j").cast("int").alias("j"), "mh")


def lsh_band_buckets_wide(
    wide: DataFrame, k: int = 16, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bucket) computed MAP-SIDE from the wide signature row
    — no re-aggregation shuffle. Band b holds rows j ≡ b (mod bands),
    concatenated in ascending j (matching the long-form band hash:
    md5 of the band's mh values ordered by j)."""
    rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh_{j}").cast("string") for j in range(k) if j % bands == b]
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return wide.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_digest(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One row per doc: md5 digest of the ordered signature (compact,
    order-deterministic via array_sort on (j, mh) structs)."""
    return sig.groupBy(id_col).agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mh"))), lambda s: s["mh"].cast("string")
                ),
                ",",
            )
        ).alias("sig_digest"),
        F.min(F.when(F.col("j") == 0, F.col("mh"))).alias("mh0"),
    )


def lsh_candidate_pairs(
    buckets: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """(band, bucket) posting lists → candidate pairs (a < b).
    Linear-time candidate generation: ONE shuffle of one copy of the
    bucket stream (groupBy the bucket key, ordered fan-out per posting)
    instead of a self-join that reshuffles both sides, then a distinct
    to merge pairs that collide in several bands. A bucket of size m
    emits m·(m-1)/2 pairs — same output as the join formulation.

    ``max_bucket`` drops degenerate buckets above that size BEFORE the
    fan-out (the skew valve for corpora with huge identical-signature
    clusters — same trade as ngram_jaccard_pairs' max_posting: such a
    cluster is better resolved by exact dedup than by m²/2 candidate
    pairs). The registered queries run uncapped (exact semantics)."""
    grouped = (
        buckets.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_bucket is not None:
        grouped = grouped.filter(F.size("ds") <= max_bucket)
    return (
        grouped
        .select(F.explode(F.expr(ordered_pair_fanout("ds"))).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )


def lsh_bucket_pairs(
    sig: DataFrame, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding from the LONG signature form (one re-aggregation
    shuffle; prefer :func:`lsh_band_buckets_wide` when the wide row is
    already at hand)."""
    banded = sig.withColumn("band", F.col("j") % bands)
    buckets = banded.groupBy(id_col, "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mh"))), lambda s: s["mh"].cast("string")
                ),
                ",",
            )
        ).alias("bucket")
    )
    return lsh_candidate_pairs(buckets, id_col)


def incremental_minhash_triage(
    df: DataFrame, is_new: Column, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Triage a new-crawl increment against a frozen corpus snapshot
    using MinHash-LSH band buckets: each increment row (``is_new``
    true — must be a pure function of ``id_col`` so it can be applied
    map-side on the bucket stream with no join) gets 'dup_snapshot'
    (shares >=1 band bucket with a snapshot doc), 'dup_batch'
    (collides only with a smaller-id increment doc), or 'admit'. The
    snapshot side is NEVER self-joined — the snapshot check is a
    (band, bucket) left-semi join and within-batch pairs run the
    linear posting-list kernel on the increment alone, so per-batch
    cost is independent of corpus-pair count."""
    # buckets feeds THREE branches (snapshot semi-join, within-batch
    # pair fan-out, and the increment filter below): materialize once
    # or Spark re-executes the shingle+minhash subtree per branch
    # (README finding #8; measured r13-opt on llm_incremental_minhash:
    # 2.45 -> 1.7 s at sf0.1, plan 4 documents scans -> 2). The
    # materialized relation is (id, band, bucket) — 4 narrow rows per
    # doc, a bounded stage manifest at any scale.
    buckets = (
        lsh_band_buckets_wide(minhash_wide(df, id_col=id_col), bands=bands)
        .withColumn("is_new", is_new)
        .localCheckpoint()
    )
    inc = buckets.filter(F.col("is_new")).select(id_col, "band", "bucket")
    snap = buckets.filter(~F.col("is_new")).select("band", "bucket")
    dup_snap = (
        inc.join(snap, ["band", "bucket"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("hit_snap", F.lit(True))
    )
    dup_batch = (
        lsh_candidate_pairs(inc, id_col)
        .select(F.col("b").alias(id_col))
        .distinct()
        .withColumn("hit_batch", F.lit(True))
    )
    return (
        df.select(id_col)
        .filter(is_new)
        .join(dup_snap, id_col, "left")
        .join(dup_batch, id_col, "left")
        .select(
            id_col,
            F.when(F.col("hit_snap"), "dup_snapshot")
            .when(F.col("hit_batch"), "dup_batch")
            .otherwise("admit")
            .alias("status"),
        )
    )


def simhash60(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over distinct tokens: per bit j, the sign of
    Σ ±1 over token hashes' bit j.

    ONE wide hash-aggregate (same shape as :func:`minhash_wide`):
    explode(tokens) → groupBy(doc) with 60 per-bit vote sums, then a
    map-side reassembly of the sign bits into the 60-bit hash. Map-side
    partials carry one wide row per (partition, doc) — no per-(doc,bit)
    row fan-out, no bit-index join, a single shuffle on the doc key."""
    tok = _spread(df, id_col).select(
        F.col(id_col), F.explode(F.array_distinct(tokens())).alias("t")
    )
    h = tok.select(id_col, md5_int60(F.col("t")).alias("h"))
    votes = [
        F.sum(
            F.when(F.expr(f"shiftright(h, {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(60)
    ]
    wide = h.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(60):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return wide.select(id_col, sim.cast("long").alias("simhash"))


def hamming60(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band_pairs(
    sh: DataFrame, bands: int = 4, bits: int = 60, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs from banding the simhash into ``bands`` contiguous
    chunks: band b's key is bits [b*w, (b+1)*w) of the hash (w = bits /
    bands). Pairs sharing any band key are candidates — by pigeonhole,
    every pair with Hamming distance < ``bands`` is guaranteed caught
    (≤ bands-1 differing bits can dirty at most bands-1 of the bands).

    The same explode → (band, key) equi-join shape as MinHash LSH:
    candidate generation is linear in corpus size, one shuffle on the
    band key, never all-pairs. Signatures ride along so the exact
    Hamming verify needs no second join."""
    width = bits // bands
    mask = (1 << width) - 1
    chunks = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"shiftright(simhash, {b * width}) & {mask}").alias("key"),
        )
        for b in range(bands)
    ]
    banded = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*chunks)).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "band", "key")
    b = banded.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .dropDuplicates(["a", "b"])
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve candidate near-dup pairs into clusters: every node gets
    the min node id reachable through the pair graph (the keeper id).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels — one equi-join + one
    hash-aggregate per round, shuffled on the node key. Converges in
    O(cluster diameter) rounds; near-dup clusters are shallow, so this
    beats star-contraction's extra passes in practice. Fixpoint is
    detected by the (monotonically decreasing) label sum; lineage is
    truncated per round with localCheckpoint so plans stay bounded.

    Materializes one action per round — an iterative algorithm, not a
    single declarative plan (the driver-side loop carries no row data).

    Small-graph fast path: when the candidate-pair count is under
    ``driver_threshold`` the component labels come from a driver-side
    union-find over the collected pairs (2 jobs total instead of
    O(diameter) join rounds — near-dup candidate graphs are usually a
    sliver of the corpus). The distributed loop is the scale path for
    pair sets too big to collect; both produce the identical
    min-reachable-id fixpoint.
    """
    # Lazy checkpoint: the size probe below materializes the candidate
    # pipeline ONCE; the collect (fast path) or the per-round joins
    # (distributed path) reuse the stored partitions.
    e = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).localCheckpoint(
        eager=False
    )
    driver_threshold = 500_000
    # Single job doubles as size probe and fast-path fetch: collect at
    # most threshold+1 edges and branch on how many came back — if we
    # got <= threshold we already hold the whole edge set. On the
    # large-graph path this ships a BOUNDED ~8-16 MB (threshold+1 two-
    # long rows) that is then discarded — a constant cost independent
    # of graph size, traded for the separate count job a count-probe
    # would run on the (dominant) small-graph path.
    head = e.limit(driver_threshold + 1).collect()
    if len(head) <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in head:
            ra, rb = find(r.src), find(r.dst)
            if ra != rb:
                # union by smaller id so the root IS the min label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        if not parent:
            return nodes.select(id_col, F.col(id_col).alias("cluster_id"))
        lbl = pairs.sparkSession.createDataFrame(
            [(n, find(n)) for n in parent], ["node", "cluster"]
        )
        return (
            nodes.select(id_col)
            .join(F.broadcast(lbl), nodes[id_col] == lbl["node"], "left")
            .select(
                id_col,
                F.coalesce("cluster", F.col(id_col)).alias("cluster_id"),
            )
        )
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    # Propagate only over edge-incident nodes: isolated nodes (the vast
    # majority of a near-dup corpus) can never change label, so they
    # skip the loop entirely and are unioned back at the end — every
    # per-round join and aggregate shrinks to the candidate-pair
    # subgraph instead of the full corpus.
    touched = edges.select(F.col("src").alias("node")).distinct()
    labels = touched.withColumn("label", F.col("node"))
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        # eager=False + the immediate fixpoint aggregation below: the
        # checkpoint materializes inside the same job as the agg — one
        # job per round, not two.
        labels = (
            labels.join(nbr, labels["node"] == nbr["dst"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        cur = labels.agg(F.sum("label")).collect()[0][0]
        if cur == prev_sum:
            break
        prev_sum = cur
    resolved = labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )
    return (
        nodes.select(id_col)
        .join(resolved, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    max_posting: int | None = None,
    with_counts: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing ≥1 shingle, via
    posting lists: explode → groupBy(shingle) collecting the (sorted)
    doc list → fan out ordered pairs per posting → count common /
    inclusion-exclusion. ONE scan of the corpus and one shuffle on the
    shingle key (vs. two scans + a self-join).

    ``max_posting`` drops stop-shingle postings (shingles appearing in
    more than that many documents) BEFORE the pair fan-out: one hot
    shingle of posting size m otherwise emits m²/2 pairs from a single
    key — the classic skew blow-up. Capped runs report a lower-bound
    jaccard (common counts miss the dropped shingles; denominators stay
    exact), which is the standard posting-pruning trade: stop-shingles
    carry no dedup signal but all of the cost. ``None`` = exact.

    The per-doc shingle-set size rides along with each posting entry
    (one extra int per (shingle, doc) record), so the pair fan-out
    emits (a, na, b, nb) directly and the final aggregate computes
    jaccard with NO size join: one corpus scan, two shuffles total
    (shingle key, pair key), no checkpoint, no broadcast builds.
    """
    # The explode keeps the shingling expression INLINE: naming the
    # array in a projection lets InferFiltersFromGenerate clone the
    # whole expression into a non-empty filter that predicate pushdown
    # then sinks BELOW the _spread exchange — evaluating the shingling
    # twice per doc on the single pre-repartition scan partition
    # (measured 16 s vs 0.9 s at sf0.1). n_sh comes from a count window
    # over the doc key instead (shingles are distinct per doc, so the
    # count IS the set size); the window reuses _spread's hash
    # partitioning, so it adds a per-partition sort and no shuffle.
    from pyspark.sql import Window

    sh = (
        _spread(df, id_col)
        .select(F.col(id_col), F.explode(word_shingles(n=n)).alias("sh"))
        .withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    # array_sort on structs orders by the leading field (the doc id), so
    # the fan-out below emits each pair once with a < b. The sort runs
    # AFTER the size filters so uncapped stop-shingle postings are
    # pruned before paying the struct-comparator sort.
    postings = (
        sh.groupBy("sh")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("d"), "n_sh")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_posting is not None:
        postings = postings.filter(F.size("ds") <= max_posting)
    postings = postings.withColumn("ds", F.array_sort("ds"))
    pairs = postings.select(
        F.explode(
            F.expr(
                ordered_pair_fanout(
                    "ds", "x.d AS a, x.n_sh AS na, y.d AS b, y.n_sh AS nb"
                )
            )
        ).alias("p")
    ).select("p.a", "p.na", "p.b", "p.nb")
    agged = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common"),
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
    )
    jac = fround(
        F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
    ).alias("jaccard")
    if with_counts:
        # keep the raw counts so asymmetric measures (containment =
        # common / min-set) can be derived without re-running the
        # posting fan-out
        return agged.select("a", "b", "common", "na", "nb", jac)
    return agged.select("a", "b", jac)


def rle_gram_counts(sorted_grams: Column) -> Column:
    """Row-local run-length encoding of a SORTED ``array<long>`` gram
    array into ``array<struct<ghash, k_local>>`` — the per-(doc, gram)
    pre-aggregate of the r14 skew-proofed count-window kernels
    (llm_substring_dedup; VERDICT r13 item 1, guide §2.5) computed
    WITHOUT an exchange: exploding this instead of the raw occurrence
    stream bounds a hot gram's window partition to its distinct-doc
    count (a licence block repeated R times inside one doc costs one
    row, not R — tools/skew_probe.py demonstrates the straggler
    collapse), while sum(k_local) windows/aggregates reproduce every
    occurrence-count statistic exactly.

    Every array the lambdas index is LET-bound via the
    ``transform(array(...), v -> ...)[0]`` idiom (no CSE inside
    higher-order lambdas — README plan-audit finding); ``F.get`` (not
    ``[]``/``element_at``) keeps the i-1 probe NULL-safe under ANSI.
    Empty input yields an empty struct array."""

    def _rle(sa: Column) -> Column:
        st = F.filter(
            F.sequence(F.lit(0), F.size(sa) - 1),
            lambda i: (i == F.lit(0)) | (F.get(sa, i) != F.get(sa, i - 1)),
        )
        return F.transform(
            F.array(st),
            lambda stt: F.zip_with(
                stt,
                F.concat(F.slice(stt, F.lit(2), F.size(stt)), F.array(F.size(sa))),
                lambda s, e: F.struct(
                    F.get(sa, s).alias("ghash"),
                    (e - s).cast("long").alias("k_local"),
                ),
            ),
        )[0]

    empty = F.array().cast("array<struct<ghash:bigint,k_local:bigint>>")
    return F.transform(
        F.array(sorted_grams),
        lambda sa: F.when(F.size(sa) > 0, _rle(sa)).otherwise(empty),
    )[0]


def rle_gram_positions(sorted_pairs: Column) -> Column:
    """Positional sibling of :func:`rle_gram_counts`: a SORTED
    ``array<struct<ghash, pos0>>`` becomes
    ``array<struct<ghash, ps: array<pos0>>>`` — one row per distinct
    gram with its in-doc positions carried as an ARRAY PAYLOAD, so a
    position-aware kernel (llm_substring_trim) gets the same
    distinct-doc window bound and explodes the positions back out
    after the corpus-frequency decision. Same LET-binding/NULL-safety
    notes as the count form; input must be non-empty (callers filter
    ``length(text) >= k`` first)."""

    def _rle(sa: Column) -> Column:
        st = F.filter(
            F.sequence(F.lit(0), F.size(sa) - 1),
            lambda i: (i == F.lit(0))
            | (F.get(sa, i).getField("ghash") != F.get(sa, i - 1).getField("ghash")),
        )
        return F.transform(
            F.array(st),
            lambda stt: F.zip_with(
                stt,
                F.concat(F.slice(stt, F.lit(2), F.size(stt)), F.array(F.size(sa))),
                lambda s, e: F.struct(
                    F.get(sa, s).getField("ghash").alias("ghash"),
                    F.transform(
                        F.sequence(s, e - 1), lambda j: F.get(sa, j).getField("pos0")
                    ).alias("ps"),
                ),
            ),
        )[0]

    return F.transform(F.array(sorted_pairs), _rle)[0]
