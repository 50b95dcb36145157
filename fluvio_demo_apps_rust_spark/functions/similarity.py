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


DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
    "cast(0.0 AS double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate({a}, cast(0.0 AS double), "
    "(acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
)



def fl6(col):
    """Binary-deterministic 6-dp round: floor(x*1e6+0.5)/1e6 — identical
    on Spark, DuckDB and numpy for identical input doubles, and never
    emits -0.0 for a tiny negative that rounds to zero (floor result 0
    divided is +0.0). Replaces round(x, 6), whose Spark implementation
    is Double.toString-based and diverges from binary rounding at
    shortest-repr half boundaries and at -0.0."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def np_fl6(a):
    """numpy twin of fl6 (same binary floor semantics)."""
    import numpy as np

    return np.floor(a * 1e6 + 0.5) / 1e6

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

    # Norms are computed ONCE per vector on each side (not per pair):
    # per-pair work is the dot product plus one multiply.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_norm"),
    )
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(vec_col).alias("n_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            fl6(
                dot("q_vec", "n_vec") / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
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


def ivf_cells(
    emb: DataFrame,
    ncells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer: score every vector against the (small,
    broadcast) centroid set; ``rn`` ranks centroids per vector by
    cosine (desc, centroid-id tiebreak). ``rn = 1`` is the vector's
    cell; ``rn <= nprobe`` are a query's probe cells.

    Centroids here are the first ``ncells`` vectors — deterministic, so
    the DuckDB oracle reproduces the exact partition. In production the
    centroid set comes from k-means sampling instead and is passed via
    ``centroids``; with thousands of cells, swap the crossJoin+window
    argmax for a Pandas-UDF matmul against a broadcast numpy matrix.
    """
    from pyspark.sql import Window

    cent = centroids if centroids is not None else emb.filter(F.col(id_col) < ncells)
    cent = cent.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        emb.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(cent))
        .select(
            id_col,
            vec_col,
            "c_id",
            fl6(cosine(vec_col, "c_vec")).alias("c_sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("c_id"))
    return scored.withColumn("rn", F.row_number().over(w))


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus partitioned into cells by nearest centroid
    (one assignment pass, shuffle on the cell key only); each query
    rescores exactly against the ``nprobe`` nearest cells' members.

    Scale path: candidate count ≈ N·nprobe/ncells per query instead of
    N; the cell-keyed equi-join replaces the cross product. Each corpus
    vector lives in exactly one cell, so no candidate dedup is needed.
    """
    from pyspark.sql import Window

    # Corpus→cell assignment is an ARGMAX, not a ranking: max_by over
    # struct(c_sim, -c_id) picks the highest-similarity centroid with
    # the lowest-id tie-break (identical selection to ivf_cells rn=1)
    # while keeping the aggregate partial/map-side — no per-vector
    # window sort shuffle on the corpus, which is the big side at
    # scale. Probes still use ivf_cells: top-nprobe needs a ranking.
    cent = emb.filter(F.col(id_col) < ncells).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    corpus = (
        emb.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(cent))
        .select(
            id_col,
            vec_col,
            "c_id",
            fl6(cosine(vec_col, "c_vec")).alias("c_sim"),
        )
        .groupBy(id_col)
        .agg(
            F.any_value(vec_col).alias("n_vec"),
            F.max_by(
                "c_id", F.struct(F.col("c_sim"), (-F.col("c_id")).alias("neg"))
            ).alias("cell"),
        )
        .select(F.col(id_col).alias("n_id"), "n_vec", "cell")
    )
    probes = (
        ivf_cells(queries, ncells, id_col, vec_col, centroids=emb.filter(F.col(id_col) < ncells))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("c_id").alias("cell"),
        )
    )
    scored = (
        corpus.withColumn("n_norm", norm("n_vec"))
        .join(F.broadcast(probes.withColumn("q_norm", norm("q_vec"))), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            fl6(
                dot("q_vec", "n_vec") / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_candidate_pairs(
    emb: DataFrame,
    nb: int = 8,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup candidate pairs from banded hyperplane signatures:
    the nb-bit signature splits into ``bands`` contiguous bit groups;
    pairs agreeing on any full group are candidates. Same linear
    explode → (band, key) equi-join shape as MinHash LSH — one shuffle
    on the band key, no cross product. Vectors and norms ride along so
    the exact cosine verify needs no second join."""
    width = nb // bands
    sig = lsh_signature(vec_col, nb, dim)
    base = emb.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("nrm"), sig.alias("sig")
    )
    chunks = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring(F.col("sig"), b * width + 1, width).alias("key"),
        )
        for b in range(bands)
    ]
    banded = base.select(
        id_col, vec_col, "nrm", F.explode(F.array(*chunks)).alias("bb")
    ).select(id_col, vec_col, "nrm", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na"),
        "band", "key",
    )
    b = banded.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb_"),
        "band", "key",
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb", "na", "nb_")
        .dropDuplicates(["a", "b"])
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nb: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cos: float | None = None,
) -> DataFrame:
    """ANN: exact rescoring restricted to same-bucket candidates.
    ``max_cos`` (exclusive) drops candidates at/above the margin
    BEFORE ranking — the hard-negative-mining gate (near-duplicates
    are positives, not negatives); None keeps plain top-k."""
    from pyspark.sql import Window

    sig = lsh_signature(vec_col, nb, dim)
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(vec_col).alias("n_norm"),
        sig.alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_norm"),
        sig.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            fl6(
                dot("q_vec", "n_vec") / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
        )
    )
    if max_cos is not None:
        scored = scored.filter(F.col("cos_sim") < max_cos)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "(cast(x AS double) - cast(y AS double)) * (cast(x AS double) - cast(y AS double))), "
    "cast(0.0 AS double), (acc, v) -> acc + v)"
)


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column: ``iters`` rounds of
    assign-to-nearest-centroid (Euclidean) + per-position mean
    recompute, returning the final assignment (id, cluster, dist).

    Deterministic + oracle-reproducible: init centroids are the first
    ``k`` vectors, distances are left-to-right double folds rounded to
    6 dp BEFORE the argmin (lowest-centroid-id tiebreak), and recomputed
    centroid components are 6-dp-rounded means — so an engine computing
    partial sums in any order lands on the identical rounded values.

    Scale posture per round: the assignment is a broadcast of the k
    centroids against the corpus (argmin = one map-side struct-min
    aggregate keyed by the vector id — no window sort); the recompute
    is a posexplode → (cluster, pos) partial-agg shuffle whose output
    is k·dim rows regardless of corpus size. Driver holds no row data;
    per-round lineage is truncated with an eager localCheckpoint of the
    k-row centroid relation. With thousands of centroids, swap the
    broadcast argmin for a Pandas-UDF matmul (same note as ivf_cells).
    """
    base = emb.select(F.col(id_col), F.col(vec_col))
    cent = base.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("c_id"),
        F.expr(f"transform({vec_col}, x -> cast(x AS double))").alias("c_vec"),
    )

    def assign(c: DataFrame) -> DataFrame:
        scored = base.crossJoin(F.broadcast(c)).select(
            id_col,
            vec_col,
            F.struct(
                fl6(F.sqrt(F.expr(SQDIST.format(a=vec_col, b="c_vec")))).alias("d"),
                F.col("c_id").alias("c_id"),
            ).alias("dc"),
        )
        return scored.groupBy(id_col).agg(
            F.any_value(vec_col).alias("vec"),
            F.min("dc").alias("best"),
        )

    for _ in range(iters):
        assigned = assign(cent)
        cent = (
            assigned.select(F.col("best")["c_id"].alias("cluster"), F.posexplode("vec"))
            .groupBy("cluster", "pos")
            .agg(
                # quantized mean: exact integer micro-sum / count — the
                # centroid feeds the next iteration, so engine-identical
                # doubles here keep the whole loop in lockstep
                (
                    F.sum(
                        F.floor(
                            F.col("col").cast("double") * F.lit(1e6) + F.lit(0.5)
                        ).cast("long")
                    )
                    / (F.count(F.lit(1)) * F.lit(1e6))
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cluster").alias("c_id"),
                F.expr("transform(pm, s -> s.m)").alias("c_vec"),
            )
            .localCheckpoint(eager=True)
        )
    final = assign(cent)
    return final.select(
        id_col,
        F.col("best")["c_id"].alias("cluster"),
        F.col("best")["d"].alias("dist"),
    )


def semdedup_prune(
    emb: DataFrame,
    ncells: int = 16,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: vectors are coarse-quantized into
    IVF cells, and within each cell a vector is PRUNED when a lower-id
    cell-mate sits above the cosine threshold (its ``keeper``). Output:
    one row per vector — (id, cell, keeper, pruned).

    Kernel: Arrow-batched numpy matmuls, the shape SemDeDup actually
    runs at scale. The centroid matrix (``ncells`` rows — a bounded,
    gated collect) rides to the executors in the closure; assignment
    is a ``mapInPandas`` argmax over one V·Cᵀ product per Arrow batch
    (no join, no checkpoint); the per-cell prune is one
    ``applyInPandas`` over the cell key — a blocked V·Vᵀ product whose
    memory is block×cell, never cell². ONE shuffle total (the cell
    key) vs the previous plan's checkpoint + cell self-join + prune
    join, and the 64-term interpreted fold dots (~157k of them at
    sf0.1) become two BLAS products (measured 1.85 s → ~0.5 s).
    Clustering first bounds the quadratic to cell-mates — skew is
    capped by cell size, which ``ncells`` controls. Centroids are the
    first ``ncells`` vectors so the oracle reproduces the exact
    partition (production would pass k-means centroids — the plan
    shape is unchanged).

    Float parity: all math in float64; sums are numpy pairwise rather
    than the oracle's left-to-right fold — for 64-term dots the
    difference (~1e-16 relative) flips a 6-dp rounding only within
    ~1e-16 of a boundary, negligible across ~160k values.
    """
    import numpy as np
    import pandas as pd

    vec_t = emb.schema[vec_col].dataType.simpleString()
    # Gated driver collect: exactly ncells rows (the centroid set).
    cent_rows = sorted(
        emb.filter(F.col(id_col) < ncells).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    C = np.array([list(r[1]) for r in cent_rows], dtype=np.float64)
    c_ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    c_norms = np.sqrt((C * C).sum(axis=1))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.sqrt((V * V).sum(axis=1))
            sims = np_fl6((V @ C.T) / np.outer(vn, c_norms))
            # argmax returns the FIRST max — c_ids ascend, so ties on
            # the rounded cosine break to the smallest centroid id,
            # matching max_by(struct(sim, -c_id)) and the oracle's
            # ORDER BY sim DESC, c_id ASC.
            cells = c_ids[np.argmax(sims, axis=1)]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "vec": pdf[vec_col], "cell": cells}
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, vec {vec_t}, cell long"
    )

    def prune_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        V = np.array(pdf["vec"].tolist(), dtype=np.float64)
        n = np.sqrt((V * V).sum(axis=1))
        k = len(pdf)
        keeper = ids.copy()
        pruned = np.zeros(k, dtype=bool)
        cols = np.arange(k)
        B = 1024  # block rows: memory is B×k, not k×k
        for s in range(0, k, B):
            e = min(s + B, k)
            S = np_fl6((V[s:e] @ V.T) / np.outer(n[s:e], n))
            # a < b only: ids ascend with column index, so the first
            # qualifying column IS the minimum keeper id.
            valid = (S >= tau) & (cols[None, :] < np.arange(s, e)[:, None])
            has = valid.any(axis=1)
            first = valid.argmax(axis=1)
            keeper[s:e][has] = ids[first[has]]
            pruned[s:e][has] = True
        return pd.DataFrame(
            {id_col: ids, "cell": pdf["cell"], "keeper": keeper, "pruned": pruned}
        )

    return assigned.groupBy("cell").applyInPandas(
        prune_cell, schema=f"{id_col} long, cell long, keeper long, pruned boolean"
    )


def _semdedup_prune_sql(
    emb: DataFrame,
    ncells: int = 16,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-SQL semdedup kernel (the pre-round-3 plan), kept as the
    parity golden for the Arrow kernel: max_by argmax assignment,
    eager-checkpointed corpus, cell self-join + prune join with
    interpreted fold dots. Same output contract."""
    cent = emb.filter(F.col(id_col) < ncells).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    # Eager checkpoint: the assignment subtree (centroid scoring +
    # argmax agg) feeds BOTH sides of the cell self-join and the final
    # left join — without materialization each consumer recomputes the
    # ncells cosine scores per vector (measured ~1.5× the whole query).
    # Storage is one (id, vec, cell) row per vector — corpus-linear.
    corpus = (
        emb.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(cent))
        .select(
            id_col,
            vec_col,
            "c_id",
            fl6(cosine(vec_col, "c_vec")).alias("c_sim"),
        )
        .groupBy(id_col)
        .agg(
            F.any_value(vec_col).alias("vec"),
            F.max_by(
                "c_id", F.struct(F.col("c_sim"), (-F.col("c_id")).alias("neg"))
            ).alias("cell"),
        )
        .localCheckpoint(eager=True)
    )
    a = corpus.select(
        F.col(id_col).alias("a"), F.col("vec").alias("va"), norm("vec").alias("na"), "cell"
    )
    b = corpus.select(
        F.col(id_col).alias("b"), F.col("vec").alias("vb"), norm("vec").alias("nb_"), "cell"
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .select(
            "b",
            F.col("a"),
            fl6(dot("va", "vb") / (F.col("na") * F.col("nb_"))).alias("cs"),
        )
        .filter(F.col("cs") >= tau)
    )
    dup = pairs.groupBy("b").agg(F.min("a").alias("keeper"))
    return (
        corpus.select(id_col, "cell")
        .join(dup, corpus[id_col] == dup["b"], "left")
        .select(
            id_col,
            "cell",
            F.coalesce("keeper", F.col(id_col)).alias("keeper"),
            F.col("keeper").isNotNull().alias("pruned"),
        )
    )


def gram_matrix(
    emb: DataFrame,
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Distributed Gram matrix XᵀX over an embedding column — the
    reduce step of large-scale PCA / whitening / spectral quality
    stats. Output: one row per upper-triangle entry (i ≤ j):
    (i, j, gram), 0-based indices, rounded to ``round_dp``.

    Scale shape: each partition computes its own d×d partial with ONE
    BLAS product (Arrow-batched mapInPandas, accumulated across
    batches so each task emits exactly d(d+1)/2 rows), and the only
    shuffle moves per-partition partials — d² doubles per task, never
    per-row data. At 1000 executors over 100 TB the reduce input is
    1000·d² values regardless of corpus size. Eigen-decomposition of
    the tiny result is a driver-side afterthought (not done here —
    the query surface ends at the matrix, which IS the distributed
    part).

    Float parity: each per-row product is quantized to an exact scaled
    BIGINT before ANY summation (floor(v_i·v_j·10^dp + 0.5), binary on
    numpy/Spark/DuckDB alike), so partition composition, BLAS
    association order, and engine round() semantics all drop out — the
    reduced matrix is an exact integer sum emitted as one quotient.
    """
    import numpy as np
    import pandas as pd

    m = float(10**round_dp)

    def partial(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # chunk rows: the quantized outer-product block is n×d×d
            for s in range(0, len(V), 512):
                W = V[s : s + 512]
                Q = (
                    np.floor(W[:, :, None] * W[:, None, :] * m + 0.5)
                    .astype(np.int64)
                    .sum(axis=0)
                )
                acc = Q if acc is None else acc + Q
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int64"),
                    "j": iu[1].astype("int64"),
                    "partial": acc[iu],
                }
            )

    partials = emb.select(vec_col).mapInPandas(partial, schema="i long, j long, partial long")
    return partials.groupBy("i", "j").agg(
        (F.sum("partial") / F.lit(m)).alias("gram")
    )


def knn_classify(
    emb: DataFrame,
    n_probes: int = 100,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label-vote classification over the embedding corpus — the
    embedding-eval / quality-classifier shape: for each probe vector
    (``id < n_probes``), find its k nearest cosine neighbors among the
    OTHER vectors, majority-vote their labels (count desc, label asc
    tiebreak), and compare to the probe's own label. Output:
    (id, true_label, pred_label, correct).

    Scale shape: the probe matrix is a bounded, gated driver collect
    that rides to executors in the closure (the broadcast-probe-set
    contract shared with ``brute_force_topk``); each partition scores
    its corpus slice against ALL probes with one BLAS product and
    emits only its LOCAL top-k per probe — merging per-partition
    top-k preserves the global top-k, so the shuffle carries
    k·partitions rows per probe, never the corpus. One window on the
    probe key ranks the merged candidates; the vote is a tiny
    aggregate over n_probes·k rows.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    probes = emb.filter(F.col(id_col) < n_probes).select(id_col, vec_col, label_col)
    # Gated driver collect: at most n_probes rows.
    rows = sorted(probes.collect(), key=lambda r: r[0])
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    qn = np.sqrt((Q * Q).sum(axis=1))

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            labels = pdf[label_col].to_numpy()
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.sqrt((V * V).sum(axis=1))
            S = np_fl6((Q @ V.T) / np.outer(qn, vn))  # n_probes × m
            out_q, out_nb, out_lb, out_s = [], [], [], []
            for qi in range(len(q_ids)):
                # ascending (-sim, nb): best-first with id tiebreak
                order = np.lexsort((ids, -S[qi]))
                order = order[ids[order] != q_ids[qi]][:k]  # exclude self
                out_q.extend([q_ids[qi]] * len(order))
                out_nb.extend(ids[order])
                out_lb.extend(labels[order])
                out_s.extend(S[qi][order])
            yield pd.DataFrame(
                {"q": out_q, "nb": out_nb, "nb_label": out_lb, "sim": out_s}
            )

    cand = emb.select(id_col, vec_col, label_col).mapInPandas(
        local_topk, schema="q long, nb long, nb_label int, sim double"
    )
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("nb"))
    top = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    votes = top.groupBy("q", "nb_label").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("q").orderBy(F.desc("c"), F.asc("nb_label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("q", F.col("nb_label").alias("pred_label"))
    )
    return (
        probes.select(F.col(id_col), F.col(label_col).alias("true_label"))
        .join(F.broadcast(pred), F.col(id_col) == F.col("q"))
        .select(
            id_col,
            "true_label",
            "pred_label",
            (F.col("true_label") == F.col("pred_label")).alias("correct"),
        )
    )


def pq_adc_topk(
    emb: DataFrame,
    n_probes: int = 10,
    k: int = 10,
    m: int = 8,
    ncode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (the PQ half of IVF-PQ): vectors are
    encoded as ``m`` sub-space codebook ids; queries score candidates
    with asymmetric distance (ADC) — a sum of ``m`` precomputed
    lookup-table entries instead of a d-dim distance. Output:
    (q_id, n_id, adc_dist, rank) — top-k per probe by approximate L2²
    (asc, id tiebreak), self excluded.

    This is the memory-compression scale path: at 100 TB the corpus
    is stored as m bytes per vector (here m=8 codes vs 256 bytes of
    floats) and scoring never touches the original vectors — encode
    once, then every query is table lookups. Codebooks are the first
    ``ncode`` vectors' sub-vectors (deterministic, so the oracle
    reproduces the exact quantization; production would train them
    with k-means — same plan shape).

    Plan shape: codebooks and the probe LUTs ride in the closure
    (gated ``ncode + n_probes`` row collects); each partition encodes
    its slice with numpy argmins, scores ALL probes via fancy-indexed
    LUT sums, and emits only its local top-k per probe; one window on
    the probe key merges. Distances are rounded to 6 dp BEFORE the
    argmin / before the ADC sum so quantization and ranking are
    engine-reproducible.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    d_probe = emb.filter(F.col(id_col) < n_probes).select(id_col, vec_col)
    cb_rows = sorted(
        emb.filter(F.col(id_col) < ncode).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    q_rows = sorted(d_probe.collect(), key=lambda r: r[0])
    C = np.array([list(r[1]) for r in cb_rows], dtype=np.float64)  # ncode × d
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)  # nq × d
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    dim = C.shape[1]
    dsub = dim // m
    C3 = C.reshape(ncode, m, dsub)
    Q3 = Q.reshape(len(q_rows), m, dsub)
    # LUT[q, s, c] = fl6(||Q[q,s] - C[c,s]||²)
    LUT = np_fl6(
        ((Q3[:, None, :, :] - C3[None, :, :, :]) ** 2).sum(-1)
    ).transpose(0, 2, 1)  # nq × m × ncode

    def local_topk(batches):
        srange = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            V3 = np.array(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            # encode: per subspace, nearest codeword (rounded, id tiebreak
            # via argmin-first-occurrence over ascending code ids)
            dists = np_fl6(
                ((V3[:, None, :, :] - C3[None, :, :, :]) ** 2).sum(-1)
            )  # n × ncode × m
            codes = np.argmin(dists, axis=1)  # n × m
            out_q, out_n, out_d = [], [], []
            for qi in range(len(q_ids)):
                adc = np_fl6(LUT[qi][srange[None, :], codes].sum(1))
                order = np.lexsort((ids, adc))
                order = order[ids[order] != q_ids[qi]][:k]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(ids[order])
                out_d.extend(adc[order])
            yield pd.DataFrame({"q_id": out_q, "n_id": out_n, "adc_dist": out_d})

    cand = emb.select(id_col, vec_col).mapInPandas(
        local_topk, schema="q_id long, n_id long, adc_dist double"
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def l2_brute_topk(
    emb: DataFrame,
    n_probes: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact L2² top-k per probe (``id < n_probes``), self excluded —
    the ground truth the PQ recall gate compares against. Same
    per-partition BLAS + local-top-k-merge shape as ``knn_classify``:
    ||v-q||² = ||v||² + ||q||² - 2·v·q from one V·Qᵀ product."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    rows = sorted(
        emb.filter(F.col(id_col) < n_probes).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_sq = (Q * Q).sum(axis=1)

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            v_sq = (V * V).sum(axis=1)
            D = np_fl6(q_sq[:, None] + v_sq[None, :] - 2.0 * (Q @ V.T))
            out_q, out_n, out_d = [], [], []
            for qi in range(len(q_ids)):
                order = np.lexsort((ids, D[qi]))
                order = order[ids[order] != q_ids[qi]][:k]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(ids[order])
                out_d.extend(D[qi][order])
            yield pd.DataFrame({"q_id": out_q, "n_id": out_n, "l2sq": out_d})

    cand = emb.select(id_col, vec_col).mapInPandas(
        local_topk, schema="q_id long, n_id long, l2sq double"
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("l2sq"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    emb: DataFrame,
    n_probes: int = 10,
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 2,
    m: int = 8,
    ncode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ANN — the canonical billion-scale index: an L2 coarse
    quantizer routes each query to its ``nprobe`` nearest cells, and
    only those cells' members are scored, by PQ-ADC lookup sums
    instead of full-dimension distances. Output: (q_id, n_id,
    adc_dist, rank ≤ k), self excluded. (Simplified from FAISS's
    residual encoding: codes quantize the raw vector, not v−centroid —
    the plan shape is identical and the oracle stays expressible.)

    Scale shape: at 100 TB the corpus is stored as one cell id + m
    code bytes per vector; a query touches ~N·nprobe/ncells codes and
    never a raw float. Centroids and codebooks are bounded gated
    collects riding in the closure; each partition encodes its slice
    once (two numpy argmins), scores only probe-routed members, and
    emits local top-k; one window merges. Everything rounds to 6 dp
    before argmin/ranking for engine reproducibility.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    cent_rows = sorted(
        emb.filter(F.col(id_col) < ncells).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    cb_rows = sorted(
        emb.filter(F.col(id_col) < ncode).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    q_rows = sorted(
        emb.filter(F.col(id_col) < n_probes).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    CENT = np.array([list(r[1]) for r in cent_rows], dtype=np.float64)
    CB = np.array([list(r[1]) for r in cb_rows], dtype=np.float64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    dim = CENT.shape[1]
    dsub = dim // m
    CB3 = CB.reshape(ncode, m, dsub)
    Q3 = Q.reshape(len(q_rows), m, dsub)

    def l2_to_cents(X: np.ndarray) -> np.ndarray:
        return np_fl6(((X[:, None, :] - CENT[None, :, :]) ** 2).sum(-1))

    # Per-probe probed cell sets: nprobe nearest centroids (dist asc,
    # centroid id asc — argsort is stable, ids ascend with column).
    probed = np.argsort(l2_to_cents(Q), axis=1, kind="stable")[:, :nprobe]
    LUT = np_fl6(
        ((Q3[:, None, :, :] - CB3[None, :, :, :]) ** 2).sum(-1)
    ).transpose(0, 2, 1)  # nq × m × ncode

    def local_topk(batches):
        srange = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cells = np.argmin(l2_to_cents(V), axis=1)
            V3 = V.reshape(len(pdf), m, dsub)
            codes = np.argmin(
                np_fl6(((V3[:, None, :, :] - CB3[None, :, :, :]) ** 2).sum(-1)),
                axis=1,
            )
            out_q, out_n, out_d = [], [], []
            for qi in range(len(q_ids)):
                mask = np.isin(cells, probed[qi]) & (ids != q_ids[qi])
                if not mask.any():
                    continue
                cids = ids[mask]
                adc = np_fl6(LUT[qi][srange[None, :], codes[mask]].sum(1))
                order = np.lexsort((cids, adc))[:k]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(cids[order])
                out_d.extend(adc[order])
            yield pd.DataFrame({"q_id": out_q, "n_id": out_n, "adc_dist": out_d})

    cand = emb.select(id_col, vec_col).mapInPandas(
        local_topk, schema="q_id long, n_id long, adc_dist double"
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
