"""Unit pins for the mining kernels (plans/mining.py): the Morton
interleave is an exact bijection, PageRank conserves (damped) mass and
iterates to the analytic fixed point on a hand-built graph, and the
weighted sampler's keep rate tracks the weight ratio."""

from __future__ import annotations

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.plans.mining import _interleave

from .conftest import SF_SMOKE


def _py_interleave(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_interleave_matches_python_reference(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("cx"), (F.col("id") / 16).cast("long").alias("dy")
    )
    rows = df.select(
        "cx", "dy", F.expr(_interleave("cx", "dy", bits=4)).alias("z")
    ).collect()
    assert len(rows) == 256
    seen = set()
    for r in rows:
        assert r.z == _py_interleave(r.cx, r.dy, bits=4)
        seen.add(r.z)
    # bijective on the 4-bit × 4-bit grid
    assert seen == set(range(256))


def test_pagerank_mass_and_uniformity(spark):
    """On the real tables: every rank ≥ the 0.15/N base, total damped
    mass ≤ 1 + ε (dangling mass only leaks, never appears)."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    rows = REGISTRY["q79_pagerank"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    total = sum(r.pagerank_micro for r in rows) / 1e6
    base = 0.15 / 25 * 1e6
    for r in rows:
        assert r.pagerank_micro >= base - 1  # rounding slack
    assert 0.15 <= total <= 1.0 + 1e-6


def test_countmin_never_undercounts(spark):
    """The defining count-min guarantee: estimate ≥ exact for every
    probed key (equality when no bucket collision)."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    rows = REGISTRY["llm_countmin_heavyhitters"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.cm_estimate >= r.exact_count
        assert r.overcount == r.cm_estimate - r.exact_count


def test_kmv_estimate_tracks_exact(spark):
    """KMV is deterministic (fixed hash): the estimate must equal the
    exact count when a group has < k distinct users, and stay within
    the k=64 sketch's error envelope otherwise."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY
    from fluvio_demo_apps_rust_spark.plans.mining import _KMV_K

    rows = REGISTRY["q82_kmv_distinct"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.exact_distinct >= _KMV_K:
            assert abs(r.kmv_estimate - r.exact_distinct) <= 0.6 * r.exact_distinct
        else:
            # sketch holds the whole set; (k-1)*space/h_k is still an
            # estimator, just a very tight one
            assert abs(r.kmv_estimate - r.exact_distinct) <= max(
                5, 0.6 * r.exact_distinct
            )


def test_quality_lr_trains(spark):
    """GD must actually move the weights off the zero init, and the
    reported accuracy must be a coherent fraction."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    r = REGISTRY["llm_quality_lr"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.b_micro, row.w1_micro, row.w2_micro) != (0, 0, 0)
    assert 0 <= row.n_correct <= row.n_total
    assert row.n_total > 0


def test_ams_estimate_brackets_exact(spark):
    """AMS is an unbiased F₂ estimator with variance ≤ 2F₂²/k: with
    k=16 and a fixed hash the (deterministic) estimate must land
    within a wide constant factor of the exact self-join size."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    r = REGISTRY["q87_ams_join_size"].fn(spark, SF_SMOKE).collect()
    assert len(r) == 1
    row = r[0]
    assert row.exact_f2 > 0
    assert 0.2 * row.exact_f2 <= row.ams_estimate <= 5 * row.exact_f2


def test_naive_bayes_confusion_is_a_partition(spark):
    """The confusion matrix must partition the corpus: cell counts sum
    to the total document count and every language appears as an
    actual row."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY
    from fluvio_demo_apps_rust_spark.plans.base import load

    rows = REGISTRY["llm_naive_bayes"].fn(spark, SF_SMOKE).collect()
    d = load(spark, SF_SMOKE, "documents")
    n_docs = d.count()
    langs = {r.lang for r in d.select("lang").distinct().collect()}
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.actual for r in rows} == langs
    assert all(r.predicted in langs for r in rows)


def test_weighted_sample_tracks_weights(spark):
    """Orders with larger totalprice must be kept at a higher rate:
    compare the sampled fraction of the top price quartile vs the
    bottom quartile on sf0.001."""
    from fluvio_demo_apps_rust_spark.plans.base import load
    from fluvio_demo_apps_rust_spark.functions.curation import (
        SAMPLE_BUCKETS,
        sample_uniform,
    )

    o = load(spark, SF_SMOKE, "orders")
    mx = o.agg(F.max("o_totalprice").alias("maxp"))
    kept = o.crossJoin(F.broadcast(mx)).withColumn(
        "kept",
        sample_uniform(F.col("o_orderkey")).cast("double") * F.col("maxp")
        < F.col("o_totalprice") * F.lit(float(SAMPLE_BUCKETS)),
    )
    med = o.approxQuantile("o_totalprice", [0.5], 0.01)[0]
    hi = kept.filter(F.col("o_totalprice") >= med).agg(
        F.avg(F.col("kept").cast("double"))
    ).first()[0]
    lo = kept.filter(F.col("o_totalprice") < med).agg(
        F.avg(F.col("kept").cast("double"))
    ).first()[0]
    assert hi > lo > 0


def test_hll_estimate_brackets_exact(spark):
    """HLL sanity on the real events table: every group's estimate is
    within the 3-sigma band (sigma = 1.04/sqrt(256) ~= 6.5% relative)
    of the exact distinct, and the linear-counting branch engages at
    smoke scale (15 distinct users -> estimate within 2 of exact, not
    the uncorrected raw HLL ~190)."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    rows = REGISTRY["q89_hll_distinct"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r.hll_estimate - r.exact_distinct) <= 2 + 0.2 * r.exact_distinct
        if r.exact_distinct <= 100:  # LC regime
            assert abs(r.hll_estimate - r.exact_distinct) <= 2


def test_histogram_quantile_within_bucket(spark):
    """The equi-width-histogram estimator's defining bound: the
    estimate lands within one bucket width of the rank-exact quantile,
    and both columns are monotone across p50 < p90 < p99."""
    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.plans import REGISTRY
    from fluvio_demo_apps_rust_spark.plans.base import load

    rows = sorted(
        REGISTRY["q90_histogram_quantiles"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.p_bp,
    )
    assert [r.p_bp for r in rows] == [5000, 9000, 9900]
    o = load(spark, SF_SMOKE, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    mm = o.agg(F.min("c").alias("mn"), F.max("c").alias("mx")).first()
    width = (mm.mx - mm.mn + 1) // 256 + 1
    for r in rows:
        assert abs(r.est_cents - r.exact_cents) <= width
    assert rows[0].exact_cents <= rows[1].exact_cents <= rows[2].exact_cents
    assert rows[0].est_cents <= rows[1].est_cents <= rows[2].est_cents


def test_hll_rollup_equals_direct_daily_fold(spark):
    """Max-merge associativity, the property the rollup economics rest
    on: merging the per-hour register tables per day yields the same
    estimate as folding each day's raw rows directly (here: the q89
    estimator grouped by day instead of event_type)."""
    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.plans import REGISTRY
    from fluvio_demo_apps_rust_spark.plans.events import _events
    from fluvio_demo_apps_rust_spark.plans.mining import (
        _HLL_M,
        _hll_est_col,
    )

    rolled = {
        r.day_start: r.hll_estimate
        for r in REGISTRY["q93_hll_rollup"].fn(spark, SF_SMOKE).collect()
    }
    e = _events(spark, SF_SMOKE)
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.expr(f"hv DIV {_HLL_M}")
    direct = (
        e.select(F.date_trunc("day", "ts").alias("d"), hv.alias("hv"))
        .select(
            "d",
            (F.col("hv") % _HLL_M).alias("idx"),
            F.when(w == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin(w)))
            .alias("rho"),
        )
        .groupBy("d", "idx")
        .agg(F.max("rho").alias("mx"))
        .groupBy("d")
        .agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mx AS INT))"))
                + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(1 << 53)
            ).alias("denom"),
            (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v"),
        )
        .select(
            F.col("d").cast("long").alias("day_start"),
            _hll_est_col(F.col("denom"), F.col("v")).alias("est"),
        )
    )
    direct_map = {r.day_start: r.est for r in direct.collect()}
    assert rolled == direct_map and len(rolled) > 0


def test_global_shuffle_full_sort_is_range_partitioned(spark):
    """The scale claim behind llm_global_shuffle: ordering the whole
    corpus by the salted hash key is a RANGE-partitioned sort (uniform
    key space, no skew), not a single-partition collapse."""
    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.plans.base import load

    d = load(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shuffle:42:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("shuffle_key"),
    )
    plan = (
        d.orderBy("shuffle_key", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
