"""Curation operators: contamination, stratified sampling, scrubbing."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions import curation as C


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon"),          # shares 3 shingles w/ bench
        (1, "alpha beta gamma zeta eta"),                # shares 1 shingle w/ bench
        (2, "totally unrelated words here now"),         # shares none
        (3, "one two"),                                  # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )


def test_contamination_counts(corpus, bench):
    out = {
        r.doc_id: r for r in C.benchmark_contamination(corpus, bench).collect()
    }
    # doc 0 is the benchmark text verbatim: all 3 shingles contaminated
    assert out[0].n_shingles == 3 and out[0].n_contaminated == 3
    assert out[0].contamination == 1.0
    # doc 1 shares only "alpha beta gamma"
    assert out[1].n_shingles == 3 and out[1].n_contaminated == 1
    # doc 2 shares nothing
    assert out[2].n_contaminated == 0
    # doc 3 has no shingles → no row (mirrors the oracle's empty unnest)
    assert 3 not in out


def test_stratified_sample_deterministic_and_subset(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zz").alias("lang"),
    )
    s1 = C.stratified_sample(df, "lang", {"en": 0.5}, default_rate=0.1)
    s2 = C.stratified_sample(df, "lang", {"en": 0.5}, default_rate=0.1)
    r1 = sorted(r.doc_id for r in s1.collect())
    assert r1 == sorted(r.doc_id for r in s2.collect())  # reproducible
    by_lang = {
        r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 per stratum: expect ~500 en, ~100 zz; allow generous slack
    assert 400 <= by_lang.get("en", 0) <= 600
    assert 50 <= by_lang.get("zz", 0) <= 160


def test_scrub_numbers_pinned(spark):
    df = spark.createDataFrame(
        [(1, "call 555 0199 now 7 times")], "doc_id long, text string"
    )
    r = df.select("doc_id", *C.scrub_numbers("text")).collect()[0]
    assert r.n_numbers == 3
    assert r.redacted_len == len("call <NUM> <NUM> now <NUM> times")


def test_sequence_pack_matches_sequential_fold(spark):
    """Two-phase prefix sum == sequential concat-then-chunk fold,
    including docs straddling window boundaries."""
    texts = [(i, " ".join(["w"] * ((i * 37) % 900 + 1))) for i in range(200)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in C.sequence_pack(df, budget=512, range_size=16).collect()
    }
    # sequential oracle
    start = 0
    for i, t in texts:
        n = len(t.split())
        r = out[i]
        assert r.n_tokens == n
        assert r.start_offset == start, f"doc {i}"
        assert r.pack_id == start // 512
        assert r.crosses == ((start + n - 1) // 512 != start // 512)
        start += n


def test_sequence_pack_no_global_window(spark):
    """The scale path: no window may order the full corpus in one
    partition — the doc-ordered window must be partitioned by the
    range key; the only unpartitioned window runs on the per-range
    totals (corpus_size / range_size rows)."""
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    plan = C.sequence_pack(df)._jdf.queryExecution().optimizedPlan().toString()
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition" in line
    ]
    assert len(specs) == 2
    doc_specs = [s for s in specs if "doc_id" in s]
    assert len(doc_specs) == 1
    # partition key rk leads the spec: windowspecdefinition(rk#N, doc_id# ...
    assert "windowspecdefinition(rk#" in doc_specs[0]
    # the rk-free window orders the per-range totals stream only
    other = next(s for s in specs if s not in doc_specs)
    assert "rtot" in other


def test_incremental_dedup_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha"), (2, "beta"), (3, "gamma"),
            (4, "alpha"),   # dup of snapshot -> dropped
            (5, "delta"),   # new unique -> kept
            (6, "delta"),   # dup of another NEW doc -> kept (only snapshot dedups)
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in C.incremental_dedup(df).collect())
    assert kept == [5, 6]


def test_repetition_columns_pinned(spark):
    from fluvio_demo_apps_rust_spark.functions import text as TX
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # g2: 5 grams, distinct 2 -> dup2 0.6
            (2, "one two three"),   # no repetition
            (3, "x"),               # too short for 2-grams -> 0.0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in df.select("doc_id", *TX.repetition_columns()).collect()}
    assert rows[1].dup2_frac == 0.6
    assert rows[1].repetitive is True
    assert rows[2].dup2_frac == 0.0 and rows[2].dup3_frac == 0.0
    assert rows[3].dup2_frac == 0.0 and rows[3].repetitive is False


def test_curate_demo_funnel(spark):
    """The end-to-end pipeline demo composes the gated kernels into a
    monotone funnel and produces non-degenerate outputs at smoke SF."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from curate_demo import run

    from .conftest import SF_SMOKE

    funnel = run(spark, SF_SMOKE, pack_budget=256)
    s = funnel["stage_docs"]
    assert (
        s["input"]
        >= s["exact_dedup"]
        >= s["near_dedup"]
        >= s["decontaminated"]
        >= s["quality_gate"]
        > 0
    )
    assert sum(funnel["split_docs"].values()) == s["quality_gate"]
    assert funnel["packing"]["n_packs"] > 0
    for m in funnel["mixture"].values():
        assert m["epochs_micro"] == m["target_tokens"] * 1_000_000 // m["avail_tokens"]
