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
