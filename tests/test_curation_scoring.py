"""Semantic checks for the scoring/selection kernels added with the
DSIR / perplexity-banding / keep-best queries (oracle parity is pinned
separately by the registry gate; these pin the SEMANTICS on planted
fixtures)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    # Two clearly separated "domains": en docs share a vocabulary the
    # zh docs never use and vice versa, plus one mixed doc.
    rows = [
        (0, "en", "the cat sat on the mat with the hat"),
        (1, "en", "the dog sat on the log with the cat"),
        (2, "zh", "wu yan liu shui qing shan wu yan"),
        (3, "zh", "qing shan liu shui wu yan qing shan"),
        (4, "zh", "the cat qing shan liu shui on mat"),  # mixed
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dsir_target_docs_score_higher(docs):
    out = {r.doc_id: r.log_ratio for r in TX.dsir_importance(docs).collect()}
    # pure-target docs must outscore pure-off-domain docs, with the
    # mixed doc in between
    assert min(out[0], out[1]) > out[4] > max(out[2], out[3])
    # target-exclusive vocabulary gives positive log ratios
    assert out[0] > 0 and out[2] < 0


def test_dsir_n_tokens(docs):
    out = {r.doc_id: r.n_tokens for r in TX.dsir_importance(docs).collect()}
    assert out[0] == 9 and out[4] == 8


def test_surprise_buckets_cover_and_order(spark):
    # 9 docs: three repeat a common phrase (low surprise), three mix,
    # three carry unique vocabulary (high surprise)
    rows = (
        [(i, "common words common words common") for i in range(3)]
        + [(3 + i, f"common words mixed{i} common extra{i}") for i in range(3)]
        + [(6 + i, f"rare{i} unique{i} vocab{i} token{i} one{i}") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.surprise_buckets(df).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.surprise)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    assert len(out) == 9


def test_keep_best_picks_highest_quality(spark, monkeypatch):
    # Planted near-dup pair (0, 1): doc 1 has richer vocabulary (higher
    # distinct ratio => higher pinned quality score), so it must be the
    # cluster keeper even though doc 0 has the lower id.
    from fluvio_demo_apps_rust_spark.functions import dedup as X

    rows = [
        (0, "the quick brown fox jumps over the lazy dog the quick brown fox"),
        (1, "the quick brown fox jumps over the lazy dog and sly red vixen"),
        (2, "completely different content about spark engines"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "a long, b long")
    clusters = X.connected_components(pairs, d)
    q = d.select("doc_id", TX.quality_columns()[-1])
    j = clusters.join(q, "doc_id")
    best = {
        r.cluster_id: (r.kept_doc, r.n_members)
        for r in j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by(
                F.col("doc_id"),
                F.struct(F.col("quality"), (-F.col("doc_id")).alias("nd")),
            ).alias("kept_doc"),
        )
        .collect()
    }
    assert best[0] == (1, 2)   # richer doc wins the pair's cluster
    assert best[2] == (2, 1)   # singleton keeps itself
