#!/usr/bin/env python
"""End-to-end curation pipeline demo: the stages a pretraining data
pipeline actually runs, chained over the testdata documents table with
this repo's kernels, printing one JSON funnel summary.

    python tools/curate_demo.py [sf_dir]      # default /root/testdata/sf0.01

Stages (each is the registered, oracle-gated kernel — this script only
composes them):

1. exact dedup        functions/dedup.py:exact_dup_clusters
2. near-dup clusters  minhash_wide -> lsh_band_buckets_wide ->
                      lsh_candidate_pairs -> connected_components
3. decontamination    functions/curation.py:benchmark_contamination
4. quality gate       functions/text.py:gopher_columns (`passes`)
5. train/val/test     salted-hash 80/10/10 (llm_train_split semantics)
6. epoch/mixture plan per-lang token supply vs integer targets
7. sequence packing   functions/curation.py:sequence_pack

Every decision is a pure function of content/ids (md5-based), so the
funnel is reproducible across engines, partitionings, and re-runs —
the property the whole repo is built around.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions import curation as C
from fluvio_demo_apps_rust_spark.functions import dedup as X
from fluvio_demo_apps_rust_spark.functions import text as T
from fluvio_demo_apps_rust_spark.session import get_spark


def run(spark, sf_dir: str, pack_budget: int = 512) -> dict:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    funnel: dict = {"sf_dir": sf_dir, "stage_docs": {}}
    funnel["stage_docs"]["input"] = d.count()

    # 1. exact dedup: keep one doc per content hash
    keep_exact = X.exact_dup_clusters(d).select(
        F.col("keep_id").alias("doc_id")
    )
    d1 = d.join(keep_exact, "doc_id")
    funnel["stage_docs"]["exact_dedup"] = d1.count()

    # 2. near-dup: MinHash -> LSH bands -> candidate pairs -> clusters,
    # keep each cluster's min id
    wide = X.minhash_wide(d1)
    buckets = X.lsh_band_buckets_wide(wide)
    pairs = X.lsh_candidate_pairs(buckets)
    clusters = X.connected_components(pairs, d1)
    d2 = d1.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
    )
    funnel["stage_docs"]["near_dedup"] = d2.count()

    # 3. decontamination: every 50th doc plays the held-out benchmark;
    # drop anything sharing >20% of its shingles with it
    bench = d2.filter(F.col("doc_id") % 50 == 0)
    corpus = d2.filter(F.col("doc_id") % 50 != 0)
    cont = C.benchmark_contamination(corpus, bench)
    clean_ids = cont.filter(F.col("contamination") <= 0.2).select("doc_id")
    d3 = corpus.join(clean_ids, "doc_id")
    funnel["stage_docs"]["decontaminated"] = d3.count()

    # 4. quality gate — the language-agnostic Gopher subset (word-count
    # bounds, mean word length, symbol ratio). The full `passes`
    # conjunction also demands >= 2 ENGLISH function words, which
    # rightly zeroes this synthetic multilingual corpus — real
    # pipelines pick the stopword list per language bucket.
    d4 = (
        d3.select("*", *T.gopher_columns())
        .filter(
            (F.col("n_words") >= 30)
            & (F.col("mean_word_len") >= 3)
            & (F.col("mean_word_len") <= 10)
            & (F.col("symbol_ratio") <= 0.1)
        )
        .select(d3.columns)
    )
    funnel["stage_docs"]["quality_gate"] = d4.count()

    # 5. train/val/test split (salted hash, stable under append/reorder)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    tagged = d4.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    funnel["split_docs"] = {
        r["split"]: r["n"]
        for r in tagged.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    train = tagged.filter(F.col("split") == "train").drop("split")

    # 6. epoch/mixture plan over the surviving train set
    tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    avail = (
        train.select(
            F.when(F.col("lang").isin("en", "de", "fr"), F.col("lang"))
            .otherwise("other")
            .alias("lang_bucket"),
            tok.alias("tok"),
        )
        .groupBy("lang_bucket")
        .agg(F.sum("tok").cast("long").alias("avail_tokens"))
    )
    targets = {"en": 1_000_000, "de": 400_000, "fr": 400_000, "other": 200_000}
    funnel["mixture"] = {
        r["lang_bucket"]: {
            "avail_tokens": r["avail_tokens"],
            "target_tokens": targets[r["lang_bucket"]],
            "epochs_micro": targets[r["lang_bucket"]] * 1_000_000 // r["avail_tokens"],
        }
        for r in avail.collect()
    }

    # 7. pack the train docs into fixed context windows
    packed = C.sequence_pack(train, budget=pack_budget)
    agg = packed.agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum(F.col("crosses").cast("long")).alias("n_crossing"),
    ).first()
    funnel["packing"] = {
        "budget": pack_budget,
        "n_packs": agg.n_packs,
        "n_docs_crossing_boundary": agg.n_crossing,
    }
    return funnel


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    spark = get_spark("curate_demo")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, sf_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
