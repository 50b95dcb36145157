"""Cross-pins for the token-id surface: the Arrow id encoder, the JVM
tokenize chain, the vocab table, and the trained state must all agree
with each other — independent paths through the same trained table.
(The DuckDB oracles gate each query against SQL retraining; these
tests gate them against EACH OTHER, which catches a bug that shifts
two paths the same way relative to SQL but differently between
themselves.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def test_encode_ids_count_matches_jvm_tokenize(spark):
    """llm_bpe_encode_ids (Arrow path, per-word id expansion) and
    llm_bpe_tokenize (JVM replace chain) count the same tokens for
    every document — an id sequence has exactly one id per token."""
    ids = REGISTRY["llm_bpe_encode_ids"].fn(spark, SF_SMOKE).select("doc_id", "n_ids")
    toks = (
        REGISTRY["llm_bpe_tokenize"].fn(spark, SF_SMOKE).select("doc_id", "n_tokens")
    )
    diff = ids.join(toks, "doc_id").where(F.col("n_ids") != F.col("n_tokens"))
    assert diff.count() == 0


def test_vocab_ids_dense_base_first(spark):
    rows = REGISTRY["llm_bpe_vocab"].fn(spark, SF_SMOKE).collect()
    ids = sorted(r.id for r in rows)
    assert ids == list(range(len(rows))), "vocab ids not dense from 0"
    assert len({r.token for r in rows}) == len(rows), "duplicate tokens"
    n_base = sum(1 for r in rows if not r.is_merged)
    for r in rows:
        if r.is_merged:
            assert r.id >= n_base and r.token_len > 1
        else:
            assert r.id < n_base and r.token_len == 1


def test_bpe_state_reconstruction_lossless(spark):
    """BPE merges never lose characters: stripping the spaces from any
    word's trained spaced state reproduces the word exactly."""
    from fluvio_demo_apps_rust_spark.functions.text import (
        bpe_spaced_state,
        bpe_train,
    )
    from fluvio_demo_apps_rust_spark.functions.text import tokens as tx_tokens

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    words = (
        d.select(F.explode(tx_tokens("text")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    state, _ = bpe_train(bpe_spaced_state(words))
    broken = state.where(
        F.replace(F.trim("s"), F.lit(" "), F.lit("")) != F.col("w")
    )
    assert broken.count() == 0
