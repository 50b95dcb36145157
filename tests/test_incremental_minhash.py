"""Semantics pins for the incremental MinHash triage kernel
(functions/dedup.py:incremental_minhash_triage) on synthetic corpora
with KNOWN duplicate structure — independent of the registered query's
DuckDB oracle gate (tools/check_correctness.py covers that)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions.dedup import incremental_minhash_triage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# A handful of multi-shingle texts (>= 3 tokens so word_shingles is
# non-empty); distinct texts chosen to not collide on all 4 LSH bands.
T_A = "the quick brown fox jumps over the lazy dog again and again"
T_B = "pack my box with five dozen liquor jugs for the long trip"
T_C = "sphinx of black quartz judge my vow said the tired scribe"


def test_exact_dup_of_snapshot_is_always_flagged(spark):
    # snapshot: ids 0,1; increment: ids 10 (copy of 0), 11 (fresh)
    d = _docs(
        spark,
        [(0, T_A), (1, T_B), (10, T_A), (11, T_C)],
    )
    out = incremental_minhash_triage(d, F.col("doc_id") >= 10).collect()
    status = {r.doc_id: r.status for r in out}
    # identical text => identical signature => identical buckets in
    # every band => can never be admitted
    assert status[10] == "dup_snapshot"
    assert status[11] == "admit"
    assert set(status) == {10, 11}  # snapshot rows are not emitted


def test_within_batch_dup_blames_the_smaller_id(spark):
    # snapshot: id 0; increment: 10 and 11 are copies of each other
    # (not of the snapshot) -> 10 admits, 11 is dup_batch
    d = _docs(spark, [(0, T_B), (10, T_A), (11, T_A)])
    out = incremental_minhash_triage(d, F.col("doc_id") >= 10).collect()
    status = {r.doc_id: r.status for r in out}
    assert status[10] == "admit"
    assert status[11] == "dup_batch"


def test_snapshot_hit_wins_over_batch_hit(spark):
    # 10 and 11 are copies of snapshot doc 0 AND of each other:
    # both must be dup_snapshot (triage precedence), not dup_batch
    d = _docs(spark, [(0, T_A), (10, T_A), (11, T_A)])
    out = incremental_minhash_triage(d, F.col("doc_id") >= 10).collect()
    assert {r.status for r in out} == {"dup_snapshot"}


def test_statuses_partition_the_increment(spark):
    d = _docs(
        spark,
        [(0, T_A), (1, T_B), (10, T_A), (11, T_B), (12, T_C), (13, T_C)],
    )
    out = incremental_minhash_triage(d, F.col("doc_id") >= 10).collect()
    status = {r.doc_id: r.status for r in out}
    assert set(status) == {10, 11, 12, 13}
    assert status[10] == "dup_snapshot"
    assert status[11] == "dup_snapshot"
    assert status[12] == "admit"
    assert status[13] == "dup_batch"
