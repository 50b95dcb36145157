"""Declared query surface: import all query modules (registration is a
side effect) and expose the registry in driver-contract form."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import REGISTRY, QuerySpec  # noqa: F401
from . import relational  # noqa: F401  (registers queries)
from . import events  # noqa: F401
from . import cdc  # noqa: F401
from . import llm  # noqa: F401
from . import advanced  # noqa: F401
from . import mining  # noqa: F401

# Driver-sampling rotation — ROUND 9 ACTIVE. The correctness driver
# samples the FIRST ~50 registered queries; rounds 1-3 sampled the
# relational/events/cdc prefix, r4 the llm/mining/sketch rotation,
# r5 the staged never-sampled set, r6 the never-driver-green 14 plus
# plan-changed re-confirmations, r7 the 41 r1-3-stale names, r8 the
# llm_url_dedup + 49 r4-stale llm/mining/ANN/sketch names (50/50
# green). This head is VERDICT r8 task #2: the 16 round-8 _FORWARD
# names that have never had a driver row (all green in the judge's
# local gate), then the 34 alphabetically-first of the 39 names whose
# latest driver sample is r5 (the oldest evidence in the book) —
# 16 + 34 = the 50-query sample EXACTLY, so nothing is displaced past
# the boundary. The 5 remaining r5-stale names (q83_graph_triangles,
# q84_market_basket, q85_rfm_segmentation, q86_ewma_smoothing,
# q89_hll_distinct) rotate in round 10. New round-9 queries land in
# _FORWARD (positions 51+): locally gated this round, rotated into
# the head next round.
_PRIORITY: tuple[str, ...] = (
    # the 16 round-8 _FORWARD names — never driver-sampled; MUST get
    # their first CORRECTNESS row this round
    "llm_langid_confusion",
    "llm_dedup_audit",
    "llm_quality_ablation",
    "llm_rouge_overlap",
    "llm_crossdedup_transfer",
    "llm_udf_tokenize_arrow",
    "llm_minhash_ann_hybrid",
    "q100_stream_chained_agg",
    "q101_selection_median",
    "cdc_binlog_rotation_replay",
    "q102_grouped_median",
    "q103_stream_static_enrich",
    "llm_corpus_profile",
    "q104_skew_profile",
    "llm_dedup_threshold_sweep",
    "llm_greedy_pack_audit",
    # the 34 alphabetically-first r5-stale names (latest sample r5)
    "llm_corpus_report",
    "llm_dedup_keep_best",
    "llm_epoch_upsample",
    "llm_global_shuffle",
    "llm_gram_matrix",
    "llm_knn_classify",
    "llm_multimodal_frames",
    "llm_multimodal_meta",
    "llm_multimodal_resize",
    "llm_quality_lr",
    "llm_sentiment",
    "llm_stream_incremental_dedup",
    "llm_train_split",
    "llm_vocab_entropy",
    "q40_pivot",
    "q41_percentiles",
    "q42_ordered_agg",
    "q44_range_frame",
    "q45_full_outer",
    "q46_cross_join",
    "q47_setops_all",
    "q48_correlated_subqueries",
    "q49_scalar_library",
    "q50_asof_join",
    "q51_range_join",
    "q53_unpivot",
    "q54_lateral_explode",
    "q55_skew_salted_agg",
    "q56_sample_hash",
    "q58_disjunctive_join",
    "q69_skew_salted_join",
    "q79_pagerank",
    "q80_weighted_sample",
    "q81_zorder_layout",
)

# Names of queries EXPECTED to be registered later this round. They
# sort directly AFTER the mandatory 50-name head (not inside it), so
# they cannot displace a stale name past the sample boundary; they get
# the full local gate this round and rotate into the head next round.
# Unlike _PRIORITY, missing names here are skipped, not fatal.
_FORWARD: tuple[str, ...] = (
    "llm_bpe_tokenize",
    "llm_bpe_tokenize_arrow",
    "llm_html_extract",
    "llm_robots_filter",
    "llm_web_pipeline",
    "llm_wer_eval",
    "llm_decontam_ngram_overlap",
    "q105_negative_median",
    "llm_random_projection",
    "llm_dedup_cascade",
    "q107_corrupt_quarantine",
    "llm_event_sequences",
    "llm_quality_calibration",
    "llm_stream_quality_monitor",
    "llm_shard_manifest",
)


def _rotate_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # fail loudly: a typo here silently demotes a query
        raise ValueError(f"_PRIORITY names not in REGISTRY: {missing}")
    head = list(dict.fromkeys(_PRIORITY))
    head += [n for n in _FORWARD if n in REGISTRY and n not in head]
    prioritized = set(head)
    ordered = head + [n for n in REGISTRY if n not in prioritized]
    snapshot = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_rotate_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.headline}
