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

# Driver-sampling rotation — ROUND 10 ACTIVE. The correctness driver
# samples the FIRST ~50 registered queries; rounds 1-3 sampled the
# relational/events/cdc prefix, r4 the llm/mining/sketch rotation,
# r5 the staged never-sampled set, r6 the never-driver-green 14 plus
# plan-changed re-confirmations, r7 the 41 r1-3-stale names, r8 the
# llm_url_dedup + 49 r4-stale names, r9 the 16 r8 _FORWARD names +
# 34 r5-stale (50/50 green — cumulative record 198/214 sampled, all
# green). This head is VERDICT r9 task #2: the 16 round-9 additions
# that have never had a driver row (the 15 r9 _FORWARD names plus
# q106_stream_web_frontier, which r9 ADVICE flagged as accidentally
# left out of _FORWARD), then the 5 remaining r5-stale names, then
# the 29 alphabetically-first of the 43 names whose latest driver
# sample is r6 — 16 + 5 + 29 = the 50-query sample EXACTLY. The 14
# remaining r6-stale names (q63_binational_volume, q64_market_share,
# q65–q68, q90–q93, q95, q96, q98, q99) rotate in round 11. New
# round-10 queries land in _FORWARD (positions 51+): locally gated
# this round, rotated into the head next round.
_PRIORITY: tuple[str, ...] = (
    # the 16 round-9 additions — never driver-sampled; MUST get
    # their first CORRECTNESS row this round
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
    "q106_stream_web_frontier",
    "q107_corrupt_quarantine",
    "llm_event_sequences",
    "llm_quality_calibration",
    "llm_stream_quality_monitor",
    "llm_shard_manifest",
    # the 5 remaining r5-stale names (latest sample r5)
    "q83_graph_triangles",
    "q84_market_basket",
    "q85_rfm_segmentation",
    "q86_ewma_smoothing",
    "q89_hll_distinct",
    # the 29 alphabetically-first r6-stale names (latest sample r6)
    "cdc_binlog_real_pet",
    "cdc_incremental_agg",
    "cdc_mixed_workload",
    "cdc_orders_roundtrip",
    "cdc_pet_replay",
    "cdc_scd2",
    "cdc_update_storm",
    "llm_ahash_pairs",
    "llm_audio_fingerprint",
    "llm_image_ahash",
    "llm_multimodal_dedup_clusters",
    "llm_naive_bayes",
    "llm_png_decode",
    "llm_png_resize",
    "llm_video_frames",
    "llm_video_phash",
    "llm_vocab_coverage",
    "llm_wav_decode",
    "llm_winnow_fingerprint",
    "llm_winnow_pairs",
    "q05_nation_volume",
    "q21_part_brand_stats",
    "q43_rank_family",
    "q52_approx_distinct",
    "q57_array_ops",
    "q59_profit_rollup",
    "q60_min_cost_supplier",
    "q61_waiting_suppliers",
    "q62_idle_rich_customers",
)

# Names of queries EXPECTED to be registered later this round. They
# sort directly AFTER the mandatory 50-name head (not inside it), so
# they cannot displace a stale name past the sample boundary; they get
# the full local gate this round and rotate into the head next round.
# Unlike _PRIORITY, missing names here are skipped, not fatal.
_FORWARD: tuple[str, ...] = (
    "llm_bpe_encode_ids",
    "q106_stream_frontier_watermarked",
    "llm_bpe_vocab",
    "llm_tokenizer_fertility",
    "llm_mixture_materialize",
    "llm_pack_token_ids",
    "llm_hard_negatives",
    "q108_stream_token_pack",
    "q109_stream_manifest",
    "llm_preference_pairs",
    "llm_pmi_collocations",
    "llm_snapshot_diff",
    "llm_dsir_resample",
    "llm_tokenizer_heldout",
    "llm_repetition_loops",
    "llm_shard_writer",
    "llm_hard_negatives_lsh",
    "q110_events_user_drift",
    "llm_heaps_law",
    "llm_ngram_novelty",
    "llm_embedding_sq8",
    "q111_decimal_pricing",
    "cdc_sequence_audit",
    "q112_bucketed_join",
    "q113_partition_pruned_scan",
    "llm_stupid_backoff",
    "q114_schema_evolution",
    "llm_dup_rate_sample",
    "q115_column_stats",
    "cdc_tx_histogram",
    "llm_temperature_mixture",
    "q116_max_concurrency",
    "llm_ann_mrr",
    "q117_time_weighted_avg",
    "q118_mad_robust_stats",
    "llm_span_corruption",
    "llm_text_export_roundtrip",
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
