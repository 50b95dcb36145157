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

# Driver-sampling rotation — ROUND 7 ACTIVE. The correctness driver
# samples the FIRST ~50 registered queries; rounds 1-3 sampled the
# relational/events/cdc prefix, r4 the llm/mining/sketch rotation,
# r5 the staged never-sampled set, r6 the never-driver-green 14 plus
# plan-changed re-confirmations (50/50 green — every registered query
# has now been driver-green at least once). This head is VERDICT r6
# task #1: the 41 queries last driver-sampled in rounds 1-3, whose
# shared kernels (apply update-run coalescing, codec, text helpers)
# changed under them since their last green row — followed by NEW
# round-7 queries (_FORWARD), then plan-changed / top-risk r6
# re-confirmations as fill.
_PRIORITY: tuple[str, ...] = (
    # the 41 stale names (last sampled r1-r3) — MUST be sampled
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q04_semi_join",
    "q06_revenue_delta",
    "q07_anti_join",
    "q08_left_join_agg",
    "q09_having",
    "q10_set_ops",
    "q11_topk_per_group",
    "q12_running_total",
    "q13_lag_gap",
    "q14_rollup",
    "q15_cube",
    "q16_grouping_sets",
    "q17_global_topk",
    "q18_distinct_count",
    "q19_scalar_funcs",
    "q20_case_agg",
    "q22_order_lineitem_stats",
    "q23_datetime_funcs",
    "q30_events_tumbling",
    "q31_events_sliding",
    "q32_events_session",
    "q33_events_dedup",
    "q34_events_json_props",
    "q35_events_rate",
    "q36_events_gapfill",
    "q37_stream_windowed",
    "q38_stream_dedup",
    "q39_stream_late_data",
    "q71_events_funnel",
    "q72_events_cohort",
    "q73_stream_session",
    "q74_stream_stateful",
    "q75_events_anomaly",
    "q76_events_transitions",
    "q78_trajectory_similarity",
    "cdc_replica_join",
    "cdc_scd2_asof",
    "cdc_stream_stats",
    "llm_dedup_exact",
    # plan-changed this round (source-overlap cap, bigram-lm constant,
    # q97 floor-div, typed-replay GEOMETRY) + top-risk r6 kernels
    "llm_source_overlap",
    "llm_bigram_lm",
    "q97_rolling_distinct",
    "cdc_binlog_typed_replay",
    "q94_sessionization",
    "llm_substring_dedup",
    "llm_incremental_minhash",
    "llm_simhash",
    "llm_multimodal_dedup_clusters",
)

# Names of queries EXPECTED to be registered later this round (the
# driver may snapshot the registry at round start, but if it samples
# after they land they should sort ahead of already-green names).
# Unlike _PRIORITY, missing names here are skipped, not fatal.
_FORWARD: tuple[str, ...] = (
    "cdc_binlog_geometry",
    "llm_crossdedup_transfer",
    "llm_minhash_ann_hybrid",
    "q100_stream_chained_agg",
    "llm_rouge_overlap",
    "llm_udf_tokenize_arrow",
    "llm_langid_confusion",
    "llm_quality_ablation",
    "llm_dedup_audit",
)


def _rotate_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # fail loudly: a typo here silently demotes a query
        raise ValueError(f"_PRIORITY names not in REGISTRY: {missing}")
    head = [n for n in _PRIORITY[:41]] + [n for n in _FORWARD if n in REGISTRY]
    head += [n for n in _PRIORITY[41:] if n not in head]
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
