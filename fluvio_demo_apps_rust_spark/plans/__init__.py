"""Declared query surface: import all query modules (registration is a
side effect) and expose the registry in driver-contract form."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import REGISTRY, QuerySpec  # noqa: F401
from .canonical_order import ORDER as _CANONICAL
from . import relational  # noqa: F401  (registers queries)
from . import events  # noqa: F401
from . import cdc  # noqa: F401
from . import llm  # noqa: F401
from . import advanced  # noqa: F401
from . import mining  # noqa: F401

# Driver-sampling rotation — ROUND 11 ACTIVE. The correctness driver
# samples the FIRST ~50 registered queries; rounds 1-3 sampled the
# relational/events/cdc prefix, r4 the llm/mining/sketch rotation,
# r5 the staged never-sampled set, r6 the never-driver-green 14, r7
# the 41 r1-3-stale names, r8 llm_url_dedup + 49 r4-stale, r9 the 16
# r8 _FORWARD names + 34 r5-stale, r10 the 16 r9 additions + 5
# r5-stale + 29 r6-stale (50/50 green — cumulative 214/251 sampled,
# all green). This head is VERDICT r10 task #1: the 37 round-10-
# continuation additions that have never had a driver row
# (alphabetical), then 13 of the 14 remaining r6-stale names —
# 37 + 13 = the 50-query sample EXACTLY. q99_stream_outer_join is
# slot 51 (first in _FORWARD; it already has a green r6 driver row,
# so 251/251 driver-confirmed closes this round regardless) — lead
# the r12 head with it. New round-11 queries land in _FORWARD
# (positions 52+): locally gated this round, rotated in next round.
_PRIORITY: tuple[str, ...] = (
    # the 37 round-10-continuation additions — never driver-sampled;
    # MUST get their first CORRECTNESS row this round
    "cdc_sequence_audit",
    "cdc_tx_histogram",
    "llm_ann_mrr",
    "llm_bpe_encode_ids",
    "llm_bpe_vocab",
    "llm_dsir_resample",
    "llm_dup_rate_sample",
    "llm_embedding_sq8",
    "llm_hard_negatives",
    "llm_hard_negatives_lsh",
    "llm_heaps_law",
    "llm_mixture_materialize",
    "llm_ngram_novelty",
    "llm_pack_token_ids",
    "llm_pmi_collocations",
    "llm_preference_pairs",
    "llm_repetition_loops",
    "llm_shard_writer",
    "llm_snapshot_diff",
    "llm_span_corruption",
    "llm_stupid_backoff",
    "llm_temperature_mixture",
    "llm_text_export_roundtrip",
    "llm_tokenizer_fertility",
    "llm_tokenizer_heldout",
    "q106_stream_frontier_watermarked",
    "q108_stream_token_pack",
    "q109_stream_manifest",
    "q110_events_user_drift",
    "q111_decimal_pricing",
    "q112_bucketed_join",
    "q113_partition_pruned_scan",
    "q114_schema_evolution",
    "q115_column_stats",
    "q116_max_concurrency",
    "q117_time_weighted_avg",
    "q118_mad_robust_stats",
    # 13 of the 14 remaining r6-stale names
    "q63_binational_volume",
    "q64_market_share",
    "q65_value_windows",
    "q66_shipmode_buckets",
    "q67_order_count_histogram",
    "q68_large_orders",
    "q90_histogram_quantiles",
    "q91_stream_hll",
    "q92_hll_setops",
    "q93_hll_rollup",
    "q95_bloom_semijoin",
    "q96_stream_countmin",
    "q98_approx_percentile",
)

# Names of queries EXPECTED to be registered later this round. They
# sort directly AFTER the mandatory 50-name head (not inside it), so
# they cannot displace a stale name past the sample boundary; they get
# the full local gate this round and rotate into the head next round.
# Unlike _PRIORITY, missing names here are skipped, not fatal.
_FORWARD: tuple[str, ...] = (
    "q99_stream_outer_join",
    # round-11 additions (locally gated this round, head next round)
    "q119_interval_coverage",
    "cdc_changelog_compaction",
    "llm_priority_sample",
    "llm_allpairs_prefix_join",
)


def _rotate_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # fail loudly: a typo here silently demotes a query
        raise ValueError(f"_PRIORITY names not in REGISTRY: {missing}")
    head = list(dict.fromkeys(_PRIORITY))
    head += [n for n in _FORWARD if n in REGISTRY and n not in head]
    prioritized = set(head)
    # The tail follows canonical_order.ORDER, NOT raw registration
    # order — module organization (import order, intra-file position)
    # can never reshuffle the driver-visible enumeration. Names missing
    # from ORDER sort last in registration order; the registry-order
    # test fails loudly until they are appended to ORDER.
    ordered = head + [n for n in _CANONICAL if n in REGISTRY and n not in prioritized]
    listed = set(ordered)
    ordered += [n for n in REGISTRY if n not in listed]
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
