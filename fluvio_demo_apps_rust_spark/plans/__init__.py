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

# Driver-sampling rotation — ROUND 14 ACTIVE. The correctness driver
# samples the FIRST ~50 registered queries; rounds 1-3 sampled the
# relational/events/cdc prefix, r4 the llm/mining/sketch rotation,
# r5 the staged never-sampled set, r6 the never-driver-green 14, r7
# the 41 r1-3-stale names, r8 llm_url_dedup + 49 r4-stale, r9 the 16
# r8 _FORWARD names + 34 r5-stale, r10 the 16 r9 additions + 5
# r5-stale + 29 r6-stale, r11 the 37 r10-continuation additions + 13
# r6-stale, r12 q99 + the 4 r11 additions + 45 r7-stale, r13 the 7
# r12 _FORWARD leftovers + 43 r8-stale (50/50 green — cumulative
# 257/257 sampled). This head is the committed ROUND-14 RECIPE from
# the r13 _FORWARD comment, mechanical: ALL 16 r13 _FORWARD names —
# the 7 r8-stale remainder first, then the 9 never-driver-sampled
# round-13 additions (sampling them closes cumulative driver coverage
# at 266/266) — then fill to 50 with the 34 alphabetically-first
# r9-stale names (the oldest driver rows at round-14 open).
_PRIORITY: tuple[str, ...] = (
    # the 7 r8-stale names that didn't fit the r13 head
    "llm_unigram_surprise",
    "llm_url_dedup",
    "q70_stream_interval_join",
    "q77_ts_similarity",
    "q82_kmv_distinct",
    "q87_ams_join_size",
    "q88_kmv_setops",
    # the 9 round-13 additions — never driver-sampled; their first
    # CORRECTNESS row closes cumulative coverage at 266/266
    "llm_paragraph_dedup",
    "llm_ann_multiprobe",
    "q122_attribution",
    "q121_stream_full_outer",
    "llm_bloom_dedup",
    "q123_retention_triangle",
    "llm_minhash_bbit",
    "llm_perplexity_buckets",
    "q124_regression_stats",
    # 34 of the 50 r9-stale names (alphabetical; oldest driver rows)
    "cdc_binlog_rotation_replay",
    "llm_corpus_profile",
    "llm_corpus_report",
    "llm_crossdedup_transfer",
    "llm_dedup_audit",
    "llm_dedup_keep_best",
    "llm_dedup_threshold_sweep",
    "llm_epoch_upsample",
    "llm_global_shuffle",
    "llm_gram_matrix",
    "llm_greedy_pack_audit",
    "llm_knn_classify",
    "llm_langid_confusion",
    "llm_minhash_ann_hybrid",
    "llm_multimodal_frames",
    "llm_multimodal_meta",
    "llm_multimodal_resize",
    "llm_quality_ablation",
    "llm_quality_lr",
    "llm_rouge_overlap",
    "llm_sentiment",
    "llm_stream_incremental_dedup",
    "llm_train_split",
    "llm_udf_tokenize_arrow",
    "llm_vocab_entropy",
    "q100_stream_chained_agg",
    "q101_selection_median",
    "q102_grouped_median",
    "q103_stream_static_enrich",
    "q104_skew_profile",
    "q40_pivot",
    "q41_percentiles",
    "q42_ordered_agg",
    "q44_range_frame",
)

# Names expected to rotate into the head next round (they sort
# directly AFTER the mandatory 50-name head, not inside it). Unlike
# _PRIORITY, missing names here are skipped, not fatal.
#
# ROUND-15 HEAD RECIPE (mechanical): the 16 r9-stale remainder names
# below first, then fill to 50 with the oldest-driver-row names at
# that point (the r10-stale families), alphabetical.
_FORWARD: tuple[str, ...] = (
    # the 16 r9-stale names that didn't fit the r14 head
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
