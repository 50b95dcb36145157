#!/usr/bin/env python
"""Measure how representative queries scale across sf0.001 → 0.01 → 0.1
and write docs/SCALING.md.

The point: at local[32] a ×10 data step should cost ≤ ×10 wall time.
A growth ratio well under 10 means the query is still fixed-overhead
dominated (scheduler/JVM jobs, Python worker round trips) — at cluster
scale those amortize and throughput is the plan shape; a ratio near 10
means compute-bound linear (what we want to see before claiming 100 TB
readiness); a ratio clearly above 10 (beyond host noise) is a
superlinear plan — a quadratic join, a densifying window — and a bug
against the scale posture, worth a plan audit.

Usage:
  python tools/scale_probe.py                 # full probe (~25 min)
  python tools/scale_probe.py name [name ...] # incremental: probe only
        the given QUERIES names, merge into the stored results
        (docs/scaling_probe_results.json), regenerate SCALING.md.
        Requires a prior full run so every other row has a result.

Run on an otherwise idle host — co-tenant load swings wall times ±50%.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fluvio_demo_apps_rust_spark.plans import REGISTRY
from fluvio_demo_apps_rust_spark.session import get_spark

SFS = ["0.001", "0.01", "0.1"]
# One or two per family, biased to the shuffle-heavy shapes where a
# superlinear regression would actually show.
QUERIES = [
    "q01_pricing_summary",
    "q05_nation_volume",
    "q30_events_tumbling",
    "q50_asof_join",
    "cdc_mixed_workload",
    "llm_dedup_exact",
    "llm_dedup_ngram_jaccard",
    "llm_minhash_lsh_pairs",
    "llm_ann_lsh",
    "llm_semdedup",
    "llm_sequence_pack",
    # sketch family: fixed-size mergeable state, growth should track the
    # scan alone (register/counter count is constant in input size)
    "q82_kmv_distinct",
    "q89_hll_distinct",
    "llm_countmin_heavyhitters",
    # quantile sketch (fixed 256-bucket state) and the seeded global
    # shuffle (top-k merge path; the full-sort variant is range-
    # partitioned by the uniform hash key)
    "q90_histogram_quantiles",
    "llm_global_shuffle",
    # per-row-compute-bound (Horner/winnow chain): the one family whose
    # growth SHOULD approach the x10 data step once overhead amortizes
    "llm_winnow_fingerprint",
    # r6 single-partition-window fixes (r5 verdict #3): all three now
    # run on bucketed/level-histogram prefix sums — probed so any
    # regression back toward a global-window densification shows as a
    # growth-ratio jump (q90 is probed above already)
    "q43_rank_family",
    "llm_vocab_coverage",
    # r6 streaming arbitrary-state operator
    "q94_sessionization",
    # r6 real-media codecs (per-row Python compute-bound, like winnow:
    # growth should head toward the x10 data step) and the Bloom
    # bitset (fixed-size mergeable state: growth tracks the scan)
    "llm_png_decode",
    "llm_wav_decode",
    "q95_bloom_semijoin",
    # late-r6 modality dedup keys: decode-heavy Arrow mapInPandas
    # (compute-bound like winnow) feeding posting-list / star-edge
    # shuffles — the shapes where a quadratic fan-out would show
    "llm_ahash_pairs",
    "llm_multimodal_dedup_clusters",
    # late-r6 sliding distinct: contribution fan-out (x7 explode) —
    # linear by construction, probed to pin it
    "q97_rolling_distinct",
    # r7 additions (VERDICT r6 #2): llm_simhash's 2.4x oracle ratio was
    # the one unexplained perf number — a flat x10 step here means
    # JVM-stage-floor on a tiny denominator, a steep one is a real
    # finding. The other four are the heaviest r6 kernels that had no
    # probe row (substring gram shuffle, snapshot-vs-increment triage,
    # capped posting-list pair fan-out, interpolated-LM score join).
    "llm_simhash",
    "llm_substring_dedup",
    "llm_incremental_minhash",
    "llm_source_overlap",
    "llm_bigram_lm",
    # r8 additions: the sf-dependent new queries — URL canonicalize
    # (all-codegen strings + one hash agg), the 4-granularity dedup
    # audit (one scan, x4 explode), ROUGE-2 over LSH candidates
    # (gram-keyed join restricted to pairs — a quadratic fan-out would
    # show here), the hybrid verify (pair-linear 64-term dots), and the
    # Arrow tokenizer harness (Python worker round-trip floor).
    "llm_url_dedup",
    "llm_dedup_audit",
    "llm_rouge_overlap",
    "llm_minhash_ann_hybrid",
    "llm_udf_tokenize_arrow",
    # late-r8: exact selection medians — multi-pass histograms whose
    # driver/window state is bounded by value range, so growth should
    # track the (repeated) scans alone
    "q101_selection_median",
    "q102_grouped_median",
    # closing r8: the sharded sequential fold (greedy packing) and the
    # 6-threshold broadcast cross-tab — the fold is the one shape in
    # the suite whose per-shard work is inherently serial, so its
    # growth should track shard size (linear) with the Arrow round
    # trip as the floor
    "llm_greedy_pack_audit",
    "llm_dedup_threshold_sweep",
    # r9 (VERDICT r8 #6): the last sf-dependent r8 queries with no probe
    # row — cross-source transfer (two filtered dedups + one audit agg)
    # and the chained-watermark / stream-static streaming pair (their
    # sources scale with sf even though the machinery floor dominates
    # at these sizes). Plus the r9 additions: batched-BPE train+apply
    # (vocabulary-sized training aggregates + one corpus join), the
    # all-codegen HTML extractor (row-local regex — growth should head
    # toward the data step once the stage floor amortizes), and the
    # mixed-sign selection median (same bounded-histogram shape as
    # q101, probed to pin the floor-division bin change).
    "llm_crossdedup_transfer",
    "q100_stream_chained_agg",
    "q103_stream_static_enrich",
    "llm_bpe_tokenize",
    "llm_html_extract",
    "q105_negative_median",
    # late r9: the new composed funnels (stage-chained anti-joins /
    # ledger aggregates over proven kernels — probed because the
    # COMPOSITION is a new shuffle chain even when each kernel is
    # covered), the 8-gram decontam explode (wider than the probed
    # 3-gram shape), the JL projection (row-local folds — should be
    # flat), and the Arrow BPE apply (corpus-scale Python path with
    # word memoization).
    "llm_web_pipeline",
    "llm_dedup_cascade",
    "llm_decontam_ngram_overlap",
    "llm_random_projection",
    "llm_bpe_tokenize_arrow",
    # the per-user ranked-window sequence prep (a new window shape:
    # corpus-wide row_number partitioned by a 150-to-15k-key column)
    "llm_event_sequences",
    # r10 (VERDICT r9 #7): the salted-join two-phase shape (the salted
    # AGG stays exempt — same two-phase kernel), triangle enumeration
    # (a two-hop self-join, the one graph shape with no probed twin),
    # PERMISSIVE corrupt-record ingest over sf-scaled JSON, the
    # bounded-buffer shard-manifest fold (repartition + sortWithin +
    # chained-md5 Arrow pass — a NEW physical shape), and the Arrow
    # token-id encoder (corpus-scale Python path + vocab closure).
    "q69_skew_salted_join",
    "q83_graph_triangles",
    "q107_corrupt_quarantine",
    "llm_shard_manifest",
    "llm_bpe_encode_ids",
    # r11 (VERDICT r10 #6): the heaviest additions that sat in EXEMPT
    # with only sibling evidence — the LSH hard-negative miner (banded
    # join + per-bucket dot verify), the held-out BPE apply (train on
    # split A, apply to split B — a second corpus join the tokenize
    # probe doesn't cover), the trigram backoff LM (three n-gram
    # aggregates + a scored join), and the two-phase interval sweep
    # (bucketed running sums + bucket-offset prefix).
    "llm_hard_negatives_lsh",
    "llm_tokenizer_heldout",
    "llm_stupid_backoff",
    "q116_max_concurrency",
    # r11 additions: the coverage sweep (a NEW two-phase decomposition —
    # per-row entry counts, not per-bucket scalars), the one-shuffle
    # max_by changelog compaction, and the adaptive-threshold priority
    # sampler (window input bounded by construction — probed to pin it).
    "q119_interval_coverage",
    "cdc_changelog_compaction",
    "llm_priority_sample",
    # the exact-recall prefix-filter join: a NEW candidate-generation
    # scheme (rare-token prefixes, no banding) — probed so a fan-out
    # regression (e.g. losing the frequency ordering) shows as growth.
    "llm_allpairs_prefix_join",
    # r12: span-trim materialization — positional gram join (no per-doc
    # pre-agg: positions are the payload) + per-doc merge window +
    # row-local reassembly; probed because the positional shuffle is
    # strictly heavier than the probed llm_substring_dedup's.
    "llm_substring_trim",
    # r12: overlap-sessionization (merge_intervals in the events
    # domain) — a per-user running-max window over sf-linear rows;
    # probed to pin the window pass stays linear.
    "q120_visit_spans",
    # r12 (VERDICT r11 #6): bench heavies promoted out of the
    # relational exemption — the bucketed-write+exchange-free-join
    # fixture and the rebuilt two-pass column-stats plan get their own
    # probe rows.
    "q112_bucketed_join",
    "q115_column_stats",
    # r13: CCNet paragraph dedup — chunk explode + corpus-wide exact
    # count + ORDERED per-doc reassembly (a new fold shape: the ordered
    # collect_list group is doc-length-bounded but rides a second
    # shuffle); probed to pin the reassembly stays linear. And the
    # attribution range join — per-user bounded time-window fan-out
    # with three per-conversion windows; probed because the fan-out is
    # the one data-dependent term.
    "llm_paragraph_dedup",
    "q122_attribution",
]

# Every registered query that is NOT probed must appear here with the
# reason its scaling is already evidenced. main() refuses to run (and
# tests/test_scale_probe_coverage.py fails) on any unclassified name,
# so a new query cannot silently skip the policy (r9 VERDICT task #7).
EXEMPT_GROUPS: list[tuple[str, list[str]]] = [
    (
        "fixed-fixture CDC replay: input is the recorded pet-scenario "
        "binlog / 9-event fixture, not sf — wall time cannot scale with "
        "the probe axis",
        [
            "cdc_binlog_geometry",
            "cdc_binlog_real_pet",
            "cdc_binlog_replay",
            "cdc_binlog_rotation_replay",
            "cdc_binlog_typed_replay",
            "cdc_pet_replay",
            "cdc_replica_join",
        ],
    ),
    (
        "same render→decode CDC kernel as the probed "
        "cdc_mixed_workload (sf-linear wire events through codec.py, "
        "then operators/apply.py or a constant-output audit aggregate)",
        [
            "cdc_orders_roundtrip",
            "cdc_update_storm",
            "cdc_incremental_agg",
            "cdc_scd2",
            "cdc_scd2_asof",
            "cdc_sequence_audit",
            "cdc_tx_histogram",
        ],
    ),
    (
        "fixture-constant streaming check: the microbatch count and "
        "per-batch row volume are pinned by the test harness (hand-built "
        "files / bounded availableNow drains), so sf does not reach the "
        "input; the streaming machinery floor is probed via "
        "q100_stream_chained_agg / q103_stream_static_enrich / "
        "q94_sessionization",
        [
            "cdc_stream_stats",
            "q37_stream_windowed",
            "q38_stream_dedup",
            "q39_stream_late_data",
            "q70_stream_interval_join",
            "q73_stream_session",
            "q74_stream_stateful",
            "q91_stream_hll",
            "q96_stream_countmin",
            "q99_stream_outer_join",
            "q121_stream_full_outer",
            "llm_stream_incremental_dedup",
            "llm_stream_quality_monitor",
            "q106_stream_web_frontier",
            "q106_stream_frontier_watermarked",
            "q108_stream_token_pack",
            "q109_stream_manifest",
        ],
    ),
    (
        "single-shuffle relational Catalyst shape (scan → join/agg/"
        "window/setop, no novel shuffle chain): q01/q05/q43/q50 probe "
        "the family's heaviest members; q51's bucketed range join is "
        "the q50 as-of bucket kernel; q55's salted agg is the two-phase "
        "kernel whose join twin q69 is probed",
        [
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
            "q21_part_brand_stats",
            "q22_order_lineitem_stats",
            "q23_datetime_funcs",
            "q40_pivot",
            "q41_percentiles",
            "q42_ordered_agg",
            "q44_range_frame",
            "q45_full_outer",
            "q46_cross_join",
            "q47_setops_all",
            "q48_correlated_subqueries",
            "q49_scalar_library",
            "q51_range_join",
            "q53_unpivot",
            "q54_lateral_explode",
            "q55_skew_salted_agg",
            "q56_sample_hash",
            "q57_array_ops",
            "q58_disjunctive_join",
            "q59_profit_rollup",
            "q60_min_cost_supplier",
            "q61_waiting_suppliers",
            "q62_idle_rich_customers",
            "q63_binational_volume",
            "q64_market_share",
            "q65_value_windows",
            "q66_shipmode_buckets",
            "q67_order_count_histogram",
            "q68_large_orders",
            "q80_weighted_sample",
            "q81_zorder_layout",
            "q85_rfm_segmentation",
            "q104_skew_profile",
            "q111_decimal_pricing",
            # r13: one scan + one map-side-combinable 6-sum moment
            # aggregate, |groups| output rows
            "q124_regression_stats",
        ],
    ),
    (
        "events-table single-window/agg shape: q30_events_tumbling and "
        "q94_sessionization probe the family's scan + keyed-window "
        "kernels",
        [
            "q31_events_sliding",
            "q32_events_session",
            "q33_events_dedup",
            "q34_events_json_props",
            "q35_events_rate",
            "q36_events_gapfill",
            "q71_events_funnel",
            "q72_events_cohort",
            "q75_events_anomaly",
            "q76_events_transitions",
            "q86_ewma_smoothing",
            "q110_events_user_drift",
            "q113_partition_pruned_scan",
            "q114_schema_evolution",
            "q117_time_weighted_avg",
            # r13: per-user min agg + distinct (cohort, offset, user) —
            # the probed q94/q30 scan + keyed-agg kernels; the permille
            # join is weeks-count-sized
            "q123_retention_triangle",
        ],
    ),
    (
        "bounded probe-set similarity join: output and join fan-out are "
        "fixed by the probe rows, only the scan side scales (probed via "
        "the relational reps)",
        ["q77_ts_similarity", "q78_trajectory_similarity"],
    ),
    (
        "fixed-size mergeable sketch state: growth tracks the scan "
        "alone; q82_kmv_distinct / q89_hll_distinct / "
        "q90_histogram_quantiles / llm_countmin_heavyhitters probe the "
        "class",
        [
            "q52_approx_distinct",
            "q87_ams_join_size",
            "q88_kmv_setops",
            "q92_hll_setops",
            "q93_hll_rollup",
            "q98_approx_percentile",
            # r13: the Bloom bitmap is a fixed-size (m/60-row) mergeable
            # bit_or sketch; probe and ground-truth joins track the scan
            "llm_bloom_dedup",
        ],
    ),
    (
        "iterative bounded-state loop (per-round checkpointed joins, "
        "driver holds only the model/labels/histograms): per-round "
        "volume is the probed join/agg shapes; "
        "llm_multimodal_dedup_clusters probes the label-propagation "
        "rounds and q101_selection_median the histogram-selection "
        "passes q118 composes twice",
        ["q79_pagerank", "llm_kmeans", "llm_quality_lr",
         "q118_mad_robust_stats"],
    ),
    (
        "capped pair fan-out over banded/posting-list candidates: "
        "llm_ahash_pairs / llm_rouge_overlap / llm_minhash_lsh_pairs "
        "probe the stop-band-capped pair kernels",
        [
            "q84_market_basket",
            "llm_winnow_pairs",
            "llm_simhash_pairs",
            "llm_minhash_jaccard_est",
            "llm_containment_dedup",
            "llm_dedup_fuzzy_verify",
            "llm_preference_pairs",
        ],
    ),
    (
        "dedup kernel sibling of the probed llm_dedup_exact / "
        "llm_minhash_lsh_pairs / llm_substring_dedup / "
        "llm_multimodal_dedup_clusters rows (same signature, banding, "
        "posting-list or star-edge shuffles)",
        [
            "llm_minhash_signature",
            "llm_chunk_dedup",
            "llm_doc_chunking",
            "llm_line_boilerplate",
            "llm_incremental_dedup",
            "llm_dup_rate_sample",
            "llm_ngram_novelty",
            "llm_dedup_clusters",
            "llm_dedup_keep_best",
            "llm_fingerprint",
            # r13: llm_minhash_jaccard_est with a % 16 per component —
            # same banded candidates and signature re-join
            "llm_minhash_bbit",
        ],
    ),
    (
        "row-local text scoring / classification + bounded aggregate "
        "(codegen expressions or broadcast stats; no corpus-keyed "
        "shuffle): llm_html_extract, llm_winnow_fingerprint and "
        "llm_bigram_lm probe the row-local class ceiling",
        [
            "llm_langid",
            "llm_langid_confusion",
            "llm_sentiment",
            "llm_text_quality",
            "llm_gopher_rules",
            "llm_c4_clean",
            "llm_doc_repetition",
            "llm_repetition_loops",
            "llm_span_corruption",
            "llm_token_stats",
            "llm_pii_scrub",
            "llm_surprise_buckets",
            # r13: the probed llm_bigram_lm kernel + a value-histogram
            # threshold pass (q101 selection pattern, domain-bounded)
            "llm_perplexity_buckets",
            "llm_unigram_surprise",
            "llm_dsir_importance",
            "llm_tfidf_topterms",
            "llm_bm25_topk",
            "llm_vocab_entropy",
            "llm_heaps_law",
            "llm_wer_eval",
            "llm_quality_ablation",
            "llm_quality_calibration",
            "llm_naive_bayes",
            "llm_bpe_merge_counts",
            "llm_pmi_collocations",
            "llm_robots_filter",
            "llm_corpus_profile",
            "llm_corpus_report",
        ],
    ),
    (
        "ANN/embedding sibling of the probed llm_ann_lsh / llm_semdedup "
        "rows (bounded codebooks and probe sets; blocked BLAS kernels "
        "shared)",
        [
            "llm_ann_topk",
            "llm_ann_ivf",
            "llm_ann_pq",
            "llm_ann_ivf_pq",
            "llm_ann_recall",
            "llm_ann_pq_recall",
            "llm_knn_classify",
            "llm_ann_mrr",
            "llm_gram_matrix",
            "llm_embedding_neardup",
            "llm_hard_negatives",
            "llm_embedding_sq8",
            "llm_ann_multiprobe",
        ],
    ),
    (
        "multimodal codec sibling of the probed llm_png_decode / "
        "llm_wav_decode / llm_ahash_pairs rows (same Arrow decode "
        "kernels, different derived key)",
        [
            "llm_png_resize",
            "llm_image_ahash",
            "llm_audio_fingerprint",
            "llm_video_frames",
            "llm_video_phash",
            "llm_multimodal_frames",
            "llm_multimodal_meta",
            "llm_multimodal_resize",
        ],
    ),
    (
        "tokenizer artifact/eval over the probed BPE training kernel: "
        "llm_bpe_tokenize probes the training aggregates and the "
        "corpus word-explode + vocab-join shape; the vocab table is "
        "charset-bounded and fertility adds only a ≤#langs-row "
        "aggregate on top of the same join",
        ["llm_bpe_vocab", "llm_tokenizer_fertility"],
    ),
    (
        "curation one-scan + bounded aggregate over probed kernels "
        "(llm_sequence_pack probes the two-phase prefix sums, "
        "llm_global_shuffle the salted-hash determinism path, "
        "llm_dedup_cascade the composed-funnel chain)",
        [
            "llm_stratified_sample",
            "llm_domain_mixture",
            "llm_epoch_upsample",
            "llm_mixture_materialize",
            "llm_pack_token_ids",
            "llm_train_split",
            "llm_contamination",
            "llm_pretrain_prep",
            "llm_curation_pipeline",
            "llm_snapshot_diff",
            "llm_dsir_resample",
            "llm_shard_writer",
            "llm_temperature_mixture",
            "llm_text_export_roundtrip",
        ],
    ),
]
EXEMPT: dict[str, str] = {
    name: reason for reason, names in EXEMPT_GROUPS for name in names
}

OUT = Path(__file__).resolve().parent.parent / "docs" / "SCALING.md"

# Emitted verbatim at the end of every regenerated SCALING.md — standing
# context that must survive re-probes (this file is fully overwritten).
STANDING_NOTES = """
## Probe coverage policy (r10 — total classification)

EVERY registered query is either probed above or exempted below with
its reason (r9 VERDICT task #7). The partition is machine-checked two
ways: main() refuses to run on an unclassified/stale name, and
tests/test_scale_probe_coverage.py pins QUERIES ∪ EXEMPT == REGISTRY
(disjoint) on every pytest run, so a new query cannot register without
being classified. The probe list is biased to each family's
shuffle-heaviest shape; a probed row stands in for same-kernel
siblings. Any NEW shuffle or explode shape must get its own probed row
(the r8/r9/r10 additions above follow that rule).
"""

PIL_NOTES = """
## PIL parity test status (r8)

tests/test_media_png.py's `test_native_decode_matches_stdlib_codec`
and `test_jpeg_decodes_via_pil_dispatch` are skipif-gated on Pillow.
This build environment's policy FORBIDS package installation (no
pip/apt — driver brief, environment section), so the attempt the r7
verdict suggested is policy-blocked, not technically blocked: the
tests have never executed here and "PIL == stdlib codec" remains
asserted by construction (identical RGB8 contract) rather than by
evidence. They are written to run unmodified in any Pillow-equipped
CI/executor environment; the first such run is the remaining
verification step for the native-decode 100 TB posture.
"""


def _time_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# One EXTRA ×10 decade for the pair-join dedup family (r12 VERDICT #6):
# these are the only queries whose cost is genuinely data-dependent
# (candidate growth follows the near-duplicate / shingle-frequency
# structure), so they get a 4th point on the synthetic ~sf1 documents
# fixture from tools/probe_fixture.py (50k docs, Heaps-law vocabulary —
# see that module's docstring for why a closed-vocab ×10 would measure
# vocabulary saturation, not plan scaling). Stored under the "1syn" key
# and rendered as two extra columns for exactly these rows.
DECADE = [
    "llm_allpairs_prefix_join",
    "llm_substring_dedup",
    "llm_substring_trim",
    "llm_source_overlap",
]


def coverage_errors() -> list[str]:
    """Non-empty iff the QUERIES/EXEMPT partition of the registry is
    broken (unclassified, stale, or doubly-classified names)."""
    probed, exempt, reg = set(QUERIES), set(EXEMPT), set(REGISTRY)
    errs = []
    if probed & exempt:
        errs.append(f"both probed and exempt: {sorted(probed & exempt)}")
    if reg - probed - exempt:
        errs.append(f"unclassified queries: {sorted(reg - probed - exempt)}")
    if (probed | exempt) - reg:
        errs.append(f"stale (unregistered) names: {sorted((probed | exempt) - reg)}")
    return errs


RESULTS = Path(__file__).resolve().parent.parent / "docs" / "scaling_probe_results.json"


def main() -> int:
    errs = coverage_errors()
    if errs:
        for e in errs:
            print(f"COVERAGE ERROR: {e}")
        return 1
    subset = sys.argv[1:]
    bad = [n for n in subset if n not in QUERIES]
    if bad:
        print(f"ERROR: not in QUERIES (probe list): {bad}")
        return 1
    prior: dict[str, dict[str, float]] = {}
    if RESULTS.exists():
        prior = {
            k: v for k, v in json.loads(RESULTS.read_text()).items() if k in QUERIES
        }
    if subset:
        missing = [n for n in QUERIES if n not in prior and n not in subset]
        if missing:
            print(
                "ERROR: incremental mode needs a stored result for every "
                f"other QUERIES name; missing {len(missing)}: {missing[:5]}... "
                "— run a full probe first."
            )
            return 1
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = dict(prior) if subset else {}
    for name in subset or QUERIES:
        results[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            t = min(_time_once(spark, name, sf_dir) for _ in range(2))
            results[name][sf] = t
            print(f"{name} sf{sf}: {t:.3f}s", flush=True)
    # the extra ×10 decade for the pair-join family (synthetic fixture)
    decade_names = [n for n in DECADE if n in (subset or QUERIES)]
    if decade_names:
        from tools.probe_fixture import generate as _gen_decade_fixture

        syn_dir = str(_gen_decade_fixture())
        for name in decade_names:
            t = min(_time_once(spark, name, syn_dir) for _ in range(2))
            results[name]["1syn"] = t
            print(f"{name} sf1syn: {t:.3f}s", flush=True)
    results = {n: results[n] for n in QUERIES if n in results}
    RESULTS.write_text(json.dumps(results, indent=1) + "\n")

    lines = [
        "# Scaling probe (local[32], min of 2 runs per point)\n",
        "Generated by `python tools/scale_probe.py`. Each ×10 data step",
        "should cost ≤ ×10 wall time; see the tool docstring for how to",
        "read the growth ratios (≪10 = overhead-dominated, ≈10 = linear",
        "compute-bound, >10 = superlinear plan bug).\n",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | ×(.01/.001) | ×(.1/.01) | sf1syn (s) | ×(1syn/.1) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, ts in results.items():
        g1 = ts["0.01"] / ts["0.001"] if ts["0.001"] else float("nan")
        g2 = ts["0.1"] / ts["0.01"] if ts["0.01"] else float("nan")
        if "1syn" in ts:
            g3 = ts["1syn"] / ts["0.1"] if ts["0.1"] else float("nan")
            extra = f" {ts['1syn']:.3f} | {g3:.1f} |"
        else:
            extra = " — | — |"
        lines.append(
            f"| {name} | {ts['0.001']:.3f} | {ts['0.01']:.3f} | {ts['0.1']:.3f} "
            f"| {g1:.1f} | {g2:.1f} |{extra}"
        )
    worst = max(
        (ts["0.1"] / ts["0.01"] for ts in results.values() if ts["0.01"]),
        default=float("nan"),
    )
    lines.append(
        f"\nWorst ×10-step growth this run: **{worst:.1f}×** "
        "(≤10 ⇒ no superlinear plan in the probed set)."
    )
    decade_done = [n for n in DECADE if "1syn" in results.get(n, {})]
    if decade_done:
        worst3 = max(
            results[n]["1syn"] / results[n]["0.1"]
            for n in decade_done
            if results[n].get("0.1")
        )
        lines.append(
            "\nThe `sf1syn` column is the EXTRA ×10 decade for the pair-join "
            "dedup family only, measured on the synthetic 50k-doc Heaps-law "
            "fixture from `tools/probe_fixture.py` (see its docstring: a "
            "closed-vocab ×10 of the driver fixture would measure vocabulary "
            "saturation — sum(shingle-freq²) grows ×100 by construction — "
            "not plan scaling). Worst pair-family ×10 step on that decade: "
            f"**{worst3:.1f}×**."
        )
    lines.append(STANDING_NOTES)
    lines.append(
        f"### Exemptions ({len(EXEMPT)} queries, by reason)\n"
    )
    for reason, names in EXEMPT_GROUPS:
        lines.append(f"- **{reason}**:")
        lines.append("  " + ", ".join(f"`{n}`" for n in names))
    lines.append(PIL_NOTES)
    OUT.write_text("\n".join(lines) + "\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
