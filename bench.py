#!/usr/bin/env python
"""Benchmark harness: runs the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query executes to completion through the noop sink (full compute,
no driver collect). BENCH_QUERIES covers every operator family:
scan-agg, multi-way join, broadcast star join, windows, event-time
windows, CDC replay, dedup/LSH, ANN, text analysis.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fluvio_demo_apps_rust_spark.plans import REGISTRY
from fluvio_demo_apps_rust_spark.session import get_spark

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_nation_volume",
    "q06_revenue_delta",
    "q08_left_join_agg",
    "q11_topk_per_group",
    "q14_rollup",
    "q30_events_tumbling",
    "q32_events_session",
    "q50_asof_join",
    "q51_range_join",
    "q55_skew_salted_agg",
    "cdc_pet_replay",
    "cdc_orders_roundtrip",
    "cdc_mixed_workload",
    "llm_dedup_exact",
    "llm_text_quality",
    "llm_dedup_ngram_jaccard",
    "llm_minhash_lsh_pairs",
    "llm_simhash",
    "llm_ann_topk",
    "llm_ann_lsh",
    "llm_ann_ivf",
    "llm_dedup_clusters",
    "llm_sequence_pack",
    "llm_semdedup",
    "llm_doc_repetition",
    "llm_countmin_heavyhitters",
    "q85_rfm_segmentation",
    # round 4 additions (sketch family growth documented in BASELINE.md:
    # totals before r4 exclude these two, compare per-query/per-family)
    "q89_hll_distinct",
    "q90_histogram_quantiles",
    # round 6 additions (r5 verdict #5): the measured compute-bound
    # winnow kernel (docs/SCALING.md 4.0x per x10 step), the seeded
    # range-partitioned global shuffle, the salted-hash split, and a
    # binary binlog-v4 parse+replay — totals before r6 exclude these
    # four, compare per-query/per-family
    "llm_winnow_fingerprint",
    "llm_global_shuffle",
    "llm_train_split",
    "cdc_binlog_replay",
    # late round-6 additions: the REAL-decode modality dedup keys
    # (image aHash + banded pairs, cross-modality cluster resolution)
    # — Python-decode compute-bound like winnow; note the DuckDB
    # oracles compute CLOSED FORMS, not decodes, so the per-query
    # ratio for these is documented as not apples-to-apples in
    # BASELINE.md. Totals before late-r6 exclude these three.
    "llm_image_ahash",
    "llm_ahash_pairs",
    "llm_multimodal_dedup_clusters",
    # round 7 additions (r6 verdict #4): the heavy late-r6 kernels that
    # had no bench row — substring-gram corpus-frequency shuffle,
    # streaming sessionization (applyInPandasWithState), snapshot-vs-
    # increment MinHash triage, capped source-overlap posting fan-out,
    # and the real FVID-walk video phash. Totals before r7 exclude
    # these five, compare per-query/per-family.
    "llm_substring_dedup",
    "q94_sessionization",
    "llm_incremental_minhash",
    "llm_source_overlap",
    "llm_video_phash",
    # round 8 addition: URL/host-canonicalization dedup (the web-
    # pipeline first stage) — all-codegen string canonicalization +
    # one hash-aggregate shuffle. Totals before r8 exclude it.
    "llm_url_dedup",
    # round 9 additions (r8 verdict #3): the 4 heaviest previously
    # unbenched r8 queries per docs/SCALING.md — threshold sweep over
    # per-pair MinHash estimates, ROUGE-2 overlap, LSH-proposes/
    # cosine-disposes hybrid dedup, and exact global median via
    # bounded histogram selection. Totals before r9 exclude these
    # four (44-query list), compare per-query/per-family.
    "llm_dedup_threshold_sweep",
    "llm_rouge_overlap",
    "llm_minhash_ann_hybrid",
    "q101_selection_median",
    # round 10 additions (r9 verdict #5): the 4 heaviest previously
    # unbenched r9 queries per docs/SCALING.md — the staged dedup
    # funnel (URL → exact → MinHash → semantic with a single-scan
    # ledger), BPE train+apply through the JVM replace chain and
    # through the production Arrow iterator, and the composed web
    # pipeline (canonicalize → robots → dedup → extract). Totals
    # before r10 exclude these four (48-query list), compare
    # per-query/per-family.
    "llm_dedup_cascade",
    "llm_bpe_tokenize",
    "llm_bpe_tokenize_arrow",
    "llm_web_pipeline",
    # round 11 additions (r10 verdict #3): the 20 round-10-continuation
    # queries (q110..llm_text_export_roundtrip) plus the LSH
    # hard-negative miner r10 verdict #6 called out — every registered
    # query family now has bench coverage. Totals before r11 exclude
    # these 21 (52-query list), compare per-query/per-family.
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
    "llm_hard_negatives_lsh",
    # round 12 additions (r11 verdict #3): the 4 round-11 queries and
    # the one streaming join that had no bench row. Totals before r12
    # exclude these five (73-query list), compare per-query/per-family.
    "q119_interval_coverage",
    "cdc_changelog_compaction",
    "llm_priority_sample",
    "llm_allpairs_prefix_join",
    "q99_stream_outer_join",
    # late round-12 additions: the 5 heaviest probed-but-unbenched rows
    # per docs/scaling_probe_results.json with non-recursive oracles
    # (chained streaming agg, span-trim materialization, cross-source
    # dedup transfer, stream-static enrichment over the sf-linear
    # events stream, negative-value histogram median).
    # llm_tokenizer_heldout was considered and REJECTED: its oracle is
    # the ~700 s recursive-CTE BPE class the honest subtotal already
    # excludes — benching it would balloon every oracle run for a row
    # the convention ignores. Totals before these exclude the five
    # (78-query list), compare per-query/per-family.
    "q100_stream_chained_agg",
    "llm_substring_trim",
    "llm_crossdedup_transfer",
    "q103_stream_static_enrich",
    "q105_negative_median",
    # round 13 additions (r12 verdict #3): every remaining probed row
    # with a non-recursive oracle, heaviest first per
    # docs/scaling_probe_results.json, plus the three r12-named
    # candidates (q96 stream count-min, winnow pair join, containment
    # dedup). llm_tokenizer_heldout / llm_bpe_encode_ids /
    # llm_greedy_pack_audit stay REJECTED: their oracles are the
    # recursive-CTE class the honest subtotal excludes. The two media
    # decode rows (wav/png) are real stdlib decodes vs closed-form
    # oracles — same not-apples-to-apples caveat as the other media
    # rows in BASELINE.md. Totals before r13 exclude these 18
    # (83-query list), compare per-query/per-family.
    "q95_bloom_semijoin",
    # q83_graph_triangles was next by probe weight but is REJECTED for
    # the same reason as the BPE rows: its DuckDB oracle (two-hop
    # self-join without Spark's degree-ordered orientation) costs 255 s
    # at sf0.1 — benching it would balloon every oracle run for a row
    # the honest subtotal would have to exclude anyway. The two next
    # probed rows (llm_shard_manifest, llm_udf_tokenize_arrow) take its
    # slot.
    "llm_shard_manifest",
    "llm_udf_tokenize_arrow",
    "llm_decontam_ngram_overlap",
    "llm_bigram_lm",
    "q69_skew_salted_join",
    "llm_wav_decode",
    "llm_png_decode",
    "llm_event_sequences",
    "llm_random_projection",
    "llm_dedup_audit",
    "q102_grouped_median",
    "llm_html_extract",
    "q43_rank_family",
    "q97_rolling_distinct",
    "q96_stream_countmin",
    "llm_winnow_pairs",
    "llm_containment_dedup",
    # late round-13 additions: the 8 queries registered this round
    # (same convention as r12's late additions — new surface gets a
    # priced row the round it lands). q121_stream_full_outer is the
    # q99 streaming-machinery-floor class (sub-ms batch oracle), the
    # rest have real denominators. Totals before these exclude the
    # eight (101-query list), compare per-query/per-family.
    "llm_paragraph_dedup",
    "llm_ann_multiprobe",
    "q122_attribution",
    "q121_stream_full_outer",
    "llm_bloom_dedup",
    "q123_retention_triangle",
    "llm_minhash_bbit",
    "llm_perplexity_buckets",
    "q124_regression_stats",
]

# Per-family subtotals so cross-round regressions (CDC vs dedup vs ANN)
# are visible straight from BENCH_r{N}.json.
FAMILY = {
    "llm_paragraph_dedup": "dedup",
    "llm_ann_multiprobe": "ann",
    "q122_attribution": "events",
    "q121_stream_full_outer": "events",
    "llm_bloom_dedup": "dedup",
    "q123_retention_triangle": "events",
    "llm_minhash_bbit": "dedup",
    "llm_perplexity_buckets": "text",
    "q124_regression_stats": "relational",
    "q01_pricing_summary": "relational",
    "q03_top_revenue_orders": "relational",
    "q05_nation_volume": "relational",
    "q06_revenue_delta": "relational",
    "q08_left_join_agg": "relational",
    "q11_topk_per_group": "relational",
    "q14_rollup": "relational",
    "q30_events_tumbling": "events",
    "q32_events_session": "events",
    "q50_asof_join": "events",
    "q51_range_join": "events",
    "q55_skew_salted_agg": "relational",
    "cdc_pet_replay": "cdc",
    "cdc_orders_roundtrip": "cdc",
    "cdc_mixed_workload": "cdc",
    "llm_dedup_exact": "dedup",
    "llm_text_quality": "text",
    "llm_dedup_ngram_jaccard": "dedup",
    "llm_minhash_lsh_pairs": "dedup",
    "llm_simhash": "dedup",
    "llm_ann_topk": "ann",
    "llm_ann_lsh": "ann",
    "llm_ann_ivf": "ann",
    "llm_dedup_clusters": "dedup",
    "llm_sequence_pack": "curation",
    "llm_semdedup": "dedup",
    "llm_doc_repetition": "text",
    "llm_countmin_heavyhitters": "mining",
    "q85_rfm_segmentation": "mining",
    "q89_hll_distinct": "mining",
    "q90_histogram_quantiles": "mining",
    "llm_winnow_fingerprint": "dedup",
    "llm_global_shuffle": "curation",
    "llm_train_split": "curation",
    "cdc_binlog_replay": "cdc",
    "llm_image_ahash": "multimodal",
    "llm_ahash_pairs": "multimodal",
    "llm_multimodal_dedup_clusters": "multimodal",
    "llm_substring_dedup": "dedup",
    "q94_sessionization": "events",
    "llm_incremental_minhash": "dedup",
    "llm_source_overlap": "dedup",
    "llm_video_phash": "multimodal",
    "llm_url_dedup": "dedup",
    "llm_dedup_threshold_sweep": "dedup",
    "llm_rouge_overlap": "text",
    "llm_minhash_ann_hybrid": "dedup",
    "q101_selection_median": "mining",
    "llm_dedup_cascade": "dedup",
    "llm_bpe_tokenize": "text",
    "llm_bpe_tokenize_arrow": "text",
    "llm_web_pipeline": "dedup",
    "q110_events_user_drift": "events",
    "llm_heaps_law": "text",
    "llm_ngram_novelty": "text",
    "llm_embedding_sq8": "ann",
    "q111_decimal_pricing": "relational",
    "cdc_sequence_audit": "cdc",
    "q112_bucketed_join": "relational",
    "q113_partition_pruned_scan": "relational",
    "llm_stupid_backoff": "text",
    "q114_schema_evolution": "events",
    "llm_dup_rate_sample": "dedup",
    "q115_column_stats": "relational",
    "cdc_tx_histogram": "cdc",
    "llm_temperature_mixture": "curation",
    "q116_max_concurrency": "events",
    "llm_ann_mrr": "ann",
    "q117_time_weighted_avg": "events",
    "q118_mad_robust_stats": "mining",
    "llm_span_corruption": "curation",
    "llm_text_export_roundtrip": "curation",
    "llm_hard_negatives_lsh": "ann",
    "q119_interval_coverage": "events",
    "cdc_changelog_compaction": "cdc",
    "llm_priority_sample": "curation",
    "llm_allpairs_prefix_join": "dedup",
    "q99_stream_outer_join": "events",
    "q100_stream_chained_agg": "events",
    "llm_substring_trim": "dedup",
    "llm_crossdedup_transfer": "dedup",
    "q103_stream_static_enrich": "events",
    "q105_negative_median": "mining",
    "q95_bloom_semijoin": "relational",
    "llm_shard_manifest": "curation",
    "llm_udf_tokenize_arrow": "text",
    "llm_decontam_ngram_overlap": "curation",
    "llm_bigram_lm": "text",
    "q69_skew_salted_join": "relational",
    "llm_wav_decode": "multimodal",
    "llm_png_decode": "multimodal",
    "llm_event_sequences": "events",
    "llm_random_projection": "ann",
    "llm_dedup_audit": "dedup",
    "q102_grouped_median": "mining",
    "llm_html_extract": "curation",
    "q43_rank_family": "relational",
    "q97_rolling_distinct": "events",
    "q96_stream_countmin": "events",
    "llm_winnow_pairs": "dedup",
    "llm_containment_dedup": "dedup",
}


def _loadavg() -> list[float]:
    """[1, 5, 15]-minute system load averages (0.0s if unreadable)."""
    try:
        with open("/proc/loadavg") as f:
            return [round(float(x), 2) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return [0.0, 0.0, 0.0]


def _session_cpu_seconds() -> float:
    """Sum utime+stime of every live process in THIS login session
    (python driver + local-mode JVM + pyspark.daemon workers) — the
    co-tenant-steal-resistant measure of work actually done (same
    method as tools/opt_harness.py)."""
    try:
        sid = os.getsid(0)
        hz = os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError):
        return 0.0
    total = 0
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # after the comm field: [0]=state, [3]=sid, [11]=utime, [12]=stime
            if int(parts[3]) == sid:
                total += int(parts[11]) + int(parts[12])
        except (OSError, IndexError, ValueError):
            continue
    return total / hz


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Contention forensics (r13 VERDICT item 2): this host's co-tenant
    # runs multi-minute full-core steal bursts that inflated the r13
    # 32-core bench 50%+. Record 1/5/15-min loadavg at start and end
    # plus the session's own CPU-seconds so a steal-contaminated run is
    # machine-detectable from the artifact itself (ambient load >> own
    # cores-in-use while wall >> cpu_s/cores ⇒ steal, not the tree).
    # Additions-only: the timed region and the final-line format keep
    # every pre-r14 field unchanged.
    load_start = _loadavg()
    cpu_s0 = _session_cpu_seconds()
    wall0 = time.perf_counter()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session so the first query doesn't pay startup costs
    spark.range(1000).count()
    # warm the Python worker pool: the first mapInPandas/pandas_udf in a
    # Spark process forks one Python worker per core (each importing
    # pandas/pyarrow, ~10-20 s across 32 cores); workers are reused
    # afterwards (spark.python.worker.reuse), so this is a one-time
    # process cost, not per-query throughput — same rationale as the
    # JVM warmup above.
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Two timed executions per query; report the min (steady state).
    # The first run of a plan pays one-time JVM codegen/JIT — a fixed
    # per-process cost that amortizes away on a long-lived cluster and
    # would double-count startup if included in per-query throughput.
    # Co-tenant host load swings wall times ±50%; when the two runs
    # disagree by >30% the spread is load, not the plan, so take up to
    # two extra runs and keep the min.
    times: dict[str, object] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        spec = REGISTRY[name]
        runs: list[float] = []
        # Per-query error isolation: one broken plan must never zero out
        # the whole artifact — record the error and keep benchmarking.
        try:
            while len(runs) < 5:
                t0 = time.perf_counter()
                try:
                    df = spec.fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                finally:
                    # Promptly release cached/checkpointed RDDs the query
                    # may hold (CDC folds localCheckpoint) so later
                    # queries don't inherit memory pressure — ALSO on the
                    # error path, else a failed query's leaked caches
                    # contaminate every later timing.
                    df = None
                    gc.collect()
                runs.append(time.perf_counter() - t0)
                s = sorted(runs)
                # stable = the two fastest runs agree (or the query is
                # too small for load to matter)
                if len(runs) >= 2 and (s[0] < 0.2 or (s[1] - s[0]) / s[0] <= 0.3):
                    break
            times[name] = round(min(runs), 3)
        except Exception as exc:  # noqa: BLE001 — isolate any plan failure
            msg = f"{type(exc).__name__}: {exc}"
            times[name] = {"err": msg[:500]}
            errors[name] = msg[:500]

    ok = {k: v for k, v in times.items() if isinstance(v, float)}
    total = round(sum(ok.values()), 3)
    families: dict[str, float] = {}
    for name, t in ok.items():
        fam = FAMILY.get(name, "other")
        families[fam] = round(families.get(fam, 0.0) + t, 3)
    contention = {
        # system 1/5/15-min loadavg at bench start and end, the
        # session's own CPU-seconds over the run, and the wall it took:
        # ambient load far above this session's own utilisation while
        # wall >> cpu_s / cores means co-tenant steal inflated the
        # walls (r13 VERDICT item 2 — lets the driver discount a
        # contaminated run instead of reading it as a regression).
        "load_start": load_start,
        "load_end": _loadavg(),
        "cpu_s": round(_session_cpu_seconds() - cpu_s0, 1),
        "wall_s": round(time.perf_counter() - wall0, 1),
    }
    out = {
        "metric": "declared-query wall time (noop sink, steady-state min of 2-5 adaptive runs), all operator families",
        "value": total,
        "unit": "sec",
        "queries": times,
        "families": families,
        "sf": sf,
        "runs_per_query": "2-5 (adaptive)",
        "contention": contention,
    }
    if errors:
        out["errors"] = errors
    # The driver captures only the LAST ~2000 chars of stdout and
    # parses the final JSON line it finds there: the r11 per-query map
    # outgrew the window and the whole artifact parsed null. Defend:
    # write the FULL artifact to a committed evidence file, print it
    # as a (possibly tail-clipped) penultimate line for humans, and
    # make the FINAL line a compact summary (total + families +
    # n_queries + pointer) that always fits the capture window.
    full_path = Path(__file__).resolve().parent / "docs" / "bench_evidence" / "bench_full_latest.json"
    try:
        full_path.parent.mkdir(parents=True, exist_ok=True)
        full_path.write_text(json.dumps(out, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout must not kill the bench line
    print(json.dumps(out))
    compact = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "families": families,
        "sf": sf,
        "n_queries": len(ok),
        "n_errors": len(errors),
        "queries_file": "docs/bench_evidence/bench_full_latest.json",
        "contention": contention,
    }
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
