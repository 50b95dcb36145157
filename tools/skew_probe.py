#!/usr/bin/env python
"""Synthetic hot-key probe for the r14 skew-proofed count-window
rewrites (VERDICT r13 item 1 "Done" criterion).

Builds an sf0.1-equivalent corpus (5,000 docs, ~900 chars each) where
ONE 30-char gram appears in 50% of docs and repeats ~R times inside
each such doc (the boilerplate/licence-block shape the operators
exist to find), then runs the llm_substring_dedup kernel both ways:

- r13 shape: count window directly over the occurrence stream
  (every occurrence row of the hot gram lands in ONE WindowExec
  partition — AQE cannot split a window partition);
- r14 shape: per-(doc, gram) pre-aggregate, then a sum window
  (map-side combine; the hot partition is bounded by the gram's
  DISTINCT-DOC count).

For each run it reports, from the Spark UI REST API, the window
stage's per-task distribution (max vs median shuffle-read rows and
run time) plus the wall. "No straggler" = the r14 max/median row
ratio collapses to the distinct-doc bound while the r13 ratio
carries the full within-doc multiplicity.

Usage: python tools/skew_probe.py [--docs 5000] [--repeats 24]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F
from pyspark.sql import Window

from fluvio_demo_apps_rust_spark.session import get_spark

K = 30  # gram width, = plans/llm/dedup.py _SSD_K


def corpus(spark, n_docs: int, repeats: int):
    """Deterministic synthetic docs: unique md5 filler everywhere,
    plus in every even doc one run of 'Z' long enough that every
    window inside it is the single hot gram 'Z'*30, ~repeats times."""
    filler = F.concat(*[F.md5(F.concat(F.col("id"), F.lit(f"/{i}"))) for i in range(18)])
    hot = F.lit("Z" * (K + repeats - 1))
    text = F.when(F.col("id") % 2 == 0, F.concat(hot, filler)).otherwise(filler)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def grams_stream(d, par: int):
    """The llm_substring_dedup gram build, verbatim shape."""
    grams = F.when(
        F.length("text") >= K,
        F.transform(
            F.sequence(F.lit(1), F.length("text") - F.lit(K - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(F.col("text"), i, F.lit(K))), 1, 15),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return d.repartition(par).select("doc_id", F.explode(grams).alias("ghash"))


def old_shape(g):
    k_tot = F.count(F.lit(1)).over(Window.partitionBy("ghash"))
    return (
        g.withColumn("k_tot", k_tot)
        .filter(F.col("k_tot") >= 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup"))
    )


def new_shape(g):
    """groupBy pre-aggregate variant (bounded like the shipped RLE,
    but pays an extra exchange — kept for reference)."""
    per = g.groupBy("doc_id", "ghash").agg(F.count(F.lit(1)).alias("k_local"))
    k_tot = F.sum("k_local").over(Window.partitionBy("ghash"))
    return (
        per.withColumn("k_tot", k_tot)
        .filter(F.col("k_tot") >= 2)
        .groupBy("doc_id")
        .agg(F.sum("k_local").cast("long").alias("n_dup"))
    )


def rle_shape(d, par):
    """The SHIPPED r14 llm_substring_dedup kernel: row-local sort +
    run-length-encode per doc, then the sum window — same distinct-doc
    bound as new_shape with no extra exchange."""
    grams = F.when(
        F.length("text") >= K,
        F.transform(
            F.sequence(F.lit(1), F.length("text") - F.lit(K - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(F.col("text"), i, F.lit(K))), 1, 15),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))

    def _rle(sa):
        st = F.filter(
            F.sequence(F.lit(0), F.size(sa) - 1),
            lambda i: (i == F.lit(0)) | (F.get(sa, i) != F.get(sa, i - 1)),
        )
        return F.transform(
            F.array(st),
            lambda stt: F.zip_with(
                stt,
                F.concat(F.slice(stt, F.lit(2), F.size(stt)), F.array(F.size(sa))),
                lambda s, e: F.struct(
                    F.get(sa, s).alias("ghash"), (e - s).cast("long").alias("k_local")
                ),
            ),
        )[0]

    empty = F.array().cast("array<struct<ghash:bigint,k_local:bigint>>")
    occ = F.transform(
        F.array(F.array_sort(grams)),
        lambda sa: F.when(F.size(sa) > 0, _rle(sa)).otherwise(empty),
    )[0]
    per = (
        d.repartition(par)
        .select("doc_id", F.explode(occ).alias("o"))
        .select("doc_id", F.col("o.ghash").alias("ghash"), F.col("o.k_local").alias("k_local"))
    )
    k_tot = F.sum("k_local").over(Window.partitionBy("ghash"))
    return (
        per.withColumn("k_tot", k_tot)
        .filter(F.col("k_tot") >= 2)
        .groupBy("doc_id")
        .agg(F.sum("k_local").cast("long").alias("n_dup"))
    )


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def window_stage_tasks(spark, min_submission_ms: float):
    """Per-task (shuffle-read records, run ms) of the completed stage
    with the largest shuffle read submitted after min_submission_ms —
    the stage that FETCHES the window exchange (guide §2.1: shuffle
    cost lands in the downstream stage)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = _get(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
    recent = [
        s
        for s in stages
        if s.get("firstTaskLaunchedTime")
        and _ms(s["firstTaskLaunchedTime"]) >= min_submission_ms
    ]
    stage = max(recent, key=lambda s: s.get("shuffleReadRecords", 0))
    detail = _get(
        f"{ui}/api/v1/applications/{app}/stages/{stage['stageId']}/"
        f"{stage['attemptId']}?details=true"
    )
    tasks = [
        (
            t.get("taskMetrics", {})
            .get("shuffleReadMetrics", {})
            .get("recordsRead", 0),
            t.get("taskMetrics", {}).get("executorRunTime", 0),
        )
        for t in detail.get("tasks", {}).values()
        if t.get("status") == "SUCCESS"
    ]
    return stage["stageId"], sorted(tasks)


def _ms(iso: str) -> float:
    # Spark REST timestamps: 2026-08-18T07:19:39.123GMT
    import datetime as dt

    return (
        dt.datetime.strptime(iso.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .timestamp()
        * 1000.0
    )


def run(label, fn, g, spark):
    t0 = time.time()
    wall_t0_ms = t0 * 1000.0
    spark.sparkContext.setJobDescription(f"skew_probe:{label}")
    fn(g).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)
    wall = time.time() - t0
    sid, tasks = window_stage_tasks(spark, wall_t0_ms - 2000)
    rows = [r for r, _ in tasks]
    times = sorted(t for _, t in tasks)
    med_r = rows[len(rows) // 2] if rows else 0
    med_t = times[len(times) // 2] if times else 0
    print(
        f"{label}: wall={wall:.2f}s window-fetch stage={sid} tasks={len(tasks)} "
        f"rows max={max(rows)} med={med_r} ratio={max(rows) / max(med_r, 1):.1f}x | "
        f"task-ms max={max(times)} med={med_t}"
    )
    return {
        "label": label,
        "wall_s": round(wall, 2),
        "stage": sid,
        "n_tasks": len(tasks),
        "rows_max": max(rows),
        "rows_med": med_r,
        "rows_ratio": round(max(rows) / max(med_r, 1), 1),
        "task_ms_max": max(times),
        "task_ms_med": med_t,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--repeats", type=int, default=24)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # the probe reads per-task metrics from the UI REST API, which
    # session.py disables by default — turn it on for this process
    import os

    os.environ.setdefault("SPARK_UI_ENABLED", "true")
    from pyspark.sql import SparkSession

    SparkSession.builder.config("spark.ui.enabled", "true")
    spark = get_spark("skew_probe")
    if spark.sparkContext.uiWebUrl is None:
        spark.stop()
        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .appName("skew_probe")
            .config("spark.ui.enabled", "true")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    d = corpus(spark, args.docs, args.repeats).localCheckpoint()
    g = grams_stream(d, par)
    # sanity: all shapes agree exactly
    a = old_shape(g).withColumnRenamed("n_dup", "a")
    b = rle_shape(d, par).withColumnRenamed("n_dup", "b")
    diff = a.join(b, "doc_id", "full").where(~F.col("a").eqNullSafe(F.col("b"))).count()
    assert diff == 0, f"shapes disagree on {diff} docs"

    results = []
    for _ in range(2):  # alternate, keep the second (warmed) pair
        results = [
            run("r13-occurrence-window", lambda _: old_shape(g), g, spark),
            run("r14-preagg-window", lambda _: new_shape(g), g, spark),
            run("r14-rle-window(shipped)", lambda _: rle_shape(d, par), g, spark),
        ]
    if args.out:
        Path(args.out).write_text(json.dumps(
            {"docs": args.docs, "repeats": args.repeats, "pairs": results}, indent=1
        ) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
