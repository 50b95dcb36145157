#!/usr/bin/env python
"""One-decade scale probe for the r13 "kept on shape" optimizations
(VERDICT r13 item 5): llm_bigram_lm, llm_perplexity_buckets,
llm_source_overlap (vocabulary/posting localCheckpoints) and
llm_line_boilerplate (count-window vs aggregate+join-back).

The r13 round kept these four on a fewer-corpus-passes argument with
no wall evidence (every pass is a ~0.2 s floor job at sf0.1). This
probe builds an sf1-EQUIVALENT documents fixture (the sf0.1 corpus
unioned ×10 with shifted doc_ids — vocabulary and source set stay
fixed, token volume grows ×10, exactly the regime the checkpoint
claims address) and times each query's SHIPPED plan against its
non-checkpointed / join-back twin at both sf0.1 and the decade.

The twin plans are produced by neutralizing DataFrame.localCheckpoint
for the process (identity) — the shipped code paths are otherwise
byte-identical — except llm_line_boilerplate, whose r12 join-back
twin is reconstructed inline (labeled) over the same line stream.

Usage:
  python tools/decade_probe.py build          # write the decade fixture
  python tools/decade_probe.py time [--no-checkpoint] [--sf DIR]
  python tools/decade_probe.py sweep          # full A/B at both scales
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DECADE_DIR = "/tmp/spark_graft_sf1eq"
QUERIES = ("llm_bigram_lm", "llm_perplexity_buckets", "llm_source_overlap")


def build() -> None:
    from pyspark.sql import functions as F

    from fluvio_demo_apps_rust_spark.session import get_spark

    spark = get_spark("decade_build")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = [
        d.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        for i in range(10)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    (
        out.repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DECADE_DIR}/documents.parquet")
    )
    print(f"wrote {DECADE_DIR}/documents.parquet (10x sf0.1 documents)")


def time_queries(sf_dir: str, no_checkpoint: bool, runs: int) -> dict:
    import pyspark.sql

    if no_checkpoint:
        # identity localCheckpoint: the SHIPPED plans minus their
        # materialization barriers — every multi-consumer subtree is
        # re-executed per branch, the pre-r13 shape
        pyspark.sql.DataFrame.localCheckpoint = (  # type: ignore[method-assign]
            lambda self, eager=True: self
        )
    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.functions.text import boilerplate_lines, fround
    from fluvio_demo_apps_rust_spark.plans import REGISTRY
    from fluvio_demo_apps_rust_spark.plans.base import load
    from fluvio_demo_apps_rust_spark.session import get_spark

    spark = get_spark("decade_probe")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: (x for x in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def boilerplate_joinback(spark, sf_dir):
        """The r12 aggregate+join-back twin of boilerplate_lines
        (reconstructed; the shipped form is the r13 count window)."""
        df = load(spark, sf_dir, "documents")
        lines = (
            df.select(
                F.col("doc_id"),
                F.explode(
                    F.expr(
                        "filter(transform(split(text, '\\n'), l -> trim(l)), "
                        "l -> l != '')"
                    )
                ).alias("line"),
            )
            .select("doc_id", F.md5("line").alias("lh"))
            .distinct()
        )
        docfreq = lines.groupBy("lh").agg(F.count(F.lit(1)).alias("df"))
        return (
            lines.join(docfreq, "lh")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.count_if(F.col("df") >= 3).alias("bp_lines"),
                fround(
                    F.count_if(F.col("df") >= 3) / F.count(F.lit(1)).cast("double"), 4
                ).alias("bp_frac"),
            )
        )

    def boilerplate_window(spark, sf_dir):
        return boilerplate_lines(load(spark, sf_dir, "documents"))

    plans = {name: REGISTRY[name].fn for name in QUERIES}
    if no_checkpoint:
        plans["llm_line_boilerplate~twin"] = boilerplate_joinback
    else:
        plans["llm_line_boilerplate~twin"] = boilerplate_window

    out = {}
    for name, fn in plans.items():
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"decade:{name}")
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            df = None
            import gc

            gc.collect()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "time", "sweep"])
    ap.add_argument("--no-checkpoint", action="store_true")
    ap.add_argument("--sf", default=DECADE_DIR)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.mode == "build":
        build()
        return 0
    if args.mode == "time":
        res = time_queries(args.sf, args.no_checkpoint, args.runs)
        if args.out:
            Path(args.out).write_text(json.dumps(res, indent=1) + "\n")
        return 0

    # sweep: alternate shipped / twin at both scales, each side in its
    # own process (the monkeypatch and JVM state stay isolated)
    results = {}
    for sf_label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1eq", DECADE_DIR)):
        for variant in ("shipped", "twin", "shipped2", "twin2"):
            flag = ["--no-checkpoint"] if "twin" in variant else []
            outf = f"/tmp/decade_{sf_label}_{variant}.json"
            with open("/proc/loadavg") as f:
                load1 = f.read().split()[0]
            subprocess.run(
                [sys.executable, __file__, "time", "--sf", sf_dir, "--out", outf]
                + flag,
                check=True,
            )
            results[f"{sf_label}/{variant}"] = {
                "load_at_start": load1,
                **json.loads(Path(outf).read_text()),
            }
    print(json.dumps(results, indent=1))
    Path("docs/bench_evidence/r14_decade_probe.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
