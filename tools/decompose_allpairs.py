#!/usr/bin/env python
"""Controlled decomposition of llm_allpairs_prefix_join (r12 VERDICT
"what's wrong" #1 / r13 task #2): after the ppjoin length+positional
filters landed (commit 0a45421), where does the remaining wall time go,
and is the residual >2x-vs-DuckDB gap a plan defect or a fixed-cost
floor at this fixture scale?

Stages timed (3 reps each, steady-state min, noop sink). Each stage is
the CUMULATIVE pipeline up to that point, so deltas between adjacent
rows isolate one stage:

  A  tokenize + 3-gram shingle explode (distinct per doc) — the scan
     floor every variant pays
  B  + global shingle-frequency aggregate (1 shuffle on tok)
  C  + per-doc (tf, tok) rank + size windows (1 shuffle on doc_id)
  D  + prefix equi-join, candidate groupBy, length+positional filters
     (the candidate generator, ppjoin-pruned)
  E  full current plan (D + postings-intersection verify + Jaccard gate)
  F  DuckDB: the registered oracle SQL end-to-end, same host, for the
     denominator the ratio is judged against

Also prints the candidate/output cardinalities that size the verify
fan-out. Known negative results (do NOT re-land): array_intersect
verify 5.4-6.0 s vs 3.4-3.8 s postings fan-out (commit ec7b67a);
left-semi prune before verify 5.09 s vs 2.89 s; localCheckpoint of the
shingle sets 4.4 s (+ 13.8 s first-run); repartition width sweep
8/16/32 -> 16 best (/tmp/allpairs_rep4.txt history, r13).

Usage: python tools/decompose_allpairs.py [sf_dir]   (idle host!)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F
from pyspark.sql import Window

from fluvio_demo_apps_rust_spark.plans import REGISTRY
from fluvio_demo_apps_rust_spark.plans.base import load
from fluvio_demo_apps_rust_spark.functions import text as TX
from fluvio_demo_apps_rust_spark.functions import dedup as X
from fluvio_demo_apps_rust_spark.session import get_spark


def _time(df_fn, reps: int = 3) -> float:
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("decompose_allpairs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def tok():
        d = load(spark, sf_dir, "documents").repartition(16)
        return d.where(F.size(TX.tokens("text")) >= 3).select(
            "doc_id", F.explode(X.word_shingles("text")).alias("tok")
        )

    def stage_a():
        return tok().agg(F.count(F.lit(1)).alias("n"))

    def stage_b():
        t = tok()
        tf = t.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
        return tf.agg(F.count(F.lit(1)).alias("n"))

    def ranked():
        t = tok()
        tf = t.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
        w_rank = Window.partitionBy("doc_id").orderBy("tf", "tok")
        w_n = Window.partitionBy("doc_id")
        return (
            t.join(tf, "tok")
            .repartition(16, "doc_id")
            .withColumn("rk", F.row_number().over(w_rank))
            .withColumn("n", F.count(F.lit(1)).over(w_n))
        )

    def stage_c():
        return ranked().agg(F.count(F.lit(1)).alias("n"))

    def cand():
        r = ranked()
        prefix = r.where(
            F.col("rk") <= F.col("n") - F.expr("(3 * n + 4) DIV 5") + 1
        )
        pa = prefix.select(
            F.col("doc_id").alias("a"), "tok",
            F.col("rk").alias("rk_a"), F.col("n").alias("n_a"),
        )
        pb = prefix.select(
            F.col("doc_id").alias("b"), "tok",
            F.col("rk").alias("rk_b"), F.col("n").alias("n_b"),
        )
        return (
            pa.join(pb, "tok")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b", "n_a", "n_b")
            .agg(F.min("rk_a").alias("ia"), F.min("rk_b").alias("jb"))
            .where(F.expr("1000 * least(n_a, n_b) >= 600 * greatest(n_a, n_b)"))
            .where(
                F.expr(
                    "1 + least(n_a - ia, n_b - jb) >= (3 * (n_a + n_b) + 7) DIV 8"
                )
            )
        )

    def stage_d():
        return cand().agg(F.count(F.lit(1)).alias("n"))

    def stage_e():
        return REGISTRY["llm_allpairs_prefix_join"].fn(spark, sf_dir)

    n_cand = cand().count()
    n_out = REGISTRY["llm_allpairs_prefix_join"].fn(spark, sf_dir).count()

    out = {
        "sf_dir": sf_dir,
        "n_candidates_after_filters": n_cand,
        "n_output_pairs": n_out,
        "A_shingle_explode": _time(stage_a),
        "B_plus_tf_agg": _time(stage_b),
        "C_plus_rank_windows": _time(stage_c),
        "D_plus_candidates_filtered": _time(stage_d),
        "E_full_current_plan": _time(stage_e),
    }

    # F: the DuckDB denominator, same method as tools/bench_oracle.py
    import duckdb

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = REGISTRY["llm_allpairs_prefix_join"].oracle
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        runs.append(time.perf_counter() - t0)
    out["F_duckdb_oracle"] = round(min(runs), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
