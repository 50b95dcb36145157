"""Engine-wide physical-plan invariants over the registered query
surface: the scale posture the README claims, pinned as tests.

- No row-at-a-time Python evaluation (BatchEvalPython / PythonUDF) in
  any query plan — Python appears only as Arrow-batched MapInPandas /
  FlatMapGroupsInPandas harnesses.
- No CartesianProduct nodes: every cross-ish join must be a bounded
  broadcast (BroadcastNestedLoopJoin over a small dimension/probe set
  is acceptable; an unbounded shuffled cartesian is not).
- No corpus-scale global-order window: a Window with an EMPTY
  partition spec moves every input row to ONE partition (WindowExec
  "Moving all data to a single partition"), so it is only allowed
  over an already-reduced subtree — an Aggregate (per-bucket /
  per-level totals, the two-phase prefix-sum pattern), a Limit, or a
  WindowGroupLimit (top-k rank pushdown). A bare global window over
  a scan is the q43/q90/vocab_coverage defect class (r5 verdict #3).
"""

from __future__ import annotations

import pytest

from fluvio_demo_apps_rust_spark.plans import REGISTRY

from .conftest import SF_SMOKE

# Logical nodes that bound the input of a global-order window: the
# window then runs over aggregated/limited rows, not the corpus.
_WINDOW_REDUCERS = {"Aggregate", "GlobalLimit", "LocalLimit", "WindowGroupLimit"}


def _jchildren(jnode):
    ch = jnode.children()
    return [ch.apply(i) for i in range(ch.size())]


def _walk(jnode):
    stack = [jnode]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_jchildren(n))


def _unbounded_global_windows(df) -> list[str]:
    """Names of empty-partition Window nodes in the OPTIMIZED logical
    plan with no reducing node below them."""
    bad = []
    root = df._jdf.queryExecution().optimizedPlan()
    for node in _walk(root):
        if node.getClass().getSimpleName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        reduced = any(
            d.getClass().getSimpleName() in _WINDOW_REDUCERS
            for c in _jchildren(node)
            for d in _walk(c)
        )
        if not reduced:
            bad.append(node.simpleString(100))
    return bad

# Streaming queries execute a stream inside the builder; CDC queries run
# driver-side fold jobs. Both still yield inspectable batch plans, but
# the streaming ones are slow and covered elsewhere — skip by tag.
_SKIP_TAGS = {"streaming"}


def _batch_queries():
    for name, spec in sorted(REGISTRY.items()):
        if _SKIP_TAGS & set(spec.tags):
            continue
        yield name, spec


@pytest.mark.parametrize("name,spec", list(_batch_queries()), ids=lambda v: v if isinstance(v, str) else "")
def test_no_rowwise_python_and_no_cartesian(spark, name, spec):
    df = spec.fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"
    assert "CartesianProduct" not in plan, f"{name} has an unbounded cartesian product"
    bad = _unbounded_global_windows(df)
    assert not bad, f"{name} has corpus-scale global-order window(s): {bad}"


# Forced-broadcast lint (the q05/q21/naive-bayes defect class, r5
# verdict #4/#5): an F.broadcast() hint whose subtree scans an
# SF-LINEAR table with no Aggregate/Limit reduction below pins an
# eventual OOM at scale where no hint would have let AQE decide.
# Marker column → table (Relation simpleString shows columns, not paths).
_SF_MARKERS = {
    "s_suppkey": "supplier", "p_partkey": "part", "c_custkey": "customer",
    "o_orderkey": "orders", "l_orderkey": "lineitem", "event_id": "events",
    "doc_id": "documents", "vec_id": "embeddings",
}
# Sanctioned stand-ins: frames that are FIXED-SIZE in a real deployment
# but derive from an SF-linear table in this test corpus. Each entry is
# (query, table) with the justification; anything NOT listed fails.
_BROADCAST_ALLOW = {
    # ANN probe sets: the queries being searched — a workload parameter,
    # not corpus data; testdata fakes them by sampling embeddings
    ("llm_ann_topk", "embeddings"),
    ("llm_ann_lsh", "embeddings"),
    ("llm_ann_ivf", "embeddings"),
    ("llm_ann_recall", "embeddings"),
    ("llm_ann_mrr", "embeddings"),
    ("llm_hard_negatives", "embeddings"),
    ("llm_hard_negatives_lsh", "embeddings"),
    ("llm_ann_multiprobe", "embeddings"),
    # decontamination benchmark: a fixed held-out suite in reality,
    # faked here as every-50th document's shingle set
    ("llm_contamination", "documents"),
    # --- "LogicalRDD" marker: broadcast hints over checkpoint /
    # createDataFrame leaves (see _forced_sf_linear_broadcasts). The
    # plan can no longer prove boundedness (localCheckpoint erases the
    # lineage), so each entry must argue it IN CONSTRUCTION:
    # connected_components' fast-path label table is a driver-side
    # union-find collected ONLY when the edge set fits the 500k gate
    # (functions/dedup.py:377) — above the gate the distributed loop
    # runs and the broadcast does not exist
    ("llm_dedup_clusters", "LogicalRDD"),
    ("llm_dedup_keep_best", "LogicalRDD"),
    ("llm_multimodal_dedup_clusters", "LogicalRDD"),
    # k-means centroids: k rows, localCheckpointed per round
    # (functions/similarity.py:390) — bounded by the codebook size
    ("llm_kmeans", "LogicalRDD"),
    # the 4-row literal mixture-target table (plans/llm.py:2347)
    ("llm_epoch_upsample", "LogicalRDD"),
    # the broadcast side is the (j_est, count) histogram whose key
    # takes only the 17 values k/16 (k=16 signature components), so it
    # is <= 17 rows BY CONSTRUCTION at any corpus size; the LogicalRDD
    # leaf is the r13-opt localCheckpoint of the minhash-wide relation
    # (README finding #8) feeding that bounded aggregate
    ("llm_dedup_threshold_sweep", "LogicalRDD"),
    # the broadcast sides are ONE-ROW global aggregates (total token
    # count in unigram_surprise/bigram_surprise; the two-value
    # percentile cuts in surprise_buckets) — a single row by
    # construction at any corpus size. The LogicalRDD leaf below them
    # is the r13-opt localCheckpoint of the VOCABULARY-sized frequency
    # table (functions/text.py unigram_surprise/bigram_surprise), not
    # an sf-linear set.
    ("llm_unigram_surprise", "LogicalRDD"),
    ("llm_bigram_lm", "LogicalRDD"),
    ("llm_surprise_buckets", "LogicalRDD"),
    # the broadcast sides are the per-SOURCE shingle-set size tables
    # (groupBy over the source label): |sources| rows by construction —
    # sources are a workload/catalog dimension (crawl feeds), not
    # corpus-linear data. The LogicalRDD leaf is the r13-opt
    # localCheckpoint of the capped posting relation (README finding
    # #8) those aggregates consume.
    ("llm_source_overlap", "LogicalRDD"),
}


def _forced_sf_linear_broadcasts(df) -> list[str]:
    """Markers for F.broadcast() hints the plan cannot prove bounded:
    the table name when the subtree scans an SF-linear relation with no
    reduction below the hint, and the literal "LogicalRDD" when the
    subtree bottoms out in a LogicalRDD leaf (localCheckpoint /
    createDataFrame). The latter is the r9-verdict laundering hole:
    checkpointing an sf-linear id set turns its scan into a LogicalRDD,
    which the relation-marker scan cannot see — so ANY hinted broadcast
    over a checkpoint leaf must be explicitly allowlisted with a
    boundedness argument (llm_dedup_cascade shipped exactly this
    defect in r9; the hints are now gone)."""
    flags = []
    root = df._jdf.queryExecution().analyzed()
    for node in _walk(root):
        if node.getClass().getSimpleName() != "ResolvedHint":
            continue
        if "broadcast" not in node.simpleString(100).lower():
            continue
        sub = list(_walk(node))
        reduced = any(
            d.getClass().getSimpleName() in _WINDOW_REDUCERS for d in sub[1:]
        )
        for d in sub:
            leaf = d.getClass().getSimpleName()
            if leaf == "LogicalRelation" and not reduced:
                cols = d.simpleString(300)
                flags.extend(
                    t for m, t in _SF_MARKERS.items() if m + "#" in cols
                )
            elif leaf == "LogicalRDD":
                # a reducer ABOVE a checkpoint leaf does not bound the
                # leaf itself (the aggregate may be downstream of the
                # full checkpointed set) — always flag
                flags.append("LogicalRDD")
    return flags


@pytest.mark.parametrize(
    "name,spec",
    [(n, s) for n, s in sorted(REGISTRY.items())
     if not ({"streaming", "cdc"} & set(s.tags))],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_no_forced_broadcast_of_sf_linear_tables(spark, name, spec):
    df = spec.fn(spark, SF_SMOKE)
    bad = [
        t for t in _forced_sf_linear_broadcasts(df)
        if (name, t) not in _BROADCAST_ALLOW
    ]
    assert not bad, (
        f"{name} forces a broadcast of SF-linear table(s) {sorted(set(bad))} "
        "with no reduction below the hint — delete the hint (AQE decides) "
        "or add a justified _BROADCAST_ALLOW entry"
    )


def test_broadcast_lint_sees_through_checkpoint_laundering(spark):
    """Negative control for the r9-verdict hole: localCheckpoint()ing
    an sf-linear id set before F.broadcast() replaces its scan with a
    LogicalRDD leaf, which the relation-marker scan cannot attribute to
    a table — the exact shape llm_dedup_cascade shipped in round 9.
    The extended lint must flag it, and must still flag the plain
    (un-checkpointed) forced broadcast by table name."""
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = docs.select("doc_id").localCheckpoint()
    laundered = docs.join(
        F.broadcast(ids.withColumn("in1", F.lit(1))), "doc_id", "left"
    )
    assert "LogicalRDD" in _forced_sf_linear_broadcasts(laundered), (
        "checkpoint-laundered forced broadcast not detected"
    )

    plain = docs.join(
        F.broadcast(docs.select("doc_id").withColumn("in1", F.lit(1))),
        "doc_id",
        "left",
    )
    assert "documents" in _forced_sf_linear_broadcasts(plain)

    # bounded control: an aggregated-to-constant broadcast stays legal
    tiny = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    ok = docs.join(F.broadcast(tiny), "lang")
    assert not _forced_sf_linear_broadcasts(ok)


def test_global_window_detector_fires(spark):
    """Negative control: the detector must flag the exact defect class
    it pins (a bare Window.orderBy over a scan) and must NOT flag the
    sanctioned shapes (window over an aggregate; top-k WindowGroupLimit)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    naked = df.select(F.row_number().over(Window.orderBy("id")).alias("r"))
    assert _unbounded_global_windows(naked), "bare global window not detected"

    over_agg = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.row_number().over(Window.orderBy("k")).alias("r"))
    )
    assert not _unbounded_global_windows(over_agg)

    topk = df.select(
        F.row_number().over(Window.orderBy("id")).alias("r"), "id"
    ).filter(F.col("r") <= 5)
    assert not _unbounded_global_windows(topk), "WindowGroupLimit shape flagged"


def test_bench_queries_are_registered_and_classified():
    """BENCH_r{N} must never die to a stale name: every bench query
    exists in the registry, has an oracle (so the ratio denominator is
    computable), and has a family label."""
    import bench

    for name in bench.BENCH_QUERIES:
        assert name in REGISTRY, f"bench references unregistered query {name}"
        assert REGISTRY[name].oracle, f"bench query {name} has no oracle"
        assert name in bench.FAMILY, f"bench query {name} missing family label"
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))


def test_bucketed_join_is_exchange_free(spark):
    """q112's whole point: both sides written bucketed by the join key
    ⇒ the join stage plans with ZERO Exchange nodes (the scan layout
    satisfies the join's distribution requirement). If bucketing info
    ever stops reaching the planner (catalog regression, bucketing
    disabled, key mismatch), this fires before the oracle ever could —
    the VALUES would still match through a shuffle."""
    from fluvio_demo_apps_rust_spark.plans.relational import _bucketed_join_tables

    bo, bl, cleanup = _bucketed_join_tables(spark, SF_SMOKE)
    # At smoke scale the planner rightly BROADCASTS the tiny side (and
    # disables bucketed reading) — the at-100TB path this test pins is
    # the sort-merge join, where co-located buckets are what remove the
    # Exchange. Suppress broadcasting for the assertion only.
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed orders⋈lineitem planned a shuffle:\n" + plan
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        cleanup()


def test_partitioned_scan_is_pruned(spark):
    """q113's point: the event_type filter is satisfied by DIRECTORY
    pruning — every file the scan will read lives under the
    event_type=click partition, and the scan carries a PartitionFilter
    (never a row-level Filter on the partition column)."""
    from fluvio_demo_apps_rust_spark.plans.events import _partition_pruned_scan

    import pyspark.sql.functions as F

    back, cleanup = _partition_pruned_scan(spark, SF_SMOKE)
    try:
        # inputFiles() lists the relation BEFORE pruning; the files the
        # scan actually READS are what pruning bounds.
        files = [
            r.f
            for r in back.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        ]
        assert files, "pruned scan read zero files"
        assert all("event_type=click" in f for f in files), files
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_type" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0], plan
    finally:
        cleanup()
