"""Engine-wide physical-plan invariants over the registered query
surface: the scale posture the README claims, pinned as tests.

- No row-at-a-time Python evaluation (BatchEvalPython / PythonUDF) in
  any query plan — Python appears only as Arrow-batched MapInPandas /
  FlatMapGroupsInPandas harnesses.
- No CartesianProduct nodes: every cross-ish join must be a bounded
  broadcast (BroadcastNestedLoopJoin over a small dimension/probe set
  is acceptable; an unbounded shuffled cartesian is not).
"""

from __future__ import annotations

import pytest

from fluvio_demo_apps_rust_spark.plans import REGISTRY

from .conftest import SF_SMOKE

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
