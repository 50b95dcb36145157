"""Property pins for functions.ranks.bucketed_global_rank: the
two-phase deterministic-bucket prefix sum must agree with a plain
sorted enumeration for ANY integer key distribution — including the
degenerate single-value key (every row in one bucket), heavy skew,
negatives, and bucket counts from 1 (pure fallback: one intra-bucket
window) to far more buckets than rows (mostly empty buckets)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fluvio_demo_apps_rust_spark.functions.ranks import bucketed_global_rank


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    n_buckets=st.sampled_from([1, 2, 7, 256, 4096]),
)
def test_rank_matches_sorted_enumeration(spark, keys, n_buckets):
    rows = [(k, i) for i, k in enumerate(keys)]  # i = unique tiebreak
    df = spark.createDataFrame(rows, "k long, tb long")
    got = {
        (r.k, r.tb): (r.rn, r.n_total)
        for r in bucketed_global_rank(df, "k", ("tb",), n_buckets=n_buckets).collect()
    }
    expected = sorted(rows)
    n = len(rows)
    for rank, (k, tb) in enumerate(expected, start=1):
        assert got[(k, tb)] == (rank, n), (
            f"key={k} tb={tb}: got {got[(k, tb)]}, want ({rank}, {n}) "
            f"[n_buckets={n_buckets}]"
        )
