"""Edge cases the sf fixtures can't be relied on to contain:

- interval_coverage (q119's kernel): boundaries exactly ON a bucket
  edge, intervals that abut without overlapping (coverage must be
  continuous, not off-by-one), duplicate timestamps, a covered span
  crossing a bucket boundary, and a brute-force cross-check over a
  deterministic pseudo-random fixture.
- compact_changelog (cdc_changelog_compaction's kernel): latest-wins
  semantics under delete-then-reinsert (the key resurrects) and
  update-after-insert; tombstone-last drops the key.
"""

from __future__ import annotations

from fluvio_demo_apps_rust_spark.plans.cdc import compact_changelog
from fluvio_demo_apps_rust_spark.plans.events import interval_coverage

DUR = 300
BUCKET = 3600


def _brute(starts: list[int]) -> int:
    """Union length of [s, s+DUR) intervals by merge."""
    total = 0
    cur_s = cur_e = None
    for s in sorted(starts):
        e = s + DUR
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def _run(spark, starts: list[int]) -> int:
    df = spark.createDataFrame(
        [("t", s) for s in starts], "event_type string, t long"
    )
    rows = interval_coverage(df, duration=DUR, bucket=BUCKET).collect()
    assert len(rows) == 1
    return rows[0].covered_sec


def test_single_interval(spark):
    assert _run(spark, [100]) == DUR


def test_abutting_intervals_are_continuous(spark):
    # [0,300) + [300,600): union is 600 — an off-by-one at the seam
    # (or a double count) breaks this
    assert _run(spark, [0, 300]) == 600


def test_end_exactly_on_bucket_boundary(spark):
    # interval [3300, 3600): its end boundary is the first instant of
    # bucket 1 — bucket 0's tail term must count [3300, 3600) and
    # bucket 1 must contribute nothing
    assert _run(spark, [3300]) == DUR


def test_start_exactly_on_bucket_boundary(spark):
    assert _run(spark, [3600]) == DUR


def test_span_crossing_bucket_boundary(spark):
    # [3500, 3800): 100 s in bucket 0, 200 s in bucket 1
    assert _run(spark, [3500]) == DUR


def test_duplicate_timestamps(spark):
    assert _run(spark, [1000, 1000, 1000]) == DUR


def test_disjoint_intervals(spark):
    assert _run(spark, [0, 10_000]) == 2 * DUR


def test_chain_covering_many_buckets(spark):
    # staggered starts every 200 s for 2.5 hours: fully continuous
    starts = list(range(0, 9000, 200))
    assert _run(spark, starts) == _brute(starts) == 9000 - 200 + DUR


def test_brute_force_pseudo_random(spark):
    # deterministic LCG — dense + sparse mix across ~6 buckets,
    # including exact-boundary hits
    x, starts = 12345, []
    for _ in range(200):
        x = (1103515245 * x + 12345) % (1 << 31)
        starts.append(x % 20_000)
    starts += [0, 3600, 7200 - DUR, 7200]
    assert _run(spark, starts) == _brute(starts)


def test_types_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 7200)], "event_type string, t long"
    )
    got = {
        r.event_type: r.covered_sec
        for r in interval_coverage(df, duration=DUR, bucket=BUCKET).collect()
    }
    assert got == {"a": DUR, "b": DUR}


# ---- compact_changelog -----------------------------------------------


def _compact(spark, rows):
    df = spark.createDataFrame(rows, "k long, seq long, op string, v long")
    return {
        r.k: (r.v, r.last_seq, r.n_versions)
        for r in compact_changelog(df).collect()
    }


def test_tombstone_last_drops_key(spark):
    got = _compact(spark, [(1, 1, "I", 10), (1, 2, "D", None)])
    assert got == {}


def test_reinsert_after_tombstone_resurrects(spark):
    got = _compact(
        spark, [(1, 1, "I", 10), (1, 2, "D", None), (1, 3, "I", 30)]
    )
    assert got == {1: (30, 3, 3)}


def test_update_wins_over_insert(spark):
    got = _compact(spark, [(2, 5, "I", 10), (2, 9, "U", 99), (3, 1, "I", 7)])
    assert got == {2: (99, 9, 2), 3: (7, 1, 1)}
