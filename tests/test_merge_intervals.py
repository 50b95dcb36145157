"""operators/intervals.merge_intervals edge cases the sf fixtures
can't be relied on to contain: touching spans (half-open adjacency
must merge), an early LONG interval swallowing several later short
ones (running-max sweep, not lag), duplicate intervals, per-key
independence, span_id numbering, and a brute-force cross-check over a
deterministic pseudo-random fixture (mixed lengths)."""

from __future__ import annotations

from fluvio_demo_apps_rust_spark.operators.intervals import merge_intervals


def _merge_brute(iv: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out: list[list[int]] = []
    for s, e in sorted(iv):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def _run(spark, iv: list[tuple[int, int]], key: str = "k") -> list[tuple]:
    df = spark.createDataFrame(
        [(key, s, e) for s, e in iv], "doc string, s long, e long"
    )
    rows = merge_intervals(df, ["doc"]).collect()
    return sorted((r.span_id, r.s, r.e) for r in rows)


def test_disjoint_stay_separate(spark):
    assert _run(spark, [(1, 3), (10, 12)]) == [(1, 1, 3), (2, 10, 12)]


def test_overlap_merges(spark):
    assert _run(spark, [(1, 5), (3, 8)]) == [(1, 1, 8)]


def test_touching_merges(spark):
    # half-open [1,5) + [5,9): no gap character between them
    assert _run(spark, [(1, 5), (5, 9)]) == [(1, 1, 9)]


def test_long_interval_swallows_shorter(spark):
    # [1,100) covers [10,20) and [30,40); [150,160) is separate.
    # A lag-based (previous row only) merge would wrongly split after
    # [10,20) — this pins the running-max semantics.
    assert _run(spark, [(1, 100), (10, 20), (30, 40), (150, 160)]) == [
        (1, 1, 100),
        (2, 150, 160),
    ]


def test_duplicate_intervals(spark):
    assert _run(spark, [(4, 7), (4, 7), (4, 7)]) == [(1, 4, 7)]


def test_keys_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("b", 3, 8)], "doc string, s long, e long"
    )
    got = sorted(
        (r.doc, r.span_id, r.s, r.e) for r in merge_intervals(df, ["doc"]).collect()
    )
    assert got == [("a", 1, 1, 5), ("b", 1, 3, 8)]


def test_brute_force_pseudo_random(spark):
    x, iv = 98765, []
    for _ in range(300):
        x = (1103515245 * x + 12345) % (1 << 31)
        s = x % 5000
        x = (1103515245 * x + 12345) % (1 << 31)
        iv.append((s, s + 1 + x % 80))
    got = _run(spark, iv)
    want = [(i + 1, s, e) for i, (s, e) in enumerate(_merge_brute(iv))]
    assert got == want
