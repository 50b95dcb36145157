"""Exact distributed selection (operators/selection.py) vs brute force."""

from __future__ import annotations

import random

import pytest

from fluvio_demo_apps_rust_spark.operators.selection import selection_kth


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x double")


def test_selection_matches_sorted_indexing(spark):
    rng = random.Random(8)
    # 2-dp values spanning several top-level histogram bins, with ties
    vals = [round(rng.uniform(0, 450_000), 2) for _ in range(3000)]
    vals += [vals[17]] * 5 + [vals[400]] * 3  # forced ties
    df = _df(spark, vals)
    s = sorted(vals)
    n = len(vals)
    for k in [1, 2, n // 4, (n + 1) // 2, n // 2 + 1, n - 1, n]:
        assert selection_kth(df, "x", k) == pytest.approx(s[k - 1], abs=1e-9), k


def test_selection_skips_nulls_and_bounds(spark):
    df = spark.createDataFrame(
        [(1.25,), (None,), (3.5,), (2.0,), (None,)], "x double"
    )
    assert selection_kth(df, "x", 1) == 1.25
    assert selection_kth(df, "x", 3) == 3.5
    with pytest.raises(ValueError):
        selection_kth(df, "x", 4)  # nulls don't count
    with pytest.raises(ValueError):
        selection_kth(df, "x", 0)


def test_selection_single_bin_degenerate(spark):
    # all values inside ONE finest-level bin (ties everywhere)
    df = _df(spark, [7.77] * 50 + [7.78] * 50)
    assert selection_kth(df, "x", 50) == 7.77
    assert selection_kth(df, "x", 51) == 7.78


def test_selection_negative_values(spark):
    """r8 ADVICE (medium): truncating-cast bin keys collapsed all cents
    in (-width, width) into bin 0 and the narrowing bounds assumed
    non-negative inputs — mixed-sign columns silently returned wrong
    'exact' order statistics. Pin floor-division bins + sign-agnostic
    narrowing on values straddling zero, including ties at and around
    the boundary and an all-negative column."""
    rng = random.Random(9)
    vals = [round(rng.uniform(-250_000, 250_000), 2) for _ in range(2500)]
    vals += [0.0] * 3 + [-0.01] * 3 + [0.01] * 3  # boundary ties
    df = _df(spark, vals)
    s = sorted(vals)
    n = len(vals)
    for k in [1, n // 4, (n + 1) // 2, n // 2 + 1, 3 * n // 4, n]:
        assert selection_kth(df, "x", k) == pytest.approx(s[k - 1], abs=1e-9), k

    neg = [round(rng.uniform(-90_000, -0.01), 2) for _ in range(400)]
    dfn = _df(spark, neg)
    sn = sorted(neg)
    for k in [1, 200, 400]:
        assert selection_kth(dfn, "x", k) == pytest.approx(sn[k - 1], abs=1e-9), k


def test_grouped_kth_negative_values(spark):
    from fluvio_demo_apps_rust_spark.operators.selection import grouped_kth

    rng = random.Random(10)
    rows = []
    for g in ["neg", "mix", "pos"]:
        lo, hi = {"neg": (-50_000.0, -1.0), "mix": (-5_000.0, 5_000.0), "pos": (1.0, 50_000.0)}[g]
        for _ in range(rng.randint(50, 150)):
            rows.append((g, round(rng.uniform(lo, hi), 2)))
    rows += [("mix", 0.0)] * 5  # zero-boundary ties
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r.grp: (r.n, r.value)
        for r in grouped_kth(df, "g", "x", lambda n: (n + 1) / 2).collect()
    }
    for g in ["neg", "mix", "pos"]:
        vals = sorted(v for gg, v in rows if gg == g)
        n = len(vals)
        assert got[g] == (n, pytest.approx(vals[(n + 1) // 2 - 1], abs=1e-9)), g


def test_grouped_kth_matches_brute_force(spark):
    import random

    from fluvio_demo_apps_rust_spark.operators.selection import grouped_kth

    rng = random.Random(42)
    rows = []
    for g in ["a", "b", "c"]:
        for _ in range(rng.randint(30, 200)):
            rows.append((g, round(rng.uniform(0, 300_000), 2)))
    rows += [("a", rows[0][1])] * 4  # ties inside one group
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r.grp: (r.n, r.value)
        for r in grouped_kth(df, "g", "x", lambda n: (n + 1) / 2).collect()
    }
    for g in ["a", "b", "c"]:
        vals = sorted(v for gg, v in rows if gg == g)
        n = len(vals)
        assert got[g] == (n, pytest.approx(vals[(n + 1) // 2 - 1], abs=1e-9)), g

def test_selection_kths_multi_rank_shared_passes(spark):
    """r13-opt: one shared narrowing serves several ranks (and yields n
    from pass 1). Ranks landing in the SAME bin, in DIFFERENT top-level
    bins, and duplicated ranks must all match sorted indexing."""
    from fluvio_demo_apps_rust_spark.operators.selection import selection_kths

    rng = random.Random(11)
    vals = [round(rng.uniform(-100_000, 400_000), 2) for _ in range(2000)]
    vals += [vals[3]] * 4  # ties
    df = _df(spark, vals)
    s = sorted(vals)
    n = len(vals)
    ks = [1, 2, n // 4, (n + 1) // 2, n // 2 + 1, n]  # incl. adjacent medians
    got_n, got = selection_kths(df, "x", ks=ks)
    assert got_n == n
    for k in ks:
        assert got[k] == pytest.approx(s[k - 1], abs=1e-9), k
    # k_of_n face (no separate count job): same answers
    got_n2, got2 = selection_kths(df, "x", k_of_n=lambda m: [(m + 1) // 2, m // 2 + 1])
    assert got_n2 == n and got2 == {
        (n + 1) // 2: got[(n + 1) // 2],
        n // 2 + 1: got[n // 2 + 1],
    }
    with pytest.raises(ValueError):
        selection_kths(df, "x", ks=[n + 1])


def test_kth_from_binned_matches_global_selection(spark):
    """r13-opt (q105 shape): the global k-th derived from the grouped
    bin histogram (no extra corpus scan) equals plain selection."""
    from fluvio_demo_apps_rust_spark.operators.selection import (
        grouped_binned,
        kth_from_binned,
        selection_kth,
    )

    rng = random.Random(12)
    rows = [
        (g, round(rng.uniform(-20_000, 20_000), 2))
        for g in ["a", "b", "c"]
        for _ in range(rng.randint(100, 300))
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    base, binned = grouped_binned(df, "g", "x")
    n, v = kth_from_binned(base, binned, lambda n: (n + 1) // 2)
    assert n == len(rows)
    s = sorted(x for _, x in rows)
    assert v == pytest.approx(s[(n + 1) // 2 - 1], abs=1e-9)
    assert v == pytest.approx(selection_kth(df, "x", (n + 1) // 2), abs=1e-9)


def test_selection_kths_adaptive_skip_and_value_range(spark):
    """r14-opt: range-adaptive level skipping (narrow columns resolve
    in fewer passes) and a caller-supplied value_range cover must not
    change any answer — including a LOOSE cover, which only gates
    pass-skipping and never filters rows."""
    from fluvio_demo_apps_rust_spark.operators.selection import selection_kths

    rng = random.Random(13)
    # narrow column: every value inside one 10k-cent exact span
    vals = [round(rng.uniform(0, 40), 2) for _ in range(1500)]
    df = _df(spark, vals)
    s = sorted(vals)
    n = len(vals)
    ks = [1, (n + 1) // 2, n]
    _, plain = selection_kths(df, "x", ks=ks)
    _, tight = selection_kths(df, "x", ks=ks, value_range=(0, 4000))
    _, loose = selection_kths(df, "x", ks=ks, value_range=(-100, 9000))
    for k in ks:
        assert plain[k] == pytest.approx(s[k - 1], abs=1e-9), k
    assert plain == tight == loose
    # return_stats reports the observed cents bounds
    n2, got, (vmin, vmax) = selection_kths(
        df, "x", ks=[(n + 1) // 2], return_stats=True
    )
    assert n2 == n and got[(n + 1) // 2] == plain[(n + 1) // 2]
    cents = sorted(int(v * 100 + 0.5) for v in vals)
    assert (vmin, vmax) == (cents[0], cents[-1])


def test_selection_kths_empty_and_exclusive_ranks(spark):
    """r13 ADVICE: no requested ranks returns (n, {}) instead of an
    opaque where(None) crash, and ks + k_of_n together raise."""
    from fluvio_demo_apps_rust_spark.operators.selection import selection_kths

    df = _df(spark, [1.0, 2.0, 3.0])
    assert selection_kths(df, "x", ks=[]) == (3, {})
    assert selection_kths(df, "x", k_of_n=lambda n: []) == (3, {})
    with pytest.raises(ValueError):
        selection_kths(df, "x", ks=[1], k_of_n=lambda n: [1])
