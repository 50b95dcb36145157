"""llm_substring_dedup pins against a brute-force window oracle on a
handcrafted corpus: shared cross-doc blocks, an intra-doc repeat, a
short (< K) doc, and a fully-unique doc."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from fluvio_demo_apps_rust_spark.plans import REGISTRY
from fluvio_demo_apps_rust_spark.plans.llm import _SSD_K


def _brute(docs: dict[int, str], k: int = _SSD_K) -> dict[int, tuple[int, int]]:
    corpus: Counter[str] = Counter()
    wins = {}
    for did, t in docs.items():
        ws = [t[i : i + k] for i in range(max(len(t) - k + 1, 0))]
        wins[did] = ws
        corpus.update(ws)
    return {
        did: (len(ws), sum(1 for w in ws if corpus[w] >= 2))
        for did, ws in wins.items()
    }


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    shared = "the quick brown fox jumps over the lazy dog near the bank"
    rep = "x" * 45  # intra-doc repeat: 'xxx...' windows repeat within one doc
    docs = {
        1: "alpha " + shared + " omega unique tail one two three four",
        2: "prefix words here " + shared + " completely different ending text",
        3: rep + " middle filler " + rep,
        4: "short doc",  # < K chars -> zero windows
        5: "entirely unique content with no duplicated windows at all q z j",
    }
    d = tmp_path_factory.mktemp("ssd")
    pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": list(docs.values()),
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for t in docs.values()],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d), docs


def test_substring_dedup_matches_brute_force(spark, corpus_dir):
    sf_dir, docs = corpus_dir
    got = {
        r.doc_id: r for r in REGISTRY["llm_substring_dedup"].fn(spark, sf_dir).collect()
    }
    exp = _brute(docs)
    assert set(got) == set(exp)
    for did, (n_win, n_dup) in exp.items():
        row = got[did]
        assert (row.n_windows, row.n_dup_windows) == (n_win, n_dup), did
        assert row.dup_bp == (n_dup * 10000 // n_win if n_win else 0)
    # the handcrafted structure actually exercised every branch
    assert exp[4][0] == 0  # short doc: no windows
    assert exp[5][1] == 0  # unique doc: no duplicated windows
    assert exp[3][1] > 0  # intra-doc repeat counts as duplicated
    assert exp[1][1] > 0 and exp[2][1] > 0  # cross-doc shared block flagged


def test_rle_gram_kernels_match_python(spark):
    """r14 skew-proofing internals: the row-local sort+RLE pre-
    aggregates (functions/dedup.py rle_gram_counts / rle_gram_positions)
    must reproduce collections.Counter / position-grouping exactly,
    including empty arrays, all-equal runs, and singleton docs."""
    from collections import Counter, defaultdict

    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.functions.dedup import (
        rle_gram_counts,
        rle_gram_positions,
    )

    cases = [
        [],
        [7],
        [5, 5, 5, 5],
        [3, 1, 2, 1, 3, 3, 9, 2],
        [-4, 0, -4, 0, 8],
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(cases)], "i int, g array<bigint>")
    got = {
        r.i: sorted((x.ghash, x.k_local) for x in r.o)
        for r in df.select(
            "i", rle_gram_counts(F.array_sort("g")).alias("o")
        ).collect()
    }
    for i, v in enumerate(cases):
        assert got[i] == sorted(Counter(v).items()), i

    dfp = df.select(
        "i",
        F.expr("transform(g, (x, p) -> struct(x AS ghash, p AS pos0))").alias("gp"),
    ).where(F.size("gp") > 0)
    gotp = {
        r.i: {x.ghash: sorted(x.ps) for x in r.o}
        for r in dfp.select(
            "i", rle_gram_positions(F.array_sort("gp")).alias("o")
        ).collect()
    }
    for i, v in enumerate(cases):
        if not v:
            continue
        exp = defaultdict(list)
        for p, x in enumerate(v):
            exp[x].append(p)
        assert gotp[i] == {k: sorted(ps) for k, ps in exp.items()}, i
