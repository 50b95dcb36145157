"""URL canonicalization (functions/web.py) — edge cases the synthetic
corpus doesn't exercise, plus the llm_url_dedup keep-min contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions import web as W
from fluvio_demo_apps_rust_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(W.canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_edge_cases(spark):
    cases = {
        # scheme+host lowercased, path case preserved
        "HTTPS://WWW.Ex.COM/Docs/A": "https://www.ex.com/Docs/A",
        # default ports stripped (https:443, http:80)
        "https://ex.com:443/a": "https://ex.com/a",
        "http://ex.com:80/a": "http://ex.com/a",
        # NON-default port kept
        "https://ex.com:8443/a": "https://ex.com:8443/a",
        # fragment dropped
        "https://ex.com/a#frag": "https://ex.com/a",
        # all-tracking query drops the '?' entirely
        "https://ex.com/a?utm_source=x&utm_medium=y&gclid=z": "https://ex.com/a",
        # mixed: tracking dropped, survivors SORTED
        "https://ex.com/a?z=1&utm_campaign=c&a=2&fbclid=f": "https://ex.com/a?a=2&z=1",
        # 'ref' dropped, 'referrer' (not a tracking key) kept
        "https://ex.com/a?ref=tw&referrer=keep": "https://ex.com/a?referrer=keep",
        # fragment after query: both rules compose
        "HTTPS://EX.COM:443/a?ref=x&b=1#s": "https://ex.com/a?b=1",
        # no path, no query
        "https://ex.com": "https://ex.com",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_url_dedup_keep_min_and_host(spark):
    df = REGISTRY["llm_url_dedup"].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert rows, "dedup output empty"
    # host is derivable from the canonical URL on every row
    for r in rows:
        assert r.canonical_url.startswith("https://" + r.host + "/") or r.canonical_url == "https://" + r.host
        assert "#" not in r.canonical_url
        assert "utm_" not in r.canonical_url and "ref=" not in r.canonical_url
    # keep_id is the min doc_id of its group: recompute independently
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    canon = docs.select(
        "doc_id",
        W.canonicalize_url(W.synth_url(F.col("doc_id"), F.col("source"))).alias("c"),
    )
    expect = {r.c: r.m for r in canon.groupBy("c").agg(F.min("doc_id").alias("m")).collect()}
    assert {r.canonical_url: r.keep_id for r in rows} == expect


def test_url_dedup_has_real_dup_groups(spark):
    rows = REGISTRY["llm_url_dedup"].fn(spark, SF_SMOKE).collect()
    assert any(r.cnt > 1 for r in rows), "synthetic corpus produced no dup groups"


def test_canonicalize_idempotent_and_invariant(spark):
    """Canonicalizer properties over a generated URL grammar, one Spark
    job for all cases: IDEMPOTENCE (canon(canon(u)) == canon(u)),
    no fragment/tracking params in output, lowercase scheme+host,
    non-default ports preserved."""
    import itertools

    schemes = ["https://", "HTTPS://", "http://"]
    hosts = ["Ex.COM", "ex.com", "WWW.Ex.Org"]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["/a/B", "/a", ""]
    queries = ["", "?utm_source=x", "?b=2&a=1", "?ref=t&z=9&utm_medium=m", "?a=1&a=1"]
    frags = ["", "#f", "#a?b=1"]
    urls = [
        s + h + p + pa + q + f
        for s, h, p, pa, q, f in itertools.product(schemes, hosts, ports, paths, queries, frags)
        if pa or not p  # a port with no path keeps the ':443/' strip assumption honest
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = W.canonicalize_url(F.col("url")).alias("c1")
    out = df.select(F.col("url"), once).select(
        "url", "c1", W.canonicalize_url(F.col("c1")).alias("c2")
    )
    rows = out.collect()
    assert len(rows) == len(urls)
    for r in rows:
        assert r.c1 == r.c2, f"not idempotent: {r.url!r} -> {r.c1!r} -> {r.c2!r}"
        assert "#" not in r.c1, r.url
        assert "utm_" not in r.c1 and "ref=" not in r.c1, r.url
        scheme_host = r.c1.split("/")[0] + "//" + r.c1.split("/")[2] if "//" in r.c1 else r.c1
        assert scheme_host == scheme_host.lower(), r.url
        if ":8080" in r.url:
            assert ":8080" in r.c1, r.url
