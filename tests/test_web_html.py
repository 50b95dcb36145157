"""HTML -> text extraction (functions/web.py): round-trip, no-markup-
survivors, idempotence, and Spark/DuckDB twin parity on adversarial
inputs the ASCII gate corpus can't produce."""

from __future__ import annotations

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions import web as W


def _extract_rows(spark, rows):
    """rows: [(doc_id, source, text)] -> {doc_id: extracted}"""
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = df.select(
        "doc_id",
        W.extract_html_text(
            W.synth_html(F.col("doc_id"), F.col("source"), F.col("text"))
        ).alias("txt"),
    )
    return {r.doc_id: r.txt for r in out.collect()}


def test_html_extract_round_trip_all_variants(spark):
    text = "alpha beta gamma, delta. epsilon"
    got = _extract_rows(spark, [(i, "src", text) for i in range(4)])
    for i in range(4):
        assert "<" not in got[i] and ">" not in got[i], got[i]
        assert text in got[i], got[i]
        # block structure: title, h1 and body are separate lines
        lines = got[i].split("\n")
        assert lines[0] == f"Doc {i}"
        assert lines[1] == "src"
        assert text in lines[2]


def test_html_extract_entity_round_trip(spark):
    # text containing markup-shaped substrings must survive VERBATIM
    # (entity-escaped into the page, decoded back out) — including a
    # pre-escaped entity, which must NOT double-decode
    nasty = "a < b, c > d, x&y, <tag attr='1'>, &amp; literal"
    got = _extract_rows(spark, [(0, "s", nasty), (1, "s", nasty), (2, "s", nasty), (3, "s", nasty)])
    for i in range(4):
        assert nasty in got[i], got[i]


def test_html_extract_idempotent_and_markup_free(spark):
    # on markup-free text the extractor is idempotent: re-running it on
    # its own output changes nothing (whitespace already normalized,
    # no tags to strip)
    texts = [
        "plain words only",
        "  leading and trailing   spaces \t tabs  ",
        "multi\n\nline\n input\n",
        "",
        "unicode café naïve — ok",
    ]
    rows = [(i, "s", t) for i, t in enumerate(texts)]
    first = _extract_rows(spark, rows)
    df = spark.createDataFrame(
        [(k, v) for k, v in first.items()], "doc_id long, txt string"
    )
    again = {
        r.doc_id: r.t2
        for r in df.select(
            "doc_id", W.extract_html_text(F.col("txt")).alias("t2")
        ).collect()
    }
    for k, v in first.items():
        assert "<" not in v and ">" not in v
        assert again[k] == v, (v, again[k])


def test_html_extract_oracle_twin_parity(spark):
    """The DuckDB twin must extract the identical text on inputs the
    gate corpus can't produce (markup-shaped text, entities, unicode,
    exotic whitespace) — same-style pin as the URL canonicalizer."""
    import duckdb

    texts = [
        "a < b > c & d",
        "<script>evil()</script> not a real tag",
        "&lt;already escaped&gt; &amp; more",
        "café — naïve",
        "spaces\tand\nnewlines   everywhere",
    ]
    rows = [(i, "src", t) for i, t in enumerate(texts)]
    got = _extract_rows(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    synth = W.ORACLE_SYNTH_HTML.format(esc=W.ORACLE_ESC_TEXT)
    sql = (
        f"WITH h AS (SELECT doc_id, {synth} AS html FROM documents) "
        f"SELECT doc_id, {W.oracle_extract_sql('html')} AS txt FROM h"
    )
    oracle = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert oracle == got


def test_web_pipeline_funnel_invariants(spark):
    """The attrition ledger must be a true funnel per host:
    unique pages <= allowed urls (dedup can only shrink), quality
    passes <= unique pages, chars counted only for passing pages
    (>= 200 each), and robots must block SOMETHING somewhere (the
    synthetic rules are built to bite) while never blocking all."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    rows = (
        REGISTRY["llm_web_pipeline"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    total_blocked = 0
    for r in rows:
        assert 0 <= r.n_robots_blocked <= r.n_urls, r
        assert r.n_unique_pages <= r.n_urls - r.n_robots_blocked, r
        assert 0 <= r.n_quality_pass <= r.n_unique_pages, r
        assert r.total_text_chars >= 200 * r.n_quality_pass, r
        total_blocked += r.n_robots_blocked
    assert total_blocked > 0
    assert sum(r.n_unique_pages for r in rows) > 0
