"""Streaming family: stateful quality monitors, token packing, manifests and frontier dedup over Structured Streaming.

Split from plans/llm.py (r10 verdict #5); registration order across
the split is irrelevant — plans/__init__ orders the driver-visible
enumeration by canonical_order.ORDER.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ...functions import curation as C  # noqa: F401
from ...functions import dedup as X  # noqa: F401
from ...functions import multimodal as M  # noqa: F401
from ...functions import similarity as S  # noqa: F401
from ...functions import text as TX  # noqa: F401
from ...functions import web as W  # noqa: F401
from ..base import REGISTRY as _REGISTRY  # noqa: F401  (same-package oracle reuse)
from ..base import fround, load, register  # noqa: F401
from .common import _TOKS  # noqa: F401



@register(
    "llm_stream_incremental_dedup",
    tags=("llm", "curation", "dedup", "streaming"),
    # Deterministic two-microbatch stream vs a 20-doc static snapshot:
    # batch 1 = docs 100-114 (103/107/111 duplicate snapshot texts 3/7/11),
    # batch 2 = docs 200-214 (200-204 duplicate batch-1 texts 110-114,
    # 205/209 duplicate snapshot 5/9). Duplicates never co-occur within
    # a batch, so the dropDuplicates survivor is deterministic: the
    # earliest batch's occurrence. The oracle regenerates both batches,
    # keeps the first occurrence per hash, and drops snapshot hashes.
    oracle="""
WITH snap AS (
  SELECT 'snapshot text ' || CAST(i AS VARCHAR) AS text
  FROM (SELECT unnest(generate_series(0, 19)) AS i)),
b1 AS (
  SELECT 100 + i AS doc_id, 1 AS batch,
         CASE WHEN i % 4 = 3 THEN 'snapshot text ' || CAST(i AS VARCHAR)
              ELSE 'fresh b1 text ' || CAST(i AS VARCHAR) END AS text
  FROM (SELECT unnest(generate_series(0, 14)) AS i)),
b2 AS (
  SELECT 200 + i AS doc_id, 2 AS batch,
         CASE WHEN i < 5 THEN 'fresh b1 text ' || CAST(10 + i AS VARCHAR)
              WHEN i % 4 = 1 THEN 'snapshot text ' || CAST(i AS VARCHAR)
              ELSE 'fresh b2 text ' || CAST(i AS VARCHAR) END AS text
  FROM (SELECT unnest(generate_series(0, 14)) AS i)),
stream AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
firsts AS (
  SELECT doc_id, md5(text) AS content_hash
  FROM (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY batch, doc_id) AS rn
        FROM stream)
  WHERE rn = 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, content_hash
FROM firsts
WHERE content_hash NOT IN (SELECT md5(text) FROM snap)
""",
)
def llm_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming incremental dedup: a document stream is deduped
    against BOTH the already-ingested static snapshot (stream-static
    anti-join on content hash) and itself across microbatches
    (streaming dropDuplicates state) — the continuous-ingestion face
    of llm_incremental_dedup. Driven availableNow, one file per
    microbatch."""
    import os
    import tempfile
    import uuid
    from pathlib import Path

    src = Path(tempfile.mkdtemp(prefix="q_sid_"))
    b1 = [
        (100 + i, f"snapshot text {i}" if i % 4 == 3 else f"fresh b1 text {i}")
        for i in range(15)
    ]
    b2 = [
        (
            200 + i,
            f"fresh b1 text {10 + i}"
            if i < 5
            else (f"snapshot text {i}" if i % 4 == 1 else f"fresh b2 text {i}"),
        )
        for i in range(15)
    ]
    f1, f2 = src / "a_b1.jsonl", src / "b_b2.jsonl"
    f1.write_text(
        "\n".join(f'{{"doc_id": {d}, "text": "{t}"}}' for d, t in b1) + "\n"
    )
    f2.write_text(
        "\n".join(f'{{"doc_id": {d}, "text": "{t}"}}' for d, t in b2) + "\n"
    )
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    os.utime(f2, (1_700_000_100, 1_700_000_100))
    snapshot = spark.createDataFrame(
        [(f"snapshot text {i}",) for i in range(20)], "text string"
    ).select(F.md5("text").alias("content_hash"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("doc_id", F.md5("text").alias("content_hash"))
        .dropDuplicates(["content_hash"])
        .join(snapshot, "content_hash", "left_anti")
    )
    name = "q_sid_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(f"SELECT doc_id, content_hash FROM {name}")


@register(
    "llm_greedy_pack_audit",
    tags=("llm", "curation", "packing", "stateful"),
    oracle=f"""
WITH RECURSIVE t AS (
  SELECT doc_id, least(len({_TOKS}), 2048)::BIGINT AS n,
         (doc_id % 8)::BIGINT AS shard,
         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM documents),
walk(shard, rn, n, pack_id, fill) AS (
  SELECT shard, rn, n, CAST(0 AS BIGINT), n FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.n,
         CASE WHEN w.fill + t.n > 2048 THEN w.pack_id + 1 ELSE w.pack_id END,
         CASE WHEN w.fill + t.n > 2048 THEN t.n ELSE w.fill + t.n END
  FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1)
SELECT shard, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS used_tokens,
       floor(sum(n)::DOUBLE / 2048.0 * 1000000 + 0.5) / 1000000.0 AS fill_frac
FROM walk
GROUP BY shard, pack_id
""",
)
def llm_greedy_pack_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY boundary-respecting sequence packing + its padding audit —
    the strategy llm_sequence_pack deliberately avoids (concat-then-
    chunk splits documents at window boundaries; greedy first-fit
    never splits a document, paying padding waste instead — the
    trade-off most labs choose for pretraining). The fold is
    inherently sequential (pack state resets on overflow), so at scale
    it SHARDS: docs hash to independent shards, each shard packs its
    own doc_id-ordered stream in one Arrow applyInPandas fold — at
    100 TB this is one task per shard with O(shard) memory in the
    iterator, never a global order. Output is the per-pack audit
    (docs, used tokens, fill fraction) — the padding-waste table that
    decides between the two packing strategies. Oracle: the same fold
    as a per-shard recursive CTE (the semantic spec — one row per doc
    per step; fine at oracle scale, the reason Spark shards instead)."""
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    docs = d.select(
        F.col("doc_id"),
        F.least(F.size(TX.tokens("text")).cast("long"), F.lit(2048)).alias("n"),
        (F.col("doc_id") % 8).alias("shard"),
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        pack_ids = []
        pid, fill = 0, 0
        started = False
        for n in pdf["n"]:
            n = int(n)
            if not started:
                pid, fill, started = 0, n, True
            elif fill + n > 2048:
                pid, fill = pid + 1, n
            else:
                fill += n
            pack_ids.append(pid)
        out = pdf[["shard", "n"]].copy()
        out["pack_id"] = pack_ids
        return out

    packed = docs.groupBy("shard").applyInPandas(
        fold, "shard bigint, n bigint, pack_id bigint"
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("used_tokens"),
        fround(F.sum("n").cast("double") / F.lit(2048.0), 6).alias("fill_frac"),
    )


@register(
    "q106_stream_web_frontier",
    tags=("llm", "web", "streaming", "dedup"),
    oracle="""
SELECT * FROM (VALUES
  (CAST(1  AS BIGINT), 'https://www.alpha.example.com/p/0',      'www.alpha.example.com'),
  (CAST(2  AS BIGINT), 'https://www.alpha.example.com/p/1',      'www.alpha.example.com'),
  (CAST(3  AS BIGINT), 'https://www.alpha.example.com/p/2',      'www.alpha.example.com'),
  (CAST(5  AS BIGINT), 'https://www.alpha.example.com/p/4',      'www.alpha.example.com'),
  (CAST(6  AS BIGINT), 'https://www.alpha.example.com/p/5?id=2', 'www.alpha.example.com'),
  (CAST(7  AS BIGINT), 'https://www.alpha.example.com/p/6',      'www.alpha.example.com'),
  (CAST(8  AS BIGINT), 'https://www.alpha.example.com/p/7',      'www.alpha.example.com'),
  (CAST(15 AS BIGINT), 'https://www.beta.example.com/p/0',       'www.beta.example.com'),
  (CAST(17 AS BIGINT), 'https://www.beta.example.com/p/2',       'www.beta.example.com'),
  (CAST(18 AS BIGINT), 'https://www.beta.example.com/p/3',       'www.beta.example.com')
) t(url_id, canonical_url, host)
""",
)
def q106_stream_web_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING crawl frontier — the continuous-ingestion face of the
    web first stage: a URL stream is canonicalized row-locally,
    robots-filtered via a stream-static join against the per-host
    rules (blocked URLs never enter dedup state — frontier
    semantics), then deduped on the canonical form ACROSS microbatches
    with streaming dropDuplicates state. Two deterministic
    microbatches (one file each, availableNow): batch 2 re-crawls
    four batch-1 alpha pages under DIFFERENT mess variants (:443,
    re-ordered tracking params, fragment, uppercased host) — all four
    must dedup against batch-1 state — and introduces host beta, whose
    '/p/1' rule blocks one URL. Duplicates never co-occur within a
    batch, so the dropDuplicates survivor is deterministic. The
    oracle is the hand-computed survivor table (the canonicalizer and
    robots kernels are hash-gated corpus-wide by llm_url_dedup /
    llm_robots_filter; what THIS gate pins is the streaming
    composition and its cross-batch state).

    100 TB shape: canonicalize and the prefix fold are row-local
    codegen on the stream; rules are a static broadcast; dedup state
    is one entry per distinct canonical URL — production would bound
    it with dropDuplicatesWithinWatermark on crawl time (same plan,
    bounded state)."""
    import os
    import tempfile
    import uuid
    from pathlib import Path

    src = Path(tempfile.mkdtemp(prefix="q_swf_"))
    b1 = [
        (1, "https://www.alpha.example.com/p/0"),
        (2, "HTTPS://WWW.ALPHA.EXAMPLE.COM/p/1"),
        (3, "https://www.alpha.example.com:443/p/2"),
        (4, "https://www.alpha.example.com/p/3?utm_source=x"),
        (5, "https://www.alpha.example.com/p/4#frag"),
        (6, "https://www.alpha.example.com/p/5?ref=tw&id=2"),
        (7, "https://www.alpha.example.com/p/6"),
        (8, "https://www.alpha.example.com/p/7"),
    ]
    b2 = [
        (11, "https://www.alpha.example.com:443/p/4"),
        (12, "https://www.alpha.example.com/p/5?id=2&utm_medium=rss"),
        (13, "https://www.alpha.example.com/p/6#again"),
        (14, "HTTPS://WWW.ALPHA.EXAMPLE.COM/p/7"),
        (15, "https://www.beta.example.com/p/0"),
        (16, "https://www.beta.example.com/p/1"),
        (17, "https://www.beta.example.com:443/p/2"),
        (18, "https://www.beta.example.com/p/3?ref=x"),
    ]
    f1, f2 = src / "a_b1.jsonl", src / "b_b2.jsonl"
    for f, batch in ((f1, b1), (f2, b2)):
        f.write_text(
            "\n".join(f'{{"url_id": {i}, "url": "{u}"}}' for i, u in batch) + "\n"
        )
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    os.utime(f2, (1_700_000_100, 1_700_000_100))
    rules = spark.createDataFrame(
        [("www.alpha.example.com", ["/p/3"]), ("www.beta.example.com", ["/p/1"])],
        "host string, prefixes array<string>",
    )
    stream = (
        spark.readStream.schema("url_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("url_id", W.canonicalize_url(F.col("url")).alias("canonical_url"))
        .select(
            "url_id",
            "canonical_url",
            W.url_host(F.col("canonical_url")).alias("host"),
            F.regexp_extract(
                F.col("canonical_url"), r"^[a-z]+://[^/?#]+([^?#]*)", 1
            ).alias("path"),
        )
        .join(F.broadcast(rules), "host")
        .where(
            F.size(
                F.filter(F.col("prefixes"), lambda p: F.startswith(F.col("path"), p))
            )
            == 0
        )
        .dropDuplicates(["canonical_url"])
    )
    name = "q_swf_" + uuid.uuid4().hex[:8]
    q = (
        stream.select("url_id", "canonical_url", "host")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(f"SELECT url_id, canonical_url, host FROM {name}")


@register(
    "q106_stream_frontier_watermarked",
    tags=("llm", "web", "streaming", "dedup", "watermark"),
    oracle="""
SELECT * FROM (VALUES
  (CAST(1  AS BIGINT), 'https://www.alpha.example.com/p/0', 'www.alpha.example.com'),
  (CAST(2  AS BIGINT), 'https://www.alpha.example.com/p/1', 'www.alpha.example.com'),
  (CAST(3  AS BIGINT), 'https://www.alpha.example.com/p/2', 'www.alpha.example.com'),
  (CAST(12 AS BIGINT), 'https://www.alpha.example.com/p/4', 'www.alpha.example.com'),
  (CAST(21 AS BIGINT), 'https://www.alpha.example.com/p/5', 'www.alpha.example.com'),
  (CAST(22 AS BIGINT), 'https://www.alpha.example.com/p/6', 'www.alpha.example.com'),
  (CAST(31 AS BIGINT), 'https://www.alpha.example.com/p/1', 'www.alpha.example.com')
) t(url_id, canonical_url, host)
""",
)
def q106_stream_frontier_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED-STATE frontier q106's docstring promises — the
    production posture made real (r9 VERDICT task #6): same
    canonicalize → robots-filter → cross-batch dedup composition, but
    with a crawl-time watermark and dropDuplicatesWithinWatermark, so
    dedup state is EVICTED once the watermark passes an entry's crawl
    time + 1 h horizon instead of growing one entry per URL forever.
    Five one-file microbatches prove both halves of the semantics:
    batch 2 re-crawls /p/0 30 min after batch 1 (state live → dropped)
    and adds /p/4; batch 3 adds /p/5 at 13:00, advancing the watermark
    to 12:00 for batch 4; during batch 4 the /p/5 re-crawl at 13:20
    still dedups (that entry expires at 14:00) and at batch-4 commit
    the operator evicts every entry expiring before 12:00 (all of
    batch 1/2's, e.g. /p/1 at 11:05) — eviction runs at END of batch,
    AFTER the batch's own dedup lookup, so the probe re-crawl must
    arrive one batch later; batch 5 re-crawls /p/1 and is RE-ADMITTED
    (url_id 31 — only possible if eviction happened). The robots rule
    blocks /p/3 before it enters state. The oracle is the
    hand-computed admission table: /p/1 appears TWICE under different
    url_ids — a bounded frontier re-admits a re-crawl after the
    horizon, which is exactly the recrawl-policy semantics a real
    crawler wants.

    100 TB shape: identical row-local plan to q106, but state is
    bounded by crawl-rate × horizon instead of corpus-distinct-URL
    count; expired keys leave the store on watermark advance. The
    restart pin (state survives a checkpoint restart, eviction still
    happens on the resumed run) is tests/test_streaming_analytics.py::
    test_frontier_watermarked_restart_evicts_state."""
    import os
    import shutil
    import tempfile
    import uuid
    from pathlib import Path

    src = Path(tempfile.mkdtemp(prefix="q_swfw_"))
    batches = [
        [
            (1, "https://www.alpha.example.com/p/0", "2024-01-01 10:00:00"),
            (2, "HTTPS://WWW.ALPHA.EXAMPLE.COM/p/1", "2024-01-01 10:05:00"),
            (3, "https://www.alpha.example.com:443/p/2", "2024-01-01 10:10:00"),
            (4, "https://www.alpha.example.com/p/3?x=1", "2024-01-01 10:15:00"),
        ],
        [
            (11, "https://www.alpha.example.com/p/0#re", "2024-01-01 10:30:00"),
            (12, "https://www.alpha.example.com/p/4?utm_source=x", "2024-01-01 10:35:00"),
        ],
        [
            (21, "https://www.alpha.example.com/p/5", "2024-01-01 13:00:00"),
        ],
        [
            (32, "https://www.alpha.example.com/p/5#again", "2024-01-01 13:20:00"),
            (22, "https://www.alpha.example.com/p/6", "2024-01-01 13:25:00"),
        ],
        [
            (31, "https://www.alpha.example.com:443/p/1", "2024-01-01 13:30:00"),
        ],
    ]
    for i, batch in enumerate(batches):
        f = src / f"b{i}.jsonl"
        f.write_text(
            "\n".join(
                f'{{"url_id": {u}, "url": "{url}", "crawl_ts": "{ts}"}}'
                for u, url, ts in batch
            )
            + "\n"
        )
        os.utime(f, (1_700_000_000 + i * 100,) * 2)
    rules = spark.createDataFrame(
        [("www.alpha.example.com", ["/p/3"])],
        "host string, prefixes array<string>",
    )
    stream = (
        spark.readStream.schema("url_id long, url string, crawl_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("crawl_ts", "1 hour")
        .select(
            "url_id",
            "crawl_ts",
            W.canonicalize_url(F.col("url")).alias("canonical_url"),
        )
        .select(
            "url_id",
            "crawl_ts",
            "canonical_url",
            W.url_host(F.col("canonical_url")).alias("host"),
            F.regexp_extract(
                F.col("canonical_url"), r"^[a-z]+://[^/?#]+([^?#]*)", 1
            ).alias("path"),
        )
        .join(F.broadcast(rules), "host")
        .where(
            F.size(
                F.filter(F.col("prefixes"), lambda p: F.startswith(F.col("path"), p))
            )
            == 0
        )
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )
    name = "q_swfw_" + uuid.uuid4().hex[:8]
    q = (
        stream.select("url_id", "canonical_url", "host")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(f"SELECT url_id, canonical_url, host FROM {name}")


@register(
    "q108_stream_token_pack",
    tags=("llm", "streaming", "packing", "stateful", "curation"),
    oracle="""
WITH src(shard, doc_id, n_tokens) AS (VALUES
  ('a', 1, 300), ('a', 2, 250), ('a', 3, 400), ('a', 4, 100),
  ('a', 5, 700), ('a', 6, 12),
  ('b', 101, 512), ('b', 102, 1), ('b', 103, 511), ('b', 104, 513)),
off AS (
  SELECT shard, doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM src)
SELECT shard,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // 512 AS BIGINT) AS pack_id,
       (start_offset + n_tokens - 1) // 512 > start_offset // 512 AS crosses
FROM off
""",
)
def q108_stream_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sample packing — the continuous-ingest face of
    llm_pack_token_ids: documents arrive over microbatches and each
    must land at a deterministic global token offset in its shard's
    packed stream; the running offset is applyInPandasWithState state
    (ONE BIGINT per shard — streaming/packing.py). Three one-file
    microbatches interleave two shards; the batch oracle recomputes
    the identical layout as a per-shard prefix-sum window, proving
    streaming-state == batch-prefix-sum on the same rows (the fixture
    feeds monotone doc_ids per shard so both orderings coincide —
    the operator's ordering contract). Boundary semantics (pack_id,
    crosses) are the llm_pack_token_ids definitions at the same 512
    budget. The restart pin (offsets continue across a checkpoint
    restart) is tests/test_streaming_analytics.py::
    test_token_pack_restart_continues_offsets.

    100 TB shape: state is shard-count-bounded, never stream-length-
    bounded; per-batch work is a keyed local fold (no shuffle beyond
    the groupBy key exchange every stateful operator pays)."""
    import os
    import shutil
    import tempfile
    import uuid
    from pathlib import Path

    from ...streaming.packing import pack_stream

    src = Path(tempfile.mkdtemp(prefix="q_stp_"))
    batches = [
        [("a", 1, 300), ("a", 2, 250), ("b", 101, 512)],
        [("a", 3, 400), ("a", 4, 100), ("b", 102, 1), ("b", 103, 511)],
        [("a", 5, 700), ("a", 6, 12), ("b", 104, 513)],
    ]
    for i, batch in enumerate(batches):
        f = src / f"b{i}.jsonl"
        f.write_text(
            "\n".join(
                f'{{"shard": "{s}", "doc_id": {d}, "n_tokens": {n}}}'
                for s, d, n in batch
            )
            + "\n"
        )
        os.utime(f, (1_700_000_000 + i * 100,) * 2)
    stream = pack_stream(
        spark.readStream.schema("shard string, doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    name = "q_stp_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT shard, doc_id, n_tokens, start_offset, pack_id, crosses FROM {name}"
    )


@register(
    "q109_stream_manifest",
    tags=("llm", "streaming", "manifest", "stateful", "curation"),
    oracle="""
WITH RECURSIVE
src(shard, doc_id, content) AS (VALUES
  ('a', 1, 'alpha doc one'), ('a', 2, 'alpha doc two'),
  ('a', 3, 'alpha doc three'), ('a', 4, 'alpha doc four'),
  ('b', 101, 'beta doc one'), ('b', 102, 'beta doc two'),
  ('b', 103, 'beta doc three')),
ord AS (
  SELECT shard, doc_id, md5(content) AS h,
         CAST(len(list_filter(string_split(content, ' '), x -> x <> ''))
              AS BIGINT) AS n_toks,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM src),
chain(shard, rn, dg, nd, nt) AS (
  SELECT shard, 0, md5(''), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM (SELECT DISTINCT shard FROM src)
  UNION ALL
  SELECT c.shard, o.rn, md5(c.dg || o.h), c.nd + 1, c.nt + o.n_toks
  FROM chain c JOIN ord o ON o.shard = c.shard AND o.rn = c.rn + 1)
SELECT c.shard,
       c.nd AS n_docs,
       c.nt AS n_tokens,
       c.dg AS manifest_digest
FROM chain c
JOIN (SELECT shard, max(rn) AS mx FROM chain GROUP BY shard) m
  ON m.shard = c.shard AND m.mx = c.rn
""",
)
def q109_stream_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING shard manifest — the incremental data-card a
    continuous shard writer maintains: per shard, running doc and
    token counts plus a CHAINED content digest
    (dgₙ = md5(dgₙ₋₁ ‖ md5(contentₙ)), dg₀ = md5('')), all carried in
    applyInPandasWithState state (one 32-hex digest + two BIGINTs per
    shard — constant, like the batch llm_shard_manifest's fold). The
    chain pins content AND ingest order, which is what an append-only
    writer certifies; the batch llm_shard_manifest certifies the
    order-normalized (sorted) digest — complementary contracts. Three
    one-file microbatches over two shards; the oracle refolds the
    identical chain via a recursive CTE over the same rows, proving
    streaming state == sequential fold. Rows are folded in doc_id
    order within each batch (sorted in the operator) and the fixture
    feeds monotone doc_ids per shard, so both orderings coincide.

    100 TB shape: state is shard-count-bounded; per-batch work is a
    keyed local fold. The emitted stream is one manifest row per
    (shard, batch) — the downstream final-selection is a keyed max
    over shard-count-sized data."""
    import os
    import shutil
    import tempfile
    import uuid
    from pathlib import Path

    from ...streaming.packing import manifest_stream

    src = Path(tempfile.mkdtemp(prefix="q_smf_"))
    batches = [
        [("a", 1, "alpha doc one"), ("a", 2, "alpha doc two"), ("b", 101, "beta doc one")],
        [("a", 3, "alpha doc three"), ("b", 102, "beta doc two")],
        [("a", 4, "alpha doc four"), ("b", 103, "beta doc three")],
    ]
    for i, batch in enumerate(batches):
        f = src / f"b{i}.jsonl"
        f.write_text(
            "\n".join(
                f'{{"shard": "{s}", "doc_id": {d}, "content": "{c}"}}'
                for s, d, c in batch
            )
            + "\n"
        )
        os.utime(f, (1_700_000_000 + i * 100,) * 2)
    stream = manifest_stream(
        spark.readStream.schema("shard string, doc_id long, content string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    name = "q_smf_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    # final manifest = the per-shard row with the highest doc count
    # (counts are strictly monotone across updates)
    return spark.sql(
        f"""
        SELECT shard, n_docs, n_tokens, manifest_digest
        FROM (
          SELECT *, row_number() OVER (PARTITION BY shard ORDER BY n_docs DESC) AS rn
          FROM {name}
        ) WHERE rn = 1
        """
    )


@register(
    "llm_stream_quality_monitor",
    tags=("llm", "text", "streaming", "eval", "quality"),
    oracle="""
WITH feed AS (
  SELECT 1 AS batch, 'the quick brown fox jumps over the lazy dog today' AS text
  UNION ALL SELECT 1, 'monitoring the stream of documents is a steady and quiet job'
  UNION ALL SELECT 1, 'a clean and fairly normal looking sentence for the monitor'
  UNION ALL SELECT 1, 'zz'
  UNION ALL SELECT 2, 'the pipeline keeps watching quality of every incoming batch'
  UNION ALL SELECT 2, 'junk junk junk junk junk junk junk junk junk junk'
  UNION ALL SELECT 2, 'bb bb'
  UNION ALL SELECT 2, 'words of a reasonable and varied document appear in it to score well'),
t AS (SELECT batch, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM feed),
q AS (
  SELECT batch,
         floor((0.4 * (len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','for','on')))
                      / len(toks)::DOUBLE)
               + 0.4 * (len(list_distinct(toks)) / len(toks)::DOUBLE)
               + 0.2 * least(len(toks)::DOUBLE, 100.0) / 100.0) * 10000 + 0.5) / 10000.0 AS quality
  FROM t)
SELECT CAST(batch AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_docs,
       sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT)) / 10000.0 AS quality_mass,
       CAST(count(CASE WHEN quality < 0.45 THEN 1 END) AS BIGINT) AS n_below_gate
FROM q GROUP BY batch
""",
)
def llm_stream_quality_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING quality drift monitor — the eval face running DURING
    ingestion rather than after it: per microbatch, document count,
    per-row-quantized quality mass, and how many documents fall below
    the admission gate (quality < 0.45) — the dashboard row that pages
    someone when a source starts shipping junk. Two deterministic
    microbatches (one file each, availableNow): batch 2 carries a
    repetition-junk doc and a two-token stub, so its below-gate count
    must rise. The quality formula is the pinned repo formula
    (llm_text_quality), computed row-locally on the stream; the
    complete-mode aggregate keys on the batch marker carried in the
    feed (per-batch provenance, the way a real feed stamps its
    shard/fetch id).

    100 TB shape: row-local scoring + a |batches|-row complete-mode
    aggregate; no joins, no per-doc state — monitor state is O(batch
    markers), and a production variant windows on ingest time with a
    watermark instead of the unbounded marker key."""
    import json as _json
    import os
    import shutil
    import tempfile
    import uuid
    from pathlib import Path

    b1 = [
        "the quick brown fox jumps over the lazy dog today",
        "monitoring the stream of documents is a steady and quiet job",
        "a clean and fairly normal looking sentence for the monitor",
        "zz",
    ]
    b2 = [
        "the pipeline keeps watching quality of every incoming batch",
        "junk junk junk junk junk junk junk junk junk junk",
        "bb bb",
        "words of a reasonable and varied document appear in it to score well",
    ]
    src = Path(tempfile.mkdtemp(prefix="q_sqm_"))
    for fname, batch, docs in (("a_b1.jsonl", 1, b1), ("b_b2.jsonl", 2, b2)):
        f = src / fname
        f.write_text(
            "\n".join(_json.dumps({"batch": batch, "text": t}) for t in docs) + "\n"
        )
        os.utime(f, (1_700_000_000 + (batch - 1) * 100,) * 2)
    stream = (
        spark.readStream.schema("batch long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("batch", *[c for c in TX.quality_columns()])
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("bigint"))
                / F.lit(10000.0)
            ).alias("quality_mass"),
            F.count(F.when(F.col("quality") < 0.45, 1)).alias("n_below_gate"),
        )
    )
    name = "q_sqm_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT batch, n_docs, quality_mass, n_below_gate FROM {name}"
    )
