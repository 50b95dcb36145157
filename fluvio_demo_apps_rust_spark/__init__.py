"""PySpark-native analytics engine with the capabilities of
``infinyon/fluvio-demo-apps-rust`` (a MySQL CDC → Fluvio replication
pipeline), rebuilt Spark-first.

Layout
------
- ``schemas``    — change-event envelope StructType, the Value scalar type
                   system, canonical rendering formats (reference:
                   cdc-mysql/src/messages/*.rs).
- ``codec``      — JSON event parse/normalize (externally-tagged unions →
                   typed columns) and the inverse render.
- ``config``     — producer/consumer profile loading (TOML), db filters.
- ``registry``   — DDL-driven schema registry (reference: LocalStore,
                   cdc-mysql/src/producer/binlog_manager/local_store.rs).
- ``ddl``        — DDL text → TableOp parser (reference: query_parser.rs).
- ``operators``  — batch apply kernel (INSERT/UPDATE/DELETE/DDL replay with
                   full-row null-safe matching), filters, sequencing.
- ``sources``    — change-event file sources (batch + streaming).
- ``streaming``  — Structured Streaming pipeline (readStream → codec →
                   filter → foreachBatch apply, checkpointed).
- ``plans``      — the declared relational query surface (SURVEY §7.3)
                   over the TPC-H-ish testdata tables.
- ``functions``  — LLM-data-pipeline operators: dedup (exact/MinHash-LSH/
                   SimHash/n-gram-Jaccard/embedding-cosine), similarity
                   search, text analysis, multimodal column plumbing.

Everything here is built on the public PySpark DataFrame / SQL /
Structured Streaming API; no RDD code, no custom Catalyst rules.
"""

__version__ = "0.1.0"
