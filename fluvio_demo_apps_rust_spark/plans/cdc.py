"""CDC queries for the correctness gate.

``cdc_pet_replay`` replays the reference's canonical nine-event
pet-store scenario (cdc-mysql/README.md:223-231) through the full
codec → registry → apply path; the oracle is the golden final table
(cdc-mysql/README.md:191-198) as a VALUES literal.

``cdc_orders_roundtrip`` exercises the same path at data scale: every
``orders`` row is rendered into a wire-format Add event (JVM-side
``to_json``), the batch is decoded and applied (one coalesced union),
and the materialized table must equal the source table — the oracle is
simply ``SELECT`` from orders. This is the CDC analog of the
reference's e2e leader-equals-follower check.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..codec import b64_nochunk
from ..fixtures import PET_EVENTS
from ..operators.apply import apply_changes
from .base import fround, load, qsum, register


@register(
    "cdc_pet_replay",
    headline=True,
    tags=("cdc", "apply", "e2e"),
    oracle="""
SELECT * FROM (VALUES
  ('Jack', 'Peter', 'dog', 'm', '1989-08-31', CAST(NULL AS VARCHAR)),
  ('Spot', 'Jane',  'dog', 'm', '2010-11-02', '2020-06-10')
) t(name, owner, species, sex, birth, last_vaccine)
""",
)
def cdc_pet_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nine-event pet scenario: all four op kinds, ALTER ADD COLUMN
    mid-stream, NULLs, full-row update/delete semantics. A nine-event
    batch takes the driver-local fold (gated fast path symmetric to the
    union-find gate; property-tested equal to the distributed kernel) —
    zero Spark jobs for the fold itself."""
    from ..operators.apply import apply_events_local

    state = apply_events_local(spark, PET_EVENTS)
    pet = state.table("flvdb", "pet")
    return pet.select(
        "name",
        "owner",
        "species",
        "sex",
        F.date_format("birth", "yyyy-MM-dd").alias("birth"),
        F.date_format("last_vaccine", "yyyy-MM-dd").alias("last_vaccine"),
    )


@register(
    "cdc_binlog_replay",
    tags=("cdc", "binlog", "binary", "e2e"),
    oracle="""
SELECT * FROM (VALUES
  ('Jack', 'Peter', 'dog', 'm', '1989-08-31', CAST(NULL AS VARCHAR)),
  ('Spot', 'Jane',  'dog', 'm', '2010-11-02', '2020-06-10')
) t(name, owner, species, sex, birth, last_vaccine)
""",
)
def cdc_binlog_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY binlog ingestion e2e: the pet scenario as real binlog-v4
    BYTES (19-byte headers, CRC32 trailers, TABLE_MAP + ROWS_v2 row
    images — fixtures_binlog.pet_binlog_bytes) parsed by
    sources/binlog_binary.py into wire JSON, then codec → registry →
    apply; final table must equal the reference golden. This is the
    reference's actual input format (binlog_parser.rs:16-36 via the
    mysql_binlog crate), which rounds 1-3 started downstream of."""
    from ..codec import parse_events
    from ..fixtures_binlog import PET_BINLOG_COLUMNS, pet_binlog_bytes
    from ..operators.apply import apply_events_local
    from ..sources.binlog_binary import parse_binlog_bytes

    events = parse_binlog_bytes(
        pet_binlog_bytes(), columns_by_table=PET_BINLOG_COLUMNS
    )
    state = apply_events_local(spark, events)
    pet = state.table("flvdb", "pet")
    return pet.select(
        "name",
        "owner",
        "species",
        "sex",
        F.date_format("birth", "yyyy-MM-dd").alias("birth"),
        F.date_format("last_vaccine", "yyyy-MM-dd").alias("last_vaccine"),
    )


@register(
    "cdc_binlog_real_pet",
    tags=("cdc", "binlog", "binary", "e2e"),
    oracle="""
SELECT * FROM (VALUES
  ('pet',  'Jack', 'Peter', 'dog',               'm', '1989-08-31', CAST(1 AS BIGINT)),
  ('user', 'John', 'Doe',   CAST(NULL AS VARCHAR), 'm', '2000-03-30', CAST(6 AS BIGINT))
) t(tbl, name, col2, species, sex, birth, n)
""",
)
def cdc_binlog_real_pet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REFERENCE'S OWN recorded binlog (cdc-mysql/test_files/
    binlog.000003 — read-only binary data, the actual bytes its demo
    session produced) parsed by sources/binlog_binary.py and replayed
    through codec → registry → apply. Exercises real-server quirks a
    synthetic writer can't: LOG_EVENT_BINLOG_IN_USE_F still set on the
    FDE (flag-cleared CRC), ANONYMOUS_GTID interleaving, BEGIN/XID
    transaction framing, and a mid-stream ALTER (reference behavior:
    binlog_parser.rs:16-36). Expected final state: pet = Jack with the
    updated birth date (Puffball deleted), user = six duplicate John
    Doe rows (K2 keeps duplicates — full-row semantics)."""
    from ..fixtures_binlog import real_pet_binlog_bytes
    from ..operators.apply import apply_events_local
    from ..sources.binlog_binary import parse_binlog_bytes

    events = parse_binlog_bytes(real_pet_binlog_bytes(), file_name="binlog.000003")
    state = apply_events_local(spark, events)
    pet = state.table("flvTest", "pet")
    user = state.table("flvTest", "user")
    pet_r = pet.select(
        F.lit("pet").alias("tbl"),
        F.col("name"),
        F.col("owner").alias("col2"),
        "species",
        "sex",
        F.date_format("birth", "yyyy-MM-dd").alias("birth"),
    )
    user_r = user.select(
        F.lit("user").alias("tbl"),
        F.col("first_name").alias("name"),
        F.col("last_name").alias("col2"),
        F.lit(None).cast("string").alias("species"),
        "sex",
        F.date_format("birth", "yyyy-MM-dd").alias("birth"),
    )
    return (
        pet_r.unionByName(user_r)
        .groupBy("tbl", "name", "col2", "species", "sex", "birth")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "cdc_binlog_typed_replay",
    tags=("cdc", "binlog", "binary", "types"),
    oracle="""
SELECT * FROM (VALUES (
  7, 'widget', '2', 1999,
  '2024-03-30 21:31:30.12', '21:31:30.500000', '2018-04-28 03:15:22.25',
  '0.0000', '{"a":2,"b":[true,null,"x"],"c":-1.5}', '5', '10:30:30.250000',
  'AAAAAAEBAAAAAAAAAAAA+D8AAAAAAAACwA=='
)) t(id, label, grade, born_year, appt_dt, appt_time, updated_at, balance, tags,
     perks, delta, loc)
""",
)
def cdc_binlog_typed_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full §1.4 value-type surface through the BINARY path: ENUM, YEAR,
    DATETIME2(fsp), TIME2(fsp), TIMESTAMP2(fsp), NEWDECIMAL, JSON,
    SET (bitmask → '5' = {'x','z'}), a NEGATIVE TIME2(2) (combined
    offset-binary negate; sign dropped = reference Value::Time parity)
    and GEOMETRY (0xff: length-prefixed SRID+WKB carried opaque as
    Blob, reference parity values.rs:16; lands as BinaryType via the
    DDL GEOMETRY mapping, emitted base64) column decode (reference
    Value set: src/messages/values.rs:9-45), then codec
    canonicalization, DDL-registry typing and K2/K3 apply — the
    INSERT's balance is overwritten by the UPDATE. Timestamps are
    emitted as strings (session tz pinned UTC), DECIMAL via its exact
    Spark decimal(12,4) rendering."""
    from ..fixtures_binlog import TYPED_BINLOG_COLUMNS, typed_binlog_bytes
    from ..operators.apply import apply_events_local
    from ..sources.binlog_binary import parse_binlog_bytes

    events = parse_binlog_bytes(
        typed_binlog_bytes(), columns_by_table=TYPED_BINLOG_COLUMNS
    )
    state = apply_events_local(spark, events)
    t = state.table("typedb", "alltypes")
    return t.select(
        "id",
        "label",
        "grade",
        "born_year",
        F.col("appt_dt").cast("string").alias("appt_dt"),
        "appt_time",
        F.col("updated_at").cast("string").alias("updated_at"),
        F.col("balance").cast("string").alias("balance"),
        "tags",
        "perks",
        "delta",
        b64_nochunk(F.col("loc")).alias("loc"),
    )


@register(
    "cdc_binlog_geometry",
    tags=("cdc", "binlog", "binary", "geometry"),
    oracle="""
SELECT * FROM (VALUES
  (1, 'origin', 'AAAAAAEBAAAAAAAAAAAA+D8AAAAAAAACwA==', 25),
  (2, 'trail',
   '5hAAAAECAAAAAwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAADwPwAAAAAAAPA/AAAAAAAAAEAAAAAAAADgPw==',
   61),
  (3, 'nowhere', NULL, NULL)
) t(id, name, loc, loc_bytes)
""",
)
def cdc_binlog_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY through the full binary CDC path (§1.4's last cell,
    r7): a POINT (SRID 0), a LINESTRING (SRID 4326), and a NULL
    geometry decoded from binlog-v4 bytes as opaque SRID+WKB Blobs
    (reference parity: mysql_binlog → Value::Blob, values.rs:16), then
    codec base64 canonicalization, DDL GEOMETRY→BinaryType landing,
    and a full-row UPDATE that matches on the 25-byte blob value
    (null-safe row matching over a binary column). Emits base64 text
    and octet length — never raw binary — so the hash gate is
    deterministic."""
    from ..fixtures_binlog import GEO_BINLOG_COLUMNS, geo_binlog_bytes
    from ..operators.apply import apply_events_local
    from ..sources.binlog_binary import parse_binlog_bytes

    events = parse_binlog_bytes(
        geo_binlog_bytes(), columns_by_table=GEO_BINLOG_COLUMNS
    )
    state = apply_events_local(spark, events)
    t = state.table("geodb", "places")
    return t.select(
        "id",
        "name",
        b64_nochunk(F.col("loc")).alias("loc"),
        F.octet_length("loc").cast("int").alias("loc_bytes"),
    )


@register(
    "cdc_mixed_workload",
    tags=("cdc", "apply", "scale"),
    oracle="""
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE o_orderstatus <> 'F'
""",
)
def cdc_mixed_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk adds followed by BULK per-event deletes (every 'F' order
    deleted by full-row match): delete events coalesce into ONE
    anti-join run — the kernel's bulk-mutation scale path. Result must
    equal the surviving orders."""
    o = load(spark, sf_dir, "orders")
    # Delete sequences need only to sort AFTER every add sequence; a
    # constant offset above any o_orderkey avoids a whole count() scan.
    n = 1 << 40
    ddl = spark.createDataFrame(
        [
            (
                '{"uri":"flv://mysql-srv1/cdcdb","sequence":0,'
                '"bn_file":{"fileName":"binlog.000001","offset":4},'
                '"operation":{"Query":"CREATE TABLE orders_m (o_orderkey BIGINT, '
                'o_orderstatus VARCHAR(1))"}}',
            )
        ],
        "value string",
    )

    def ev(seq: F.Column, op: str, cols_key: str) -> F.Column:
        return F.concat(
            F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_m","sequence":'),
            seq.cast("string"),
            F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
            seq.cast("string"),
            F.lit('},"columns":["o_orderkey","o_orderstatus"],'
                  f'"operation":{{"{op}":{{"rows":[{{"{cols_key}":['),
            F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger"))),
            F.lit(","),
            F.to_json(F.struct(F.col("o_orderstatus").alias("String"))),
            F.lit("]}]}}}"),
        )

    par = spark.sparkContext.defaultParallelism
    # ONE scan + ONE repartition renders both event kinds: each order
    # row emits its Add event plus, for 'F' orders, the Delete event —
    # array_compact drops the non-delete slot before the explode.
    rendered = (
        o.repartition(par)
        .select(
            F.explode(
                F.array_compact(
                    F.array(
                        ev(F.col("o_orderkey") + 1, "Add", "cols"),
                        F.when(
                            F.col("o_orderstatus") == "F",
                            ev(F.col("o_orderkey") + 1 + F.lit(n), "Delete", "cols"),
                        ),
                    )
                )
            ).alias("value")
        )
    )
    from ..codec import parse_events

    events = parse_events(ddl.unionByName(rendered))
    state = apply_changes(spark, events)
    t = state.table("cdcdb", "orders_m")
    return t.select("o_orderkey", "o_orderstatus")


@register(
    "cdc_update_storm",
    tags=("cdc", "apply", "update", "scale"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 'X' ELSE o_orderstatus END AS o_orderstatus
FROM orders
""",
)
def cdc_update_storm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-dominATED stream at data scale (drives the r6 update-run
    coalescing through the driver gate): bulk adds, then one UPDATE
    event PER 'F' order flipping its status to 'X'. The update events
    have pairwise-distinct full-row before-images and no chaining, so
    the kernel's conflict check passes and the whole storm applies as
    ONE batched join — one run summary, one distributed hash check,
    one `<=>` join — instead of the pre-r6 per-event sequential fold
    (O(#updates) driver round-trips). Result must equal the source
    with every 'F' flipped."""
    o = load(spark, sf_dir, "orders")
    n = 1 << 40
    ddl = spark.createDataFrame(
        [
            (
                '{"uri":"flv://mysql-srv1/cdcdb","sequence":0,'
                '"bn_file":{"fileName":"binlog.000001","offset":4},'
                '"operation":{"Query":"CREATE TABLE orders_u (o_orderkey BIGINT, '
                'o_orderstatus VARCHAR(1))"}}',
            )
        ],
        "value string",
    )
    key_cell = F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger")))

    def head(seq: F.Column) -> F.Column:
        return F.concat(
            F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_u","sequence":'),
            seq.cast("string"),
            F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
            seq.cast("string"),
            F.lit('},"columns":["o_orderkey","o_orderstatus"],"operation":'),
        )

    add_ev = F.concat(
        head(F.col("o_orderkey") + 1),
        F.lit('{"Add":{"rows":[{"cols":['),
        key_cell,
        F.lit(","),
        F.to_json(F.struct(F.col("o_orderstatus").alias("String"))),
        F.lit("]}]}}}"),
    )
    upd_ev = F.concat(
        head(F.col("o_orderkey") + 1 + F.lit(n)),
        F.lit('{"Update":{"rows":[{"before_cols":['),
        key_cell,
        F.lit(',{"String":"F"}],"after_cols":['),
        key_cell,
        F.lit(',{"String":"X"}]}]}}}'),
    )
    par = spark.sparkContext.defaultParallelism
    rendered = (
        o.repartition(par)
        .select(
            F.explode(
                F.array_compact(
                    F.array(
                        add_ev,
                        F.when(F.col("o_orderstatus") == "F", upd_ev),
                    )
                )
            ).alias("value")
        )
    )
    from ..codec import parse_events

    events = parse_events(ddl.unionByName(rendered))
    state = apply_changes(spark, events)
    t = state.table("cdcdb", "orders_u")
    return t.select("o_orderkey", "o_orderstatus")


# The stats operator folds the deterministic PET_EVENTS fixture, so the
# final update-mode state is expressible as a batch aggregate over the
# same wire JSON: count events / sum row-images / max sequence per
# (db, table) parsed straight from the inlined event strings.
_PET_VALUES = ",\n  ".join(
    "('" + s.replace("'", "''") + "')" for s in PET_EVENTS
)

_STREAM_STATS_ORACLE = f"""
WITH ev(j) AS (VALUES
  {_PET_VALUES}),
t AS (SELECT string_split(json_extract_string(j, '$.uri'), '/') AS p,
             CAST(json_extract(j, '$.sequence') AS BIGINT) AS seq,
             coalesce(json_array_length(j, '$.operation.Add.rows'),
                      json_array_length(j, '$.operation.Update.rows'),
                      json_array_length(j, '$.operation.Delete.rows'), 0) AS nr
      FROM ev),
f AS (SELECT p[4] AS db, p[5] AS "table", seq, nr FROM t WHERE len(p) >= 5)
SELECT db, "table",
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(nr) AS BIGINT) AS n_rows,
       max(seq) AS max_sequence
FROM f GROUP BY db, "table"
"""


@register(
    "cdc_stream_stats",
    tags=("cdc", "streaming", "stateful"),
    oracle=_STREAM_STATS_ORACLE,
)
def cdc_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming run: the pet scenario streamed through
    the applyInPandasWithState per-table stats operator (availableNow
    trigger, memory sink). The oracle folds the same fixture as a batch
    JSON aggregate."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..sources.event_source import stream_events
    from ..streaming.stateful import table_stats_stream

    src = Path(tempfile.mkdtemp(prefix="cdc_stream_stats_"))
    (src / "events.jsonl").write_text("\n".join(PET_EVENTS) + "\n")
    name = "cdc_stream_stats_" + uuid.uuid4().hex[:8]
    q = (
        table_stats_stream(stream_events(spark, str(src)))
        .writeStream.outputMode("update")
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
    return spark.sql(
        f"SELECT db, table, n_events, n_rows, max_sequence FROM {name}"
    )


ORDERS_DDL_EVENT = (
    '{"uri":"flv://mysql-srv1/cdcdb","sequence":0,'
    '"bn_file":{"fileName":"binlog.000001","offset":4},'
    '"operation":{"Query":"CREATE TABLE orders_r (o_orderkey BIGINT, '
    'o_orderstatus VARCHAR(1), o_totalprice DOUBLE)"}}'
)


def orders_wire_events(
    spark: SparkSession, sf_dir: str, ordered: bool = False
) -> DataFrame:
    """Wire-format Add events for every orders row (one JSON envelope
    per row, ``value string``), built JVM-side. The Value union is
    externally tagged with heterogeneous payloads, so each cell is
    rendered with its own to_json and the envelope is assembled by
    string concat — all inside whole-stage codegen. Shared by
    cdc_orders_roundtrip (batch apply) and tools/bench_stream.py
    (streaming-throughput fixture), so both paths measure the same
    event volume.

    ``ordered=True`` range-partitions on the order key so file k holds
    strictly lower sequences than file k+1 — the topic-ordering
    guarantee a real broker provides, required when a paced
    (maxFilesPerTrigger) stream consumes the directory: the per-table
    sequence watermark (F4) correctly drops out-of-order re-delivery,
    so cross-batch admission must be sequence-monotone."""
    o = load(spark, sf_dir, "orders")
    event = F.concat(
        F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_r","sequence":'),
        (F.col("o_orderkey") + 1).cast("string"),
        F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
        F.col("o_orderkey").cast("string"),
        F.lit('},"columns":["o_orderkey","o_orderstatus","o_totalprice"],'
              '"operation":{"Add":{"rows":[{"cols":['),
        F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_orderstatus").alias("String"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_totalprice").alias("Double"))),
        F.lit("]}]}}}"),
    )
    # The single-split parquet source would serialize the decode and
    # the fold into one task; spread the wire rows first (at cluster
    # scale the source already has many splits and this is a no-op
    # cost-wise relative to the decode it parallelizes).
    par = spark.sparkContext.defaultParallelism
    if ordered:
        return (
            o.repartitionByRange(par, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .select(event.alias("value"))
        )
    return o.repartition(par).select(event.alias("value"))


@register(
    "cdc_orders_roundtrip",
    tags=("cdc", "codec", "apply", "scale"),
    oracle="""
SELECT o_orderkey, o_orderstatus, floor((o_totalprice) * 100 + 0.5) / 100.0 AS o_totalprice
FROM orders
""",
)
def cdc_orders_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → wire JSON Add events → codec → apply → table == source."""
    ddl = spark.createDataFrame([(ORDERS_DDL_EVENT,)], "value string")
    adds = orders_wire_events(spark, sf_dir)
    from ..codec import parse_events

    events = parse_events(ddl.unionByName(adds))
    state = apply_changes(spark, events)
    t = state.table("cdcdb", "orders_r")
    return t.select(
        "o_orderkey", "o_orderstatus", fround("o_totalprice", 2).alias("o_totalprice")
    )


@register(
    "cdc_replica_join",
    tags=("cdc", "apply", "join", "integration"),
    oracle="""
SELECT c_mktsegment, count(*) AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM orders JOIN customer ON c_custkey = o_custkey
WHERE o_orderstatus = 'O'
GROUP BY c_mktsegment
""",
)
def cdc_replica_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The replica-as-source story end-to-end: orders is materialized
    FROM the CDC event stream (wire JSON → codec → apply), then the
    replica table joins the customer dimension like any other
    DataFrame — what a reference user gets by pointing queries at the
    follower DB, here inside one engine. The open-orders filter prunes
    before the join; the aggregate is the usual partial/final pair."""
    o = load(spark, sf_dir, "orders")
    ddl = spark.createDataFrame(
        [
            (
                '{"uri":"flv://mysql-srv1/cdcdb","sequence":0,'
                '"bn_file":{"fileName":"binlog.000001","offset":4},'
                '"operation":{"Query":"CREATE TABLE orders_j (o_orderkey BIGINT, '
                'o_custkey BIGINT, o_orderstatus VARCHAR(1), o_totalprice DOUBLE)"}}',
            )
        ],
        "value string",
    )
    event = F.concat(
        F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_j","sequence":'),
        (F.col("o_orderkey") + 1).cast("string"),
        F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
        F.col("o_orderkey").cast("string"),
        F.lit(
            '},"columns":["o_orderkey","o_custkey","o_orderstatus","o_totalprice"],'
            '"operation":{"Add":{"rows":[{"cols":['
        ),
        F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_custkey").alias("SignedInteger"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_orderstatus").alias("String"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_totalprice").alias("Double"))),
        F.lit("]}]}}}"),
    )
    par = spark.sparkContext.defaultParallelism
    adds = o.repartition(par).select(event.alias("value"))
    from ..codec import parse_events

    events = parse_events(ddl.unionByName(adds))
    state = apply_changes(spark, events)
    replica = state.table("cdcdb", "orders_j")
    c = load(spark, sf_dir, "customer")
    return (
        replica.filter(F.col("o_orderstatus") == "O")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            qsum(F.col("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "cdc_scd2",
    tags=("cdc", "codec", "scd2", "temporal"),
    oracle="""
WITH base AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'),
v AS (
  SELECT o_orderkey, 1 AS ver, 'O' AS status FROM base
  UNION ALL SELECT o_orderkey, 2, 'P' FROM base
  UNION ALL SELECT o_orderkey, 3, NULL FROM base WHERE o_orderkey % 2 = 0),
w AS (
  SELECT o_orderkey, ver, status,
         o_orderkey * 4 + ver AS valid_from_seq,
         lead(o_orderkey * 4 + ver) OVER (PARTITION BY o_orderkey ORDER BY ver)
           AS valid_to_seq
  FROM v)
SELECT o_orderkey, status AS o_orderstatus, valid_from_seq, valid_to_seq,
       (valid_to_seq IS NULL) AS is_current
FROM w WHERE ver <> 3
""",
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 temporal-dimension build from a decoded change stream: every
    open ('O') order is replayed as wire events — Add('O'), Update→'P',
    and for even keys a closing Delete — decoded through the codec, and
    folded into type-2 version rows (valid_from/valid_to sequence
    interval, is_current flag) by operators/scd2.py. One key-partition
    window over the change stream; no joins, no driver state. The
    reference's consumer keeps only current state (mysql_manager.rs:61);
    this is the history-preserving warehouse face of the same stream."""
    return _scd2_history(spark, sf_dir)


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SCD2 fixture: open orders replayed as Add/Update(/Delete
    for even keys) wire events at sequences k*4+{1,2,3}, decoded and
    folded into version intervals. Used by cdc_scd2 and the
    point-in-time probe query."""
    from ..codec import parse_events
    from ..operators.scd2 import scd2_intervals

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    par = spark.sparkContext.defaultParallelism
    k = F.col("o_orderkey")

    def cell_int(c: F.Column) -> F.Column:
        return F.concat(F.lit('{"SignedInteger":'), c.cast("string"), F.lit("}"))

    def ev(ver: int, body: F.Column) -> F.Column:
        seq = (k * 4 + ver).cast("string")
        return F.concat(
            F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_h","sequence":'),
            seq,
            F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
            seq,
            F.lit('},"columns":["o_orderkey","o_orderstatus"],"operation":'),
            body,
            F.lit("}"),
        )

    add = ev(
        1,
        F.concat(
            F.lit('{"Add":{"rows":[{"cols":['),
            cell_int(k),
            F.lit(',{"String":"O"}]}]}}'),
        ),
    )
    upd = ev(
        2,
        F.concat(
            F.lit('{"Update":{"rows":[{"before_cols":['),
            cell_int(k),
            F.lit(',{"String":"O"}],"after_cols":['),
            cell_int(k),
            F.lit(',{"String":"P"}]}]}}'),
        ),
    )
    dele = ev(
        3,
        F.concat(
            F.lit('{"Delete":{"rows":[{"cols":['),
            cell_int(k),
            F.lit(',{"String":"P"}]}]}}'),
        ),
    )
    rendered = o.repartition(par).select(
        F.explode(
            F.array_compact(
                F.array(add, upd, F.when(k % 2 == 0, dele))
            )
        ).alias("value")
    )
    events = parse_events(rendered)
    r0 = F.col("rows")[0]
    changes = events.select(
        F.coalesce(r0["after"][0], r0["before"][0]).cast("long").alias("o_orderkey"),
        "sequence",
        "op_type",
        r0["after"][1].alias("o_orderstatus"),
    )
    return scd2_intervals(
        changes, key_col="o_orderkey", seq_col="sequence",
        attr_cols=("o_orderstatus",),
    )


@register(
    "cdc_scd2_asof",
    tags=("cdc", "scd2", "asof", "temporal"),
    oracle="""
WITH base AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'),
v AS (
  SELECT o_orderkey, 1 AS ver, 'O' AS status FROM base
  UNION ALL SELECT o_orderkey, 2, 'P' FROM base
  UNION ALL SELECT o_orderkey, 3, NULL FROM base WHERE o_orderkey % 2 = 0),
w AS (
  SELECT o_orderkey, ver, status,
         o_orderkey * 4 + ver AS vfrom,
         lead(o_orderkey * 4 + ver) OVER (PARTITION BY o_orderkey ORDER BY ver)
           AS vto
  FROM v),
hist AS (SELECT * FROM w WHERE ver <> 3),
probes AS (
  SELECT o_orderkey, o_orderkey * 4 + 1 + (o_orderkey % 3) AS probe_seq
  FROM base)
SELECT p.o_orderkey, p.probe_seq, h.status AS o_orderstatus_at,
       h.status IS NOT NULL AS found
FROM probes p LEFT JOIN hist h
  ON h.o_orderkey = p.o_orderkey AND h.vfrom <= p.probe_seq
 AND (h.vto IS NULL OR h.vto > p.probe_seq)
""",
)
def cdc_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal as-of) join against the SCD2 history:
    each key is probed at sequence k*4+1+(k%3) — before the update,
    after it, or after the closing delete — and gets the version row
    valid AT that sequence (none, for deleted keys: found=false). The
    lakehouse time-travel-dimension pattern, built on the union-tag
    asof operator (operators/asof.py — one key shuffle, zero pair
    blow-up) with the version's valid_to as a post-mask, which is
    exactly how a PIT join should run at 100 TB."""
    from ..operators.asof import asof_join

    hist = _scd2_history(spark, sf_dir)
    probes = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(
            "o_orderkey",
            (F.col("o_orderkey") * 4 + 1 + F.col("o_orderkey") % 3).alias("probe_seq"),
        )
    )
    pit = asof_join(
        probes,
        hist,
        on="o_orderkey",
        left_ts="probe_seq",
        right_ts="valid_from_seq",
        right_payload=["o_orderstatus", "valid_to_seq"],
        how="left",
    )
    live = F.col("asof_ts").isNotNull() & (
        F.col("asof_valid_to_seq").isNull()
        | (F.col("asof_valid_to_seq") > F.col("probe_seq"))
    )
    return pit.select(
        "o_orderkey",
        "probe_seq",
        F.when(live, F.col("asof_o_orderstatus")).alias("o_orderstatus_at"),
        F.when(live, F.col("asof_o_orderstatus")).isNotNull().alias("found"),
    )


@register(
    "cdc_incremental_agg",
    tags=("cdc", "apply", "ivm", "scale"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       floor((sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0) * 100 + 0.5) / 100.0 AS revenue
FROM orders
WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 2 = 0)
GROUP BY o_orderstatus
""",
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance from the change stream: a
    per-status (count, revenue) materialized aggregate is advanced by
    SIGNED DELTAS decoded from Delete wire events (every even-keyed
    'F' order), never by rescanning the base fact rows — the deltas'
    status/price come from the event ROW IMAGES. Result must equal a
    full recompute over the surviving rows (the oracle). Revenue is
    exact integer cents (sum of BIGINT) so base-minus-delta and
    survivor-sum arithmetic agree bit-for-bit — summing doubles over
    two DIFFERENT row sets would not. Scale shape: the base aggregate
    stands in for the stored MV; the delta path is render → decode →
    one map-side-combined aggregate over the (tiny) change batch —
    at 100 TB you re-aggregate the deltas, not the fact table."""
    from ..codec import parse_events

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("d_cnt"), F.sum(cents).alias("d_cents")
    )
    doomed = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
    par = spark.sparkContext.defaultParallelism
    event = F.concat(
        F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_i","sequence":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
        F.col("o_orderkey").cast("string"),
        F.lit('},"columns":["o_orderkey","o_orderstatus","o_totalprice"],'
              '"operation":{"Delete":{"rows":[{"cols":['),
        F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_orderstatus").alias("String"))),
        F.lit(","),
        F.to_json(F.struct(F.col("o_totalprice").alias("Double"))),
        F.lit("]}]}}}"),
    )
    deletes = parse_events(doomed.repartition(par).select(event.alias("value")))
    img = F.col("rows")[0]["before"]
    deltas = deletes.select(
        img[1].alias("o_orderstatus"),
        F.lit(-1).cast("long").alias("d_cnt"),
        (-F.round(img[2].cast("double") * 100)).cast("long").alias("d_cents"),
    ).groupBy("o_orderstatus").agg(
        F.sum("d_cnt").alias("d_cnt"), F.sum("d_cents").alias("d_cents")
    )
    return (
        base.unionByName(deltas)
        .groupBy("o_orderstatus")
        .agg(F.sum("d_cnt").alias("n_orders"), F.sum("d_cents").alias("cents"))
        .filter(F.col("n_orders") > 0)
        .select(
            "o_orderstatus",
            "n_orders",
            fround(F.col("cents") / 100.0, 2).alias("revenue"),
        )
    )


@register(
    "cdc_binlog_rotation_replay",
    tags=("cdc", "binlog", "binary", "rotation", "e2e"),
    oracle="""
SELECT * FROM (VALUES
  ('Jack', 'Peter', 'dog', 'm', '1989-08-31', CAST(NULL AS VARCHAR)),
  ('Spot', 'Jane',  'dog', 'm', '2010-11-02', '2020-06-10')
) t(name, owner, species, sex, birth, last_vaccine)
""",
)
def cdc_binlog_rotation_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-ROTATION replay e2e (operator S3 through the DISTRIBUTED
    parser): the pet scenario split across two rotated binlog files —
    binlog.000001 ends with a real ROTATE event, binlog.000002 starts
    with its own FDE and re-emits the TABLE_MAP (as mysqld does) —
    read back via sources/binlog_binary.read_binlog_files (binaryFile
    scan, one Arrow parse task per file: the source's natural
    parallelism), globally ordered by (fileName, offset), then codec →
    registry → apply. Final table must equal the single-file
    cdc_binlog_replay golden: rotation is invisible to replay
    semantics. The DDL in file 1 must govern row events in file 2, so
    this also pins cross-file registry ordering.

    Reference: binlog index rotation scan,
    cdc-mysql/src/producer/binlog_manager/binlog_index.rs (S3/S4)."""
    import json as _json
    import shutil
    import tempfile
    from pathlib import Path

    from ..fixtures_binlog import PET_BINLOG_COLUMNS, pet_rotated_binlog_files
    from ..operators.apply import apply_events_local
    from ..sources.binlog_binary import read_binlog_files

    d = Path(tempfile.mkdtemp(prefix="cdc_rotation_"))
    try:
        for name, buf in pet_rotated_binlog_files():
            (d / name).write_bytes(buf)
        parsed = read_binlog_files(spark, str(d), columns_by_table=PET_BINLOG_COLUMNS)
        # T4 re-sequencing across the rotation: per-file parses restart
        # at sequence 0 (the reference's per-file resume state), so the
        # producer assigns the GLOBAL dense sequence over (file id,
        # offset) — operators/sequence.assign_sequence semantics,
        # applied here on the driver over the 9-event bounded collect.
        objs = sorted(
            (_json.loads(r.value) for r in parsed.collect()),
            key=lambda o: (o["bn_file"]["fileName"], o["bn_file"]["offset"]),
        )
    finally:
        # the collect above fully materializes the parse, so the
        # scratch dir can go immediately (r8 ADVICE: it leaked)
        shutil.rmtree(d, ignore_errors=True)
    lines = []
    for seq, o in enumerate(objs):
        o["sequence"] = seq
        lines.append(_json.dumps(o))
    state = apply_events_local(spark, lines)
    pet = state.table("flvdb", "pet")
    return pet.select(
        "name",
        "owner",
        "species",
        "sex",
        F.date_format("birth", "yyyy-MM-dd").alias("birth"),
        F.date_format("last_vaccine", "yyyy-MM-dd").alias("last_vaccine"),
    )


@register(
    "cdc_sequence_audit",
    tags=("cdc", "audit", "sequence"),
    oracle="""
WITH kept AS (
  SELECT o_orderkey + 1 AS seq,
         CASE WHEN o_orderkey % 101 = 7 THEN 2 ELSE 1 END AS copies
  FROM orders WHERE o_orderkey % 97 <> 3)
SELECT 'binlog.000001' AS file_name,
       CAST(sum(copies) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_seq,
       CAST(sum(copies) - count(*) AS BIGINT) AS n_dups,
       CAST(max(seq) - min(seq) + 1 - count(*) AS BIGINT) AS gap_count,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM kept
""",
)
def cdc_sequence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-CONTINUITY MONITOR — the replication-health audit a
    CDC consumer runs continuously over the wire stream: per binlog
    file, how many events arrived, how many DISTINCT sequence numbers
    (reference T4, cdc-mysql/src/.../sequence assignment), how many
    same-sequence replays (the duplicates reference F4's same-offset
    dedup exists to drop), and how many sequence numbers are MISSING
    inside the observed range (lost events — the alarm that forces a
    re-snapshot). The fixture renders one Add per order with
    seq = o_orderkey + 1, deterministically DROPS every key % 97 == 3
    (gaps) and REPLAYS every key % 101 == 7 (duplicates); events go
    through the real wire render + codec.parse_events decode, so the
    audit exercises the production parse path end to end, while the
    oracle computes the same ledger arithmetically from orders.

    100 TB shape: render is one scan + explode; the audit is ONE
    map-side-combinable aggregate keyed by file_name with an exact
    count(DISTINCT sequence) (two-phase partial dedup — never a
    driver-side set), constant output per file."""
    o = load(spark, sf_dir, "orders")

    def ev(seq: F.Column) -> F.Column:
        return F.concat(
            F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_q","sequence":'),
            seq.cast("string"),
            F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
            seq.cast("string"),
            F.lit('},"columns":["o_orderkey"],'
                  '"operation":{"Add":{"rows":[{"cols":['),
            F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger"))),
            F.lit("]}]}}}"),
        )

    par = spark.sparkContext.defaultParallelism
    rendered = (
        o.where(F.col("o_orderkey") % 97 != 3)
        .repartition(par)
        .select(
            F.explode(
                F.array_compact(
                    F.array(
                        ev(F.col("o_orderkey") + 1),
                        F.when(
                            F.col("o_orderkey") % 101 == 7,
                            ev(F.col("o_orderkey") + 1),
                        ),
                    )
                )
            ).alias("value")
        )
    )
    from ..codec import parse_events

    events = parse_events(rendered).where(F.col("op_type") == "Add")
    return (
        events.groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("sequence").alias("n_seq"),
            F.min("sequence").alias("min_seq"),
            F.max("sequence").alias("max_seq"),
        )
        .select(
            "file_name",
            "n_events",
            "n_seq",
            (F.col("n_events") - F.col("n_seq")).alias("n_dups"),
            (F.col("max_seq") - F.col("min_seq") + 1 - F.col("n_seq")).alias(
                "gap_count"
            ),
            "min_seq",
            "max_seq",
        )
    )


@register(
    "cdc_tx_histogram",
    tags=("cdc", "audit", "transactions"),
    oracle="""
WITH k AS (
  SELECT o_orderkey AS key FROM orders WHERE o_orderstatus <> 'F'),
tx AS (
  SELECT key // 10 AS tx, CAST(count(*) AS BIGINT) AS sz
  FROM k GROUP BY 1)
SELECT sz AS tx_size, CAST(count(*) AS BIGINT) AS n_txs
FROM tx GROUP BY sz
""",
)
def cdc_tx_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTION-SIZE PROFILE through the real BEGIN-skip filter
    (reference F3, binlog_parser.rs:276-281) — the workload-shape
    statistic a replication operator watches to size apply batches
    (many single-row transactions ⇒ per-commit overhead dominates;
    few giant ones ⇒ lag spikes and lock pressure). The fixture
    renders each 10-key block of orders as one transaction: a BEGIN
    Query marker plus one Add per surviving (non-'F') order, all
    through the wire render + codec.parse_events decode; the BEGIN
    markers MUST be dropped by skip_begin_statements before counting
    — if F3 ever leaks them, every transaction's size inflates by one
    and the histogram shifts off the oracle, which computes the same
    distribution arithmetically from orders.

    100 TB shape: render is one scan + explode; the profile is two
    map-side-combinable aggregates (per-tx count, then per-size
    count) — the same two-phase histogram kernel as
    q67_order_count_histogram, fed by the streaming-decode path."""
    from ..codec import parse_events
    from ..operators.filters import skip_begin_statements

    o = load(spark, sf_dir, "orders")

    def add_ev(seq: F.Column) -> F.Column:
        return F.concat(
            F.lit('{"uri":"flv://mysql-srv1/cdcdb/orders_t","sequence":'),
            seq.cast("string"),
            F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
            seq.cast("string"),
            F.lit('},"columns":["o_orderkey"],'
                  '"operation":{"Add":{"rows":[{"cols":['),
            F.to_json(F.struct(F.col("o_orderkey").alias("SignedInteger"))),
            F.lit("]}]}}}"),
        )

    def begin_ev(seq: F.Column) -> F.Column:
        return F.concat(
            F.lit('{"uri":"flv://mysql-srv1/cdcdb","sequence":'),
            seq.cast("string"),
            F.lit(',"bn_file":{"fileName":"binlog.000001","offset":'),
            seq.cast("string"),
            F.lit('},"operation":{"Query":"BEGIN"}}'),
        )

    par = spark.sparkContext.defaultParallelism
    n = 1 << 40  # BEGIN sequences sort above all Add sequences
    rendered = (
        o.repartition(par)
        .select(
            F.explode(
                F.array_compact(
                    F.array(
                        # one BEGIN marker per 10-key transaction block
                        F.when(
                            F.col("o_orderkey") % 10 == 0,
                            begin_ev(F.col("o_orderkey") + F.lit(n)),
                        ),
                        # one Add per surviving order
                        F.when(
                            F.col("o_orderstatus") != "F",
                            add_ev(F.col("o_orderkey")),
                        ),
                    )
                )
            ).alias("value")
        )
    )
    events = skip_begin_statements(parse_events(rendered))
    # Deliberately NO op_type filter after F3: if skip_begin ever
    # leaked a BEGIN, it would land in a (huge-sequence) phantom tx
    # and shift the histogram off the oracle — the filter is load-
    # bearing, not decorative.
    tx = events.groupBy(F.expr("sequence DIV 10").alias("tx")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return tx.groupBy(F.col("sz").alias("tx_size")).agg(
        F.count(F.lit(1)).alias("n_txs")
    )


@register(
    "cdc_changelog_compaction",
    tags=("cdc", "apply", "compaction", "snapshot"),
    oracle="""
WITH chg AS (
  SELECT o_orderkey AS k, o_orderkey * 4 + 1 AS seq, 'I' AS op,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderkey * 4 + 2, 'U',
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1000
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, o_orderkey * 4 + 3, 'D', NULL
  FROM orders WHERE o_orderkey % 7 = 0),
latest AS (
  SELECT k,
         arg_max(op, seq) AS op,
         arg_max(price_cents, seq) AS price_cents,
         CAST(max(seq) AS BIGINT) AS last_seq,
         CAST(count(*) AS BIGINT) AS n_versions
  FROM chg GROUP BY k)
SELECT k AS o_orderkey, price_cents, last_seq, n_versions
FROM latest WHERE op <> 'D'
""",
)
def cdc_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGELOG COMPACTION — the read-optimized-snapshot operator every
    CDC lake pipeline runs between full replays: given a parsed
    changelog of (key, sequence, op, payload) rows, materialize the
    latest surviving row per key in ONE hash aggregate (max_by on the
    sequence), dropping keys whose latest op is a delete tombstone.
    This is the Hudi/Delta-style compaction counterpart of
    operators/apply.py's general sequential fold: the fold handles
    arbitrary interleavings streamingly; compaction exploits that for a
    snapshot only the LAST version matters, collapsing the whole
    history with a single shuffle and map-side partial aggregation —
    the plan that wins when the changelog is 100x the live key count.

    The changelog is derived deterministically from orders (insert for
    every key at seq 4k+1, a +10.00 price correction for keys % 3 = 0
    at 4k+2, a tombstone for keys % 7 = 0 at 4k+3) so the DuckDB
    oracle rebuilds it arithmetically; prices are quantized to exact
    cents BEFORE any aggregation per the repo rounding standard.

    100 TB shape: one shuffle on the key, partial max_by combine on
    the map side (state = one row per distinct key per partition),
    tombstone filter AFTER the aggregate — never a window over a
    whale key's full history (sequence ties cannot occur: sequences
    are distinct per key by construction)."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    k = F.col("o_orderkey")
    ins = o.select(
        k.alias("k"), (k * 4 + 1).alias("seq"), F.lit("I").alias("op"),
        cents.alias("price_cents"),
    )
    upd = o.where(k % 3 == 0).select(
        k.alias("k"), (k * 4 + 2).alias("seq"), F.lit("U").alias("op"),
        (cents + 1000).alias("price_cents"),
    )
    dele = o.where(k % 7 == 0).select(
        k.alias("k"), (k * 4 + 3).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("price_cents"),
    )
    chg = ins.unionByName(upd).unionByName(dele)
    return compact_changelog(chg).select(
        F.col("k").alias("o_orderkey"), "price_cents", "last_seq", "n_versions"
    )


def compact_changelog(chg: DataFrame) -> DataFrame:
    """ONE-aggregate snapshot compaction over (k, seq, op, *payload)
    changelog rows: max_by every payload column on seq, drop keys whose
    latest op is a 'D' tombstone. Latest-wins by construction, so a
    re-insert AFTER a tombstone resurrects the key (pinned by
    tests/test_interval_ops.py). Sequences must be distinct per key.

    NULL-payload asymmetry (r11 ADVICE): Spark max_by(c, seq) returns
    the payload of the max-seq row even when that payload is NULL;
    DuckDB arg_max(c, seq) SKIPS rows whose ARG is NULL and returns
    the payload of the latest row where c IS NOT NULL. The two agree
    only when every I/U row carries non-null payloads (true here: the
    sole NULL payloads ride 'D' rows, whose keys are filtered out).
    Reusing this kernel against an arg_max oracle with nullable I/U
    payloads WILL silently diverge — either require non-null payloads
    or oracle with DuckDB's last(c ORDER BY seq) instead."""
    payload = [c for c in chg.columns if c not in ("k", "seq", "op")]
    latest = chg.groupBy("k").agg(
        F.expr("max_by(op, seq)").alias("op"),
        *[F.expr(f"max_by({c}, seq)").alias(c) for c in payload],
        F.max("seq").cast("long").alias("last_seq"),
        F.count(F.lit(1)).cast("long").alias("n_versions"),
    )
    return latest.where(F.col("op") != "D").drop("op")
