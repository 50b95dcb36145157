"""Event codec: wire JSON ⇄ normalized change-event DataFrame.

``parse_events`` turns a DataFrame with one JSON event per row (the
reference's wire format, SURVEY §1.2/FIXTURES §3) into the engine's
normalized ``CHANGE_EVENT_SCHEMA``. The externally-tagged Value union
(``{"String": …}`` objects mixed with bare ``"Null"`` strings) cannot be
expressed for ``from_json`` directly (SURVEY §7.4.4); two decode
paths exist — an Arrow-batched ``mapInPandas`` (default; measured
faster, see ``parse_events``) and a pure-JVM Spark 4 VariantType
path (``parse_json`` + ``try_variant_get`` per tagged kind) for
deployments where Python worker slots are scarce. ``render_events``
is the inverse (used by the producer-side topic sink and in
round-trip tests).

Reference: JSON encode/decode hops at
cdc-mysql/src/producer/binlog_manager/binlog_parser.rs:125,157,189,221
and cdc-mysql/src/consumer/mysql_manager.rs:61 (operator P8).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

try:  # decode hot path: ~3-5× faster loads; stdlib fallback.
    # Parse-only — rendering stays on json.dumps, whose float text
    # ("1e+30") differs from orjson's ("1e30") and is pinned by the
    # wire-format goldens.
    from orjson import loads as _loads
except ImportError:  # pragma: no cover
    _loads = json.loads

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .schemas import CHANGE_EVENT_SCHEMA, ROW_IMAGE_SCHEMA, value_to_canonical

_FIELDS = [f.name for f in CHANGE_EVENT_SCHEMA.fields]
ROW_IMAGE_SCHEMA_ARRAY = T.ArrayType(ROW_IMAGE_SCHEMA)


def b64_nochunk(col: F.Column) -> F.Column:
    """Canonical (RFC 4648, unchunked) base64 of a binary column.

    Spark's ``base64`` expression MIME-chunks its output — a CR+LF
    every 76 chars, i.e. for any payload over 57 bytes — while the
    Python canonical (schemas.py, ``base64.b64encode``) never does.
    Every JVM-side blob encode MUST go through this wrapper or wire
    JSON silently diverges between the Arrow and JVM codec paths for
    blobs > 57 bytes (found by the 61-byte LINESTRING fixture in
    cdc_binlog_geometry; pinned by test_codec_property's >57-byte
    blobs)."""
    return F.regexp_replace(F.base64(col), "[\\r\\n]", "")


def parse_uri(uri: str) -> tuple[str | None, str | None, str | None]:
    """Split ``flv://<urn>/<db>[/<table>]`` → (urn, db, table).

    Reference: make_uri (bn_message.rs:40-59) / parse_uri
    (mysql_manager.rs:341-363).
    """
    if not uri or not uri.startswith("flv://"):
        return None, None, None
    parts = uri[len("flv://") :].split("/")
    urn = parts[0] if parts else None
    db = parts[1] if len(parts) > 1 else None
    table = parts[2] if len(parts) > 2 else None
    return urn, db, table


def make_uri(urn: str, db: str, table: str | None = None) -> str:
    return f"flv://{urn}/{db}" + (f"/{table}" if table else "")


def _check_header(columns: list[str] | None, rows: list[dict[str, Any]]) -> None:
    """K6 guard (mysql_manager.rs:302-335): the column header must cover
    every row value. Enforced at decode so downstream operators can
    trust positional access."""
    n = len(columns or ())
    for r in rows:
        for side in ("before", "after"):
            vals = r.get(side)
            if vals is not None and len(vals) > n:
                raise ValueError(
                    f"row carries {len(vals)} values but header has {n} columns (K6)"
                )


def _decode_event(obj: dict[str, Any]) -> dict[str, Any]:
    uri = obj.get("uri", "")
    urn, db, table = parse_uri(uri)
    bn = obj.get("bn_file") or {}
    op = obj.get("operation") or {}
    if not isinstance(op, dict) or len(op) != 1:
        raise ValueError(f"malformed operation: {op!r}")
    op_type, payload = next(iter(op.items()))
    query = None
    rows: list[dict[str, Any]] | None = None
    if op_type == "Query":
        query = payload
    elif op_type == "Add":
        rows = [
            {"before": None, "after": [value_to_canonical(v) for v in r["cols"]]}
            for r in payload["rows"]
        ]
    elif op_type == "Delete":
        rows = [
            {"before": [value_to_canonical(v) for v in r["cols"]], "after": None}
            for r in payload["rows"]
        ]
    elif op_type == "Update":
        rows = [
            {
                "before": [value_to_canonical(v) for v in r["before_cols"]],
                "after": [value_to_canonical(v) for v in r["after_cols"]],
            }
            for r in payload["rows"]
        ]
    else:
        raise ValueError(f"unknown operation type: {op_type}")
    if rows is not None:
        _check_header(obj.get("columns"), rows)
    return {
        "uri": uri,
        "urn": urn,
        "db": db.lower() if db else None,
        "table": table.lower() if table else None,
        "sequence": obj.get("sequence"),
        "file_name": bn.get("fileName"),
        "offset": bn.get("offset"),
        "op_type": op_type,
        "query": query,
        "columns": obj.get("columns"),
        "rows": rows,
    }


def parse_events(df: DataFrame, value_col: str = "value", jvm: bool = False) -> DataFrame:
    """Wire-JSON lines → normalized change events (CHANGE_EVENT_SCHEMA).

    Equivalent decode paths, all partition-parallel:

    - ``jvm=False`` (default): Arrow-batched ``mapInPandas``, one
      ``json.loads`` per event — the semantic golden and the fastest
      (~0.9 s for 150k 3-cell events on local[32], render included).
    - ``jvm=True``: pure-JVM ``from_json`` with raw-capture cells — the
      envelope parses ONCE into an aliased typed struct (string-typed
      fields capture object/number cells as raw JSON text; the alias
      matters — JsonToStructs is CodegenFallback, so inlining it would
      re-parse the envelope once per field reference), then each cell
      canonicalizes via one ``from_json`` to ``map<string,string>``
      with rare struct payloads (Date/Time/.../Blob) re-parsed only in
      their CASE branch. Zero Python workers. ~1.6 s on the same batch
      — 10× faster than the retired Variant path (~16 s; it re-probed
      each cell up to ~40× interpreted; ``_parse_events_variant`` is
      kept for parity testing). Output identical except Float/Double
      text form: the raw wire token (e.g. ``1e30``) vs Python ``repr``
      (``1e+30``) — same value after the typed cast the apply kernel
      performs.
    """
    if jvm:
        return _parse_events_json(df, value_col)
    return _parse_events_arrow(df, value_col)


def _parse_events_arrow(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Reference decoder: Arrow-batched mapInPandas, one json.loads per
    event. Kept as the semantic golden and as a fallback."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # isspace() instead of strip(): no per-line copy allocation
            out = [
                _decode_event(_loads(s))
                for s in pdf[value_col]
                if s and not s.isspace()
            ]
            yield pd.DataFrame(out, columns=_FIELDS)

    return df.select(value_col).mapInPandas(decode, schema=CHANGE_EVENT_SCHEMA)


def _canon_cell(c: F.Column) -> F.Column:
    """Externally-tagged Value (as a VariantVal) → canonical string.

    JVM mirror of schemas.value_to_canonical: each tagged kind probed
    with try_variant_get (null when the tag is absent), coalesced.
    The bare string token "Null" (and JSON null) → SQL NULL.
    """

    def lp(col: F.Column, n: int) -> F.Column:
        return F.lpad(col.cast("string"), n, "0")

    def num(kind: str) -> F.Column:
        return F.try_variant_get(c, f"$.{kind}", "long").cast("string")

    def flt(kind: str) -> F.Column:
        return F.try_variant_get(c, f"$.{kind}", "double").cast("string")

    date = F.when(
        F.try_variant_get(c, "$.Date.year", "int").isNotNull(),
        F.concat_ws(
            "-",
            lp(F.try_variant_get(c, "$.Date.year", "int"), 4),
            lp(F.try_variant_get(c, "$.Date.month", "int"), 2),
            lp(F.try_variant_get(c, "$.Date.day", "int"), 2),
        ),
    )
    time = F.when(
        F.try_variant_get(c, "$.Time.hours", "int").isNotNull(),
        F.concat(
            lp(F.try_variant_get(c, "$.Time.hours", "int"), 2),
            F.lit(":"),
            lp(F.try_variant_get(c, "$.Time.minutes", "int"), 2),
            F.lit(":"),
            lp(F.try_variant_get(c, "$.Time.seconds", "int"), 2),
            F.lit("."),
            lp(F.coalesce(F.try_variant_get(c, "$.Time.subseconds", "long"), F.lit(0)), 6),
        ),
    )
    datetime_ = F.when(
        F.try_variant_get(c, "$.DateTime.year", "int").isNotNull(),
        F.concat(
            lp(F.try_variant_get(c, "$.DateTime.year", "int"), 4),
            F.lit("-"),
            lp(F.try_variant_get(c, "$.DateTime.month", "int"), 2),
            F.lit("-"),
            lp(F.try_variant_get(c, "$.DateTime.day", "int"), 2),
            F.lit(" "),
            lp(F.try_variant_get(c, "$.DateTime.hour", "int"), 2),
            F.lit(":"),
            lp(F.try_variant_get(c, "$.DateTime.minute", "int"), 2),
            F.lit(":"),
            lp(F.try_variant_get(c, "$.DateTime.second", "int"), 2),
            F.lit("."),
            lp(F.coalesce(F.try_variant_get(c, "$.DateTime.subsecond", "long"), F.lit(0)), 6),
        ),
    )
    timestamp = F.when(
        F.try_variant_get(c, "$.Timestamp.unix_time", "long").isNotNull(),
        F.concat(
            F.try_variant_get(c, "$.Timestamp.unix_time", "long").cast("string"),
            F.lit("."),
            lp(F.coalesce(F.try_variant_get(c, "$.Timestamp.subsecond", "long"), F.lit(0)), 6),
        ),
    )
    json_ = F.when(
        F.try_variant_get(c, "$.Json", "variant").isNotNull(),
        F.to_json(F.try_variant_get(c, "$.Json", "variant")),
    )
    # Vec<u8> → base64, fully JVM-side: ints → zero-padded hex → binary.
    blob = F.when(
        F.try_variant_get(c, "$.Blob", "variant").isNotNull(),
        b64_nochunk(
            F.to_binary(
                F.array_join(
                    F.transform(
                        F.try_variant_get(c, "$.Blob", "array<int>"),
                        lambda x: F.lpad(F.hex(x), 2, "0"),
                    ),
                    "",
                ),
                F.lit("hex"),
            )
        ),
    )
    return F.when(
        c.isNull() | (F.try_variant_get(c, "$", "string") == F.lit("Null")), F.lit(None)
    ).otherwise(
        F.coalesce(
            F.try_variant_get(c, "$.String", "string"),
            num("SignedInteger"),
            num("UnsignedInteger"),
            num("Enum"),
            num("Set"),
            num("Year"),
            flt("Float"),
            flt("Double"),
            F.try_variant_get(c, "$.Decimal", "string"),
            date,
            time,
            datetime_,
            timestamp,
            json_,
            blob,
        )
    )


# Envelope schema for the from_json fast path: string-typed cell slots
# RAW-CAPTURE whatever JSON value they hold (object/number → raw text,
# string → decoded text, null → null) — Spark's Jackson parser keeps
# the raw token run for non-string values targeted at StringType.
_ENVELOPE_DDL = (
    "uri string, sequence long, "
    "bn_file struct<fileName:string, offset:long>, "
    "columns array<string>, "
    "operation struct<"
    "Query string, "
    "Add struct<rows array<struct<cols array<string>>>>, "
    "Update struct<rows array<struct<before_cols array<string>, after_cols array<string>>>>, "
    "Delete struct<rows array<struct<cols array<string>>>>"
    ">"
)


def _canon_cell_json(c: F.Column) -> F.Column:
    """Raw-captured Value cell → canonical string (schemas._KIND_CANON
    mirror). ONE from_json to map<string,string> resolves the tag and
    the scalar payloads; struct payloads (Date/Time/DateTime/Timestamp/
    Blob/Json) re-parse the payload text only inside their CASE branch."""

    def lp(col: F.Column, n: int) -> F.Column:
        return F.lpad(col.cast("string"), n, "0")

    m = F.from_json(c, "map<string,string>")
    kind = F.element_at(F.map_keys(m), 1)
    payload = F.element_at(F.map_values(m), 1)

    date_s = F.from_json(payload, "year int, month int, day int")
    time_s = F.from_json(payload, "hours int, minutes int, seconds int, subseconds long")
    dt_s = F.from_json(
        payload, "year int, month int, day int, hour int, minute int, second int, subsecond long"
    )
    ts_s = F.from_json(payload, "unix_time long, subsecond long")
    date_c = F.concat_ws(
        "-", lp(date_s["year"], 4), lp(date_s["month"], 2), lp(date_s["day"], 2)
    )
    time_c = F.concat(
        lp(time_s["hours"], 2), F.lit(":"), lp(time_s["minutes"], 2), F.lit(":"),
        lp(time_s["seconds"], 2), F.lit("."),
        lp(F.coalesce(time_s["subseconds"], F.lit(0)), 6),
    )
    dt_c = F.concat(
        lp(dt_s["year"], 4), F.lit("-"), lp(dt_s["month"], 2), F.lit("-"), lp(dt_s["day"], 2),
        F.lit(" "),
        lp(dt_s["hour"], 2), F.lit(":"), lp(dt_s["minute"], 2), F.lit(":"), lp(dt_s["second"], 2),
        F.lit("."), lp(F.coalesce(dt_s["subsecond"], F.lit(0)), 6),
    )
    ts_c = F.concat(
        ts_s["unix_time"].cast("string"), F.lit("."),
        lp(F.coalesce(ts_s["subsecond"], F.lit(0)), 6),
    )
    # Vec<u8> → base64, fully JVM-side: ints → zero-padded hex → binary.
    blob_c = b64_nochunk(
        F.to_binary(
            F.array_join(
                F.transform(
                    F.from_json(payload, "array<int>"),
                    lambda x: F.lpad(F.hex(x), 2, "0"),
                ),
                "",
            ),
            F.lit("hex"),
        )
    )
    json_c = F.to_json(F.parse_json(payload))
    # Parity with the Arrow golden's error posture: a cell that is
    # neither null, the "Null" token, nor a single-key tagged object
    # (e.g. a bare number, a bare string, a multi-key object) must
    # RAISE, not silently decode to SQL NULL.
    return (
        F.when(c.isNull() | (c == F.lit("Null")), F.lit(None).cast("string"))
        .when(
            m.isNull() | (F.size(F.map_keys(m)) != 1),
            F.raise_error(F.concat(F.lit("malformed Value: "), c)).cast("string"),
        )
        .when(kind.isin("String", "Decimal"), payload)
        .when(kind.isin("SignedInteger", "UnsignedInteger", "Enum", "Set", "Year"), payload)
        .when(kind.isin("Float", "Double"), payload)
        .when(kind == "Date", date_c)
        .when(kind == "Time", time_c)
        .when(kind == "DateTime", dt_c)
        .when(kind == "Timestamp", ts_c)
        .when(kind == "Blob", blob_c)
        .when(kind == "Json", json_c)
        .otherwise(
            F.raise_error(F.concat(F.lit("unknown Value kind: "), kind))
        )
    )


def _parse_events_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JVM decode fast path: ONE from_json parse of the envelope with
    raw-captured cells, map-based cell canonicalization. One narrow
    projection, no shuffles, no Python workers."""
    src = df.select(F.col(value_col).alias("value")).filter(
        F.col("value").isNotNull() & (F.trim("value") != "")
    )
    # The envelope parse is ALIASED into its own projection: ~15 field
    # references follow, and JsonToStructs is CodegenFallback —
    # inlining it would re-parse the envelope once per reference
    # (CollapseProject keeps the boundary because a non-cheap alias is
    # referenced more than once).
    src = src.select("value", F.from_json(F.col("value"), _ENVELOPE_DDL).alias("_e"))
    e = F.col("_e")
    uri = e["uri"]
    path = F.split(F.substring(uri, 7, 1 << 20), "/")
    add_rows = e["operation"]["Add"]["rows"]
    upd_rows = e["operation"]["Update"]["rows"]
    del_rows = e["operation"]["Delete"]["rows"]
    query = e["operation"]["Query"]

    def images(arr: F.Column, before_field: str | None, after_field: str | None) -> F.Column:
        def one(r: F.Column) -> F.Column:
            null_img = F.lit(None).cast("array<string>")
            before = (
                F.transform(r[before_field], _canon_cell_json) if before_field else null_img
            )
            after = (
                F.transform(r[after_field], _canon_cell_json) if after_field else null_img
            )
            return F.struct(before.alias("before"), after.alias("after"))

        return F.transform(arr, one)

    rows = (
        F.when(add_rows.isNotNull(), images(add_rows, None, "cols"))
        .when(del_rows.isNotNull(), images(del_rows, "cols", None))
        .when(upd_rows.isNotNull(), images(upd_rows, "before_cols", "after_cols"))
    )
    columns = e["columns"]
    ncols = F.coalesce(F.size(columns), F.lit(0))

    # K6 guard (mysql_manager.rs:302-335): header must cover every row
    # value. Folded into the rows expression so it cannot be pruned.
    # The decoded rows array is LET-bound (single-element transform) so
    # the full cell-canonicalization expression is evaluated ONCE —
    # referencing it from the width probe, the null check, and the
    # passthrough branch directly would re-decode every cell three
    # times (lambda bodies get no common-subexpression elimination;
    # measured 5.9 s vs 0.9 s at 150k events).
    def check(rs: F.Column) -> F.Column:
        widths = F.transform(
            rs,
            lambda r: F.greatest(
                F.coalesce(F.size(r["before"]), F.lit(0)),
                F.coalesce(F.size(r["after"]), F.lit(0)),
            ),
        )
        max_width = F.coalesce(F.array_max(widths), F.lit(0))
        return F.when(
            rs.isNotNull() & (max_width > ncols),
            F.raise_error(
                F.concat(
                    F.lit("row carries "),
                    max_width.cast("string"),
                    F.lit(" values but header has "),
                    ncols.cast("string"),
                    F.lit(" columns (K6)"),
                )
            ).cast(ROW_IMAGE_SCHEMA_ARRAY),
        ).otherwise(rs)

    rows_checked = F.element_at(F.transform(F.array(rows), check), 1)
    op_type = (
        F.when(add_rows.isNotNull(), F.lit("Add"))
        .when(upd_rows.isNotNull(), F.lit("Update"))
        .when(del_rows.isNotNull(), F.lit("Delete"))
        .when(query.isNotNull(), F.lit("Query"))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("unknown or malformed operation: "), F.col("value"))
            )
        )
    )
    return src.select(
        uri.alias("uri"),
        F.when(uri.startswith("flv://"), F.get(path, 0)).alias("urn"),
        F.when(uri.startswith("flv://"), F.lower(F.get(path, 1))).alias("db"),
        F.when(uri.startswith("flv://"), F.lower(F.get(path, 2))).alias("table"),
        e["sequence"].alias("sequence"),
        e["bn_file"]["fileName"].alias("file_name"),
        e["bn_file"]["offset"].alias("offset"),
        op_type.alias("op_type"),
        query.alias("query"),
        columns.alias("columns"),
        rows_checked.alias("rows"),
    )


def _parse_events_variant(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JVM decode path: parse_json → variant path extraction. One
    narrow projection, no shuffles, no Python workers."""
    src = df.select(F.col(value_col).alias("value")).filter(
        F.col("value").isNotNull() & (F.trim("value") != "")
    )
    v = F.parse_json(F.col("value"))
    uri = F.try_variant_get(v, "$.uri", "string")
    path = F.split(F.substring(uri, 7, 1 << 20), "/")
    add_rows = F.try_variant_get(v, "$.operation.Add.rows", "array<variant>")
    upd_rows = F.try_variant_get(v, "$.operation.Update.rows", "array<variant>")
    del_rows = F.try_variant_get(v, "$.operation.Delete.rows", "array<variant>")
    op_json = F.to_json(F.try_variant_get(v, "$.operation", "variant"))

    def images(arr: F.Column, before_path: str | None, after_path: str | None) -> F.Column:
        def one(r: F.Column) -> F.Column:
            null_img = F.lit(None).cast("array<string>")
            before = (
                F.transform(F.try_variant_get(r, before_path, "array<variant>"), _canon_cell)
                if before_path
                else null_img
            )
            after = (
                F.transform(F.try_variant_get(r, after_path, "array<variant>"), _canon_cell)
                if after_path
                else null_img
            )
            return F.struct(before.alias("before"), after.alias("after"))

        return F.transform(arr, one)

    rows = (
        F.when(add_rows.isNotNull(), images(add_rows, None, "$.cols"))
        .when(del_rows.isNotNull(), images(del_rows, "$.cols", None))
        .when(upd_rows.isNotNull(), images(upd_rows, "$.before_cols", "$.after_cols"))
    )
    columns = F.try_variant_get(v, "$.columns", "array<string>")
    # K6 guard (mysql_manager.rs:302-335): header must cover every row
    # value. Folded into the rows expression so it cannot be pruned.
    widths = F.transform(
        rows,
        lambda r: F.greatest(
            F.coalesce(F.size(r["before"]), F.lit(0)),
            F.coalesce(F.size(r["after"]), F.lit(0)),
        ),
    )
    max_width = F.coalesce(F.array_max(widths), F.lit(0))
    ncols = F.coalesce(F.size(columns), F.lit(0))
    rows_checked = F.when(
        rows.isNotNull() & (max_width > ncols),
        F.raise_error(
            F.concat(
                F.lit("row carries "),
                max_width.cast("string"),
                F.lit(" values but header has "),
                ncols.cast("string"),
                F.lit(" columns (K6)"),
            )
        ).cast(ROW_IMAGE_SCHEMA_ARRAY),
    ).otherwise(rows)
    op_type = (
        F.when(add_rows.isNotNull(), F.lit("Add"))
        .when(upd_rows.isNotNull(), F.lit("Update"))
        .when(del_rows.isNotNull(), F.lit("Delete"))
        .when(op_json.startswith('{"Query"'), F.lit("Query"))
        .otherwise(
            F.raise_error(F.concat(F.lit("unknown or malformed operation: "), op_json))
        )
    )
    return src.select(
        uri.alias("uri"),
        F.when(uri.startswith("flv://"), F.get(path, 0)).alias("urn"),
        F.when(uri.startswith("flv://"), F.lower(F.get(path, 1))).alias("db"),
        F.when(uri.startswith("flv://"), F.lower(F.get(path, 2))).alias("table"),
        F.try_variant_get(v, "$.sequence", "long").alias("sequence"),
        F.try_variant_get(v, "$.bn_file.fileName", "string").alias("file_name"),
        F.try_variant_get(v, "$.bn_file.offset", "long").alias("offset"),
        op_type.alias("op_type"),
        F.try_variant_get(v, "$.operation.Query", "string").alias("query"),
        columns.alias("columns"),
        rows_checked.alias("rows"),
    )


def _encode_value(c: str | None) -> Any:
    """Canonical string → externally-tagged Value. Without a type oracle
    everything non-null round-trips as String — matched by the decoder,
    used only for wire re-emission of already-normalized events."""
    return "Null" if c is None else {"String": c}


def render_events(df: DataFrame) -> DataFrame:
    """Normalized events → wire-JSON lines (column ``value``)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                obj: dict[str, Any] = {
                    "uri": rec["uri"],
                    "sequence": rec["sequence"],
                    "bn_file": {"fileName": rec["file_name"], "offset": rec["offset"]},
                }
                if rec["columns"] is not None and len(rec["columns"]):
                    obj["columns"] = list(rec["columns"])
                op = rec["op_type"]
                if op == "Query":
                    obj["operation"] = {"Query": rec["query"]}
                elif op == "Add":
                    obj["operation"] = {
                        "Add": {
                            "rows": [
                                {"cols": [_encode_value(c) for c in r["after"]]}
                                for r in rec["rows"]
                            ]
                        }
                    }
                elif op == "Delete":
                    obj["operation"] = {
                        "Delete": {
                            "rows": [
                                {"cols": [_encode_value(c) for c in r["before"]]}
                                for r in rec["rows"]
                            ]
                        }
                    }
                elif op == "Update":
                    obj["operation"] = {
                        "Update": {
                            "rows": [
                                {
                                    "before_cols": [_encode_value(c) for c in r["before"]],
                                    "after_cols": [_encode_value(c) for c in r["after"]],
                                }
                                for r in rec["rows"]
                            ]
                        }
                    }
                out.append(json.dumps(obj, separators=(",", ":")))
            yield pd.DataFrame({"value": out})

    return df.mapInPandas(encode, schema="value string")
