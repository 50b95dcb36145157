"""Change-event data model: envelope schema, the scalar Value type
system, canonical cell rendering, and MySQL→Spark type mapping.

Reference surface being reproduced (see SURVEY.md §1):
- envelope: cdc-mysql/src/messages/flv_message.rs:6-15, bn_file.rs:3-8
- operations: cdc-mysql/src/messages/operations.rs:6-11, row_ops.rs:6-29
- scalar values: cdc-mysql/src/messages/values.rs:9-45 (externally-tagged
  JSON: ``{"String": "x"}``, ``{"Date":{"year":…,"month":…,"day":…}}``,
  bare ``"Null"``)
- display/SQL-literal formats: cdc-mysql/src/messages/values.rs:47-93

Normalized (post-codec) representation
--------------------------------------
One flat row per event; row images are arrays of *canonical strings*
(losslessly re-castable to typed columns once the schema registry knows
the column types). Add → ``before=NULL, after=cols``; Delete →
``before=cols, after=NULL``; Update → both. This is the engine's native
IR: self-describing (per-event ``columns``), order-carrying
(``sequence``), and Spark-friendly (fixed StructType, no unions).
"""

from __future__ import annotations

import base64
import json
from typing import Any

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Envelope schemas

# Wire-format envelope (pre-normalization), matching the reference JSON.
BN_FILE_SCHEMA = T.StructType(
    [
        T.StructField("fileName", T.StringType()),
        T.StructField("offset", T.LongType()),
    ]
)

# Normalized event schema — the engine's native change-event IR.
ROW_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("before", T.ArrayType(T.StringType(), containsNull=True), True),
        T.StructField("after", T.ArrayType(T.StringType(), containsNull=True), True),
    ]
)

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("urn", T.StringType()),       # mysql resource name from the URI
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),     # null for db-level (Query) events
        T.StructField("sequence", T.LongType()),
        T.StructField("file_name", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("op_type", T.StringType()),   # Query | Add | Update | Delete
        T.StructField("query", T.StringType()),     # raw SQL for Query events
        T.StructField("columns", T.ArrayType(T.StringType()), True),
        T.StructField("rows", T.ArrayType(ROW_IMAGE_SCHEMA), True),
    ]
)

OP_TYPES = ("Query", "Add", "Update", "Delete")

# ---------------------------------------------------------------------------
# Value codec: externally-tagged JSON union <-> canonical string

# Canonical formats (pinned; the DuckDB oracle comparison and the typed
# cast in the apply kernel both rely on these exact shapes):
#   String   as-is            Integer-ish   base-10 digits
#   Float/Double  repr()      Decimal       digits as given
#   Date     YYYY-MM-DD       Time          HH:MM:SS.ffffff
#   DateTime YYYY-MM-DD HH:MM:SS.ffffff     Timestamp  epoch-seconds.ffffff
#   Json     compact JSON     Blob          base64
#   Null     None

INT_KINDS = {"UnsignedInteger", "SignedInteger", "Enum", "Set", "Year"}


def _canon_date(p) -> str:
    return f"{p['year']:04d}-{p['month']:02d}-{p['day']:02d}"


def _canon_time(p) -> str:
    return (
        f"{p['hours']:02d}:{p['minutes']:02d}:{p['seconds']:02d}"
        f".{int(p.get('subseconds', 0)):06d}"
    )


def _canon_datetime(p) -> str:
    return (
        f"{p['year']:04d}-{p['month']:02d}-{p['day']:02d} "
        f"{p['hour']:02d}:{p['minute']:02d}:{p['second']:02d}"
        f".{int(p.get('subsecond', 0)):06d}"
    )


# One-lookup dispatch instead of an if-chain: value_to_canonical runs
# once per CELL of every decoded event — the hottest line in the wire
# decode path.
_KIND_CANON: dict[str, Any] = {
    "String": lambda p: p,
    "UnsignedInteger": lambda p: str(int(p)),
    "SignedInteger": lambda p: str(int(p)),
    "Enum": lambda p: str(int(p)),
    "Set": lambda p: str(int(p)),  # bitmask; member i of the DDL list = 1 << i
    "Year": lambda p: str(int(p)),
    "Float": lambda p: repr(float(p)),
    "Double": lambda p: repr(float(p)),
    "Decimal": str,
    "Date": _canon_date,
    "Time": _canon_time,
    "DateTime": _canon_datetime,
    "Timestamp": lambda p: f"{int(p['unix_time'])}.{int(p.get('subsecond', 0)):06d}",
    "Json": lambda p: json.dumps(
        p, separators=(",", ":"), sort_keys=True, ensure_ascii=False
    ),
    "Blob": lambda p: base64.b64encode(bytes(p)).decode("ascii"),
}


def value_to_canonical(v: Any) -> str | None:
    """Decode one externally-tagged Value JSON object to its canonical
    string (None for Null)."""
    if v == "Null" or v is None:
        return None
    if not isinstance(v, dict) or len(v) != 1:
        raise ValueError(f"malformed Value: {v!r}")
    kind, payload = next(iter(v.items()))
    fn = _KIND_CANON.get(kind)
    if fn is None:
        raise ValueError(f"unknown Value kind: {kind}")
    return fn(payload)


def render_value_display(v: Any) -> str:
    """Render a Value exactly as the reference's Display impl does
    (cdc-mysql/src/messages/values.rs:47-93): strings/dates/times
    double-quoted with NON-padded components (``"2000-3-30"``),
    numerics bare, Null → the token ``Null``, Blob as raw UTF-8, Json
    raw. This is the textual kernel behind the reference's generated
    INSERT/UPDATE/DELETE statements (golden-tested for parity)."""
    if v == "Null" or v is None:
        return "Null"
    kind, payload = next(iter(v.items()))
    if kind in ("UnsignedInteger", "SignedInteger", "Enum", "Set"):
        return str(int(payload))
    if kind in ("Float", "Double"):
        f = float(payload)
        return str(int(f)) if f == int(f) else repr(f)
    if kind == "String":
        return f'"{payload}"'
    if kind == "Year":
        return f'"{int(payload)}"'
    if kind == "Date":
        return f'"{payload["year"]}-{payload["month"]}-{payload["day"]}"'
    if kind == "Time":
        return (
            f'"{payload["hours"]}:{payload["minutes"]}:{payload["seconds"]}'
            f'.{payload.get("subseconds", 0)}"'
        )
    if kind == "DateTime":
        return (
            f'"{payload["year"]}-{payload["month"]}-{payload["day"]} '
            f'{payload["hour"]}:{payload["minute"]}:{payload["second"]}'
            f'.{payload.get("subsecond", 0)}"'
        )
    if kind == "Json":
        return json.dumps(payload, separators=(",", ":"), sort_keys=True, ensure_ascii=False)
    if kind == "Decimal":
        return str(payload)
    if kind == "Blob":
        return bytes(payload).decode("utf-8")
    if kind == "Timestamp":
        import datetime

        dt = datetime.datetime.fromtimestamp(
            int(payload["unix_time"]), datetime.timezone.utc
        )
        sub = int(payload.get("subsecond", 0))
        return f'"{dt.strftime("%Y-%m-%d %H:%M:%S")}.{sub:09d}"'
    raise ValueError(f"unknown Value kind: {kind}")


# ---------------------------------------------------------------------------
# MySQL → Spark type mapping (SURVEY §1.4 table)

_MYSQL_TO_SPARK: list[tuple[tuple[str, ...], T.DataType]] = [
    (("varchar", "char", "text", "tinytext", "mediumtext", "longtext", "enum", "set"), T.StringType()),
    (("bigint",), T.LongType()),
    (("int", "integer", "mediumint"), T.IntegerType()),
    (("smallint",), T.ShortType()),
    (("tinyint",), T.ShortType()),
    (("double", "real"), T.DoubleType()),
    (("float",), T.FloatType()),
    (("date",), T.DateType()),
    (("datetime",), T.TimestampNTZType()),
    (("timestamp",), T.TimestampNTZType()),
    (("time",), T.StringType()),     # no Spark TIME type; canonical HH:MM:SS.ffffff
    (("year",), T.IntegerType()),
    (("blob", "binary", "varbinary", "tinyblob", "mediumblob", "longblob"), T.BinaryType()),
    # GEOMETRY family: carried as opaque SRID+WKB bytes (reference
    # parity — mysql_binlog hands geometry through as Value::Blob)
    (("geometry", "point", "linestring", "polygon", "geometrycollection",
      "multipoint", "multilinestring", "multipolygon"), T.BinaryType()),
    (("json",), T.StringType()),
    (("bool", "boolean"), T.BooleanType()),
]


def mysql_type_to_spark(mysql_type: str | None) -> T.DataType:
    """Map a MySQL column type (e.g. ``VARCHAR(20)``) to a Spark type.
    Unknown/absent types fall back to StringType (canonical strings)."""
    if not mysql_type:
        return T.StringType()
    base = mysql_type.strip().lower().split("(")[0].strip()
    if base == "decimal" or base == "numeric":
        inner = mysql_type[mysql_type.find("(") + 1 : mysql_type.find(")")] if "(" in mysql_type else ""
        parts = [p.strip() for p in inner.split(",") if p.strip()]
        p = int(parts[0]) if parts else 38
        s = int(parts[1]) if len(parts) > 1 else 0
        return T.DecimalType(min(p, 38), s)
    for names, t in _MYSQL_TO_SPARK:
        if base in names:
            return t
    return T.StringType()
