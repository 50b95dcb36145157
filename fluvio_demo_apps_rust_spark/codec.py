"""Event codec: wire JSON ⇄ normalized change-event DataFrame.

``parse_events`` turns a DataFrame with one JSON event per row (the
reference's wire format, SURVEY §1.2/FIXTURES §3) into the engine's
normalized ``CHANGE_EVENT_SCHEMA``. The externally-tagged Value union
(``{"String": …}`` objects mixed with bare ``"Null"`` strings) cannot be
expressed for ``from_json`` directly (SURVEY §7.4.4), so decoding runs
in an Arrow-batched ``mapInPandas`` — vectorized transfer, per-partition
parallelism, no driver involvement. ``render_events`` is the inverse
(used by the producer-side topic sink and in round-trip tests).

Reference: JSON encode/decode hops at
cdc-mysql/src/producer/binlog_manager/binlog_parser.rs:125,157,189,221
and cdc-mysql/src/consumer/mysql_manager.rs:61 (operator P8).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from .schemas import CHANGE_EVENT_SCHEMA, value_to_canonical

_FIELDS = [f.name for f in CHANGE_EVENT_SCHEMA.fields]


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


def parse_events(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Wire-JSON lines → normalized change events (CHANGE_EVENT_SCHEMA)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_decode_event(json.loads(s)) for s in pdf[value_col] if s and s.strip()]
            yield pd.DataFrame(out, columns=_FIELDS)

    return df.select(value_col).mapInPandas(decode, schema=CHANGE_EVENT_SCHEMA)


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
