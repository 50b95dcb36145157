"""Binary MySQL binlog ingestion (v4 format) → wire-format JSON events.

The reference parses real binlog bytes via the mysql_binlog crate
(cdc-mysql/src/producer/binlog_manager/binlog_parser.rs:16-36) and
emits the documented JSON wire format; this module closes the same
gap Spark-natively: a pure-Python binlog-v4 parser (format per the
public MySQL internals documentation: 19-byte event headers,
FORMAT_DESCRIPTION / QUERY / TABLE_MAP / WRITE·UPDATE·DELETE_ROWS_v2
payloads, CRC32 checksum trailers) that yields exactly the wire JSON
strings ``codec.parse_events`` already accepts — so binary binlogs and
JSON event directories are interchangeable producer inputs.

Distribution shape: binlog files are NOT splittable (TABLE_MAP state
is positional — a reader must see the map event before its row
events, same reason the reference scans files serially from an
offset, S2/S3). So the unit of parallelism is the FILE:
``read_binlog_files`` lists files via Spark's binaryFile source and
parses each file's bytes inside one Arrow-batched ``mapInPandas``
task. At 100 TB of binlogs that is one task per (bounded, server-side
rotated) file — the natural parallelism of the source, with no driver
involvement per event.

Supported column types cover the reference demo surface (pet + orders
scenarios): LONGLONG/LONG/SHORT/TINY, FLOAT/DOUBLE, VARCHAR /
VAR_STRING / STRING(CHAR), BLOB/TEXT, DATE, and NULL — unsupported
types raise (strict) or skip the event (lenient), mirroring the
producer's strict_ddl switch.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator
from dataclasses import dataclass

MAGIC = b"\xfebin"

# Event type codes (public binlog v4 spec)
FORMAT_DESCRIPTION_EVENT = 0x0F
QUERY_EVENT = 0x02
TABLE_MAP_EVENT = 0x13
WRITE_ROWS_EVENT_V2 = 0x1E
UPDATE_ROWS_EVENT_V2 = 0x1F
DELETE_ROWS_EVENT_V2 = 0x20
ROTATE_EVENT = 0x04
XID_EVENT = 0x10
STOP_EVENT = 0x03

# Column type codes
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 0x01, 0x02, 0x03, 0x04, 0x05
T_NULL, T_LONGLONG, T_INT24, T_DATE = 0x06, 0x08, 0x09, 0x0A
T_VARCHAR, T_BLOB, T_VAR_STRING, T_STRING = 0x0F, 0xFC, 0xFD, 0xFE

HEADER_LEN = 19


class BinlogError(Exception):
    pass


@dataclass
class _TableMap:
    db: str
    table: str
    col_types: list[int]
    col_meta: list[int]


def _lenenc(data: bytes, pos: int) -> tuple[int, int]:
    """Length-encoded integer → (value, new_pos)."""
    b0 = data[pos]
    if b0 < 0xFB:
        return b0, pos + 1
    if b0 == 0xFC:
        return int.from_bytes(data[pos + 1 : pos + 3], "little"), pos + 3
    if b0 == 0xFD:
        return int.from_bytes(data[pos + 1 : pos + 4], "little"), pos + 4
    if b0 == 0xFE:
        return int.from_bytes(data[pos + 1 : pos + 9], "little"), pos + 9
    raise BinlogError(f"bad length-encoded int prefix {b0:#x}")


def _bit(bitmap: bytes, i: int) -> bool:
    return bool(bitmap[i // 8] & (1 << (i % 8)))


def _string_meta(meta: int) -> int:
    """Max length for MYSQL_TYPE_STRING's packed 2-byte metadata (the
    real-type/length split documented for CHAR columns)."""
    if meta < 256:
        return meta
    b0, b1 = meta >> 8, meta & 0xFF
    if (b0 & 0x30) != 0x30:
        return b1 | (((b0 & 0x30) ^ 0x30) << 4)
    return b1


def _read_value(t: int, meta: int, data: bytes, pos: int) -> tuple[dict | str, int]:
    """One column value from a row image → (wire Value object, new_pos)."""
    if t == T_TINY:
        return {"SignedInteger": int.from_bytes(data[pos : pos + 1], "little", signed=True)}, pos + 1
    if t == T_SHORT:
        return {"SignedInteger": int.from_bytes(data[pos : pos + 2], "little", signed=True)}, pos + 2
    if t == T_INT24:
        return {"SignedInteger": int.from_bytes(data[pos : pos + 3], "little", signed=True)}, pos + 3
    if t == T_LONG:
        return {"SignedInteger": int.from_bytes(data[pos : pos + 4], "little", signed=True)}, pos + 4
    if t == T_LONGLONG:
        return {"SignedInteger": int.from_bytes(data[pos : pos + 8], "little", signed=True)}, pos + 8
    if t == T_FLOAT:
        return {"Float": struct.unpack("<f", data[pos : pos + 4])[0]}, pos + 4
    if t == T_DOUBLE:
        return {"Double": struct.unpack("<d", data[pos : pos + 8])[0]}, pos + 8
    if t == T_DATE:
        v = int.from_bytes(data[pos : pos + 3], "little")
        return {"Date": {"year": v >> 9, "month": (v >> 5) & 15, "day": v & 31}}, pos + 3
    if t in (T_VARCHAR, T_VAR_STRING):
        if meta > 255:
            n = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            n = data[pos]
            pos += 1
        return {"String": data[pos : pos + n].decode("utf-8")}, pos + n
    if t == T_STRING:
        maxlen = _string_meta(meta)
        if maxlen > 255:
            n = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            n = data[pos]
            pos += 1
        return {"String": data[pos : pos + n].decode("utf-8")}, pos + n
    if t == T_BLOB:
        n = int.from_bytes(data[pos : pos + meta], "little")
        pos += meta
        return {"String": data[pos : pos + n].decode("utf-8", "replace")}, pos + n
    raise BinlogError(f"unsupported column type {t:#x}")


def _read_row(
    tm: _TableMap, present: bytes, n_present: int, data: bytes, pos: int
) -> tuple[list, int]:
    """One row image: null bitmap over PRESENT columns, then values."""
    nullmap = data[pos : pos + (n_present + 7) // 8]
    pos += (n_present + 7) // 8
    out: list = []
    j = 0  # index among present columns
    for i, (t, meta) in enumerate(zip(tm.col_types, tm.col_meta)):
        if not _bit(present, i):
            continue
        if _bit(nullmap, j):
            out.append("Null")
        else:
            v, pos = _read_value(t, meta, data, pos)
            out.append(v)
        j += 1
    return out, pos


def _wire(
    server: str,
    db: str,
    table: str | None,
    seq: int,
    file_name: str,
    offset: int,
    operation: dict,
    columns: list[str] | None = None,
) -> str:
    path = f"flv://{server}/{db}" + (f"/{table}" if table else "")
    obj: dict = {
        "uri": path,
        "sequence": seq,
        "bn_file": {"fileName": file_name, "offset": offset},
    }
    if columns is not None:
        obj["columns"] = columns
    obj["operation"] = operation
    return json.dumps(obj, separators=(",", ":"))


def parse_binlog_bytes(
    data: bytes,
    file_name: str = "binlog.000001",
    server: str = "mysql-srv1",
    *,
    start_offset: int = 4,
    start_sequence: int = 0,
    columns_by_table: dict[tuple[str, str], list[str]] | None = None,
    strict: bool = True,
    verify_checksum: bool = True,
) -> list[str]:
    """Parse one binlog file's bytes into wire-format JSON event strings.

    ``start_offset`` resumes mid-file (S2: file scan from offset —
    byte position of the first event to emit, 4 = just past magic).
    ``columns_by_table`` supplies column NAMES (binlogs carry only
    positional types; MySQL itself resolves names from the schema —
    here they come from the DDL registry or caller). Falls back to
    ``c0..cN`` when unknown, still positionally correct.
    """
    if data[:4] != MAGIC:
        raise BinlogError("not a binlog file (bad magic)")
    pos = 4
    checksummed = False
    tables: dict[int, _TableMap] = {}
    out: list[str] = []
    seq = start_sequence
    names = columns_by_table or {}

    def emit(db: str, table: str | None, off: int, op: dict, cols: list[str] | None = None) -> None:
        nonlocal seq
        out.append(_wire(server, db, table, seq, file_name, off, op, cols))
        seq += 1

    while pos + HEADER_LEN <= len(data):
        ev_start = pos
        _ts, type_code = struct.unpack_from("<IB", data, pos)
        _server_id, ev_len, _next_pos, _flags = struct.unpack_from("<IIIH", data, pos + 5)
        if ev_len < HEADER_LEN or pos + ev_len > len(data):
            raise BinlogError(f"truncated event at offset {pos}")
        body = data[pos + HEADER_LEN : pos + ev_len]
        pos += ev_len

        # FORMAT_DESCRIPTION declares the checksum algorithm for the
        # rest of the file (alg byte + CRC32 live in its own tail).
        if type_code == FORMAT_DESCRIPTION_EVENT:
            if len(body) >= 5 and body[-5] == 1:
                checksummed = True
                crc = int.from_bytes(body[-4:], "little")
                if verify_checksum and zlib.crc32(data[ev_start : ev_start + ev_len - 4]) != crc:
                    raise BinlogError(f"bad CRC32 on format-description event at {ev_start}")
            continue
        if checksummed:
            crc = int.from_bytes(body[-4:], "little")
            if verify_checksum and zlib.crc32(data[ev_start : ev_start + ev_len - 4]) != crc:
                raise BinlogError(f"bad CRC32 at offset {ev_start}")
            body = body[:-4]
        if ev_start < start_offset:
            # before the resume point: keep parsing (TABLE_MAP state!) but
            # do not emit row/query events
            emit_ok = False
        else:
            emit_ok = True

        try:
            if type_code == QUERY_EVENT:
                # post-header: thread_id(4) exec_time(4) schema_len(1)
                # error_code(2) status_len(2); then status vars, schema,
                # NUL, query text
                schema_len = body[8]
                status_len = int.from_bytes(body[11:13], "little")
                p = 13 + status_len
                db = body[p : p + schema_len].decode("utf-8")
                p += schema_len + 1  # + NUL
                query = body[p:].decode("utf-8")
                if emit_ok and query.upper() != "BEGIN":
                    emit(db, None, ev_start, {"Query": query})
            elif type_code == TABLE_MAP_EVENT:
                table_id = int.from_bytes(body[0:6], "little")
                p = 8  # skip flags(2)
                dblen = body[p]
                db = body[p + 1 : p + 1 + dblen].decode("utf-8")
                p += 1 + dblen + 1  # + NUL
                tlen = body[p]
                table = body[p + 1 : p + 1 + tlen].decode("utf-8")
                p += 1 + tlen + 1
                n_cols, p = _lenenc(body, p)
                col_types = list(body[p : p + n_cols])
                p += n_cols
                meta_len, p = _lenenc(body, p)
                meta_block = body[p : p + meta_len]
                mp = 0
                col_meta: list[int] = []
                for t in col_types:
                    if t in (T_VARCHAR, T_VAR_STRING, T_STRING):
                        col_meta.append(int.from_bytes(meta_block[mp : mp + 2], "little"))
                        mp += 2
                    elif t in (T_BLOB, T_FLOAT, T_DOUBLE):
                        col_meta.append(meta_block[mp])
                        mp += 1
                    else:
                        col_meta.append(0)
                tables[table_id] = _TableMap(db, table, col_types, col_meta)
            elif type_code in (WRITE_ROWS_EVENT_V2, UPDATE_ROWS_EVENT_V2, DELETE_ROWS_EVENT_V2):
                table_id = int.from_bytes(body[0:6], "little")
                tm = tables.get(table_id)
                if tm is None:
                    raise BinlogError(f"row event for unmapped table id {table_id}")
                p = 8  # skip flags(2)
                extra_len = int.from_bytes(body[p : p + 2], "little")
                p += extra_len  # extra_len includes its own 2 bytes
                n_cols, p = _lenenc(body, p)
                nbm = (n_cols + 7) // 8
                present1 = body[p : p + nbm]
                p += nbm
                if type_code == UPDATE_ROWS_EVENT_V2:
                    present2 = body[p : p + nbm]
                    p += nbm
                n1 = sum(_bit(present1, i) for i in range(n_cols))
                # column names are positional; the map may pre- or post-date
                # a mid-stream ALTER, so size the name list to THIS event's
                # column count (pad generated names, truncate extras)
                known = names.get((tm.db, tm.table), [])
                cols = (list(known) + [f"c{i}" for i in range(len(known), n_cols)])[
                    :n_cols
                ]
                rows = []
                while p < len(body):
                    img1, p = _read_row(tm, present1, n1, body, p)
                    if type_code == UPDATE_ROWS_EVENT_V2:
                        n2 = sum(_bit(present2, i) for i in range(n_cols))
                        img2, p = _read_row(tm, present2, n2, body, p)
                        rows.append({"before_cols": img1, "after_cols": img2})
                    else:
                        rows.append({"cols": img1})
                if emit_ok and rows:
                    op_name = {
                        WRITE_ROWS_EVENT_V2: "Add",
                        UPDATE_ROWS_EVENT_V2: "Update",
                        DELETE_ROWS_EVENT_V2: "Delete",
                    }[type_code]
                    emit(tm.db, tm.table, ev_start, {op_name: {"rows": rows}}, cols)
            elif type_code in (ROTATE_EVENT, XID_EVENT, STOP_EVENT):
                continue  # position/transaction markers carry no row data
            # all other event types (GTID, PREVIOUS_GTIDS, …): skip
        except BinlogError:
            if strict:
                raise
            continue
    return out


def read_binlog_files(
    spark,
    path: str,
    server: str = "mysql-srv1",
    columns_by_table: dict[tuple[str, str], list[str]] | None = None,
    *,
    strict: bool = True,
):
    """Distributed binlog parse: binaryFile scan → one Arrow task per
    file → wire-JSON `value` rows ready for ``codec.parse_events``.

    Files sort by name (binlog.000001, 000002, … — the index-rotation
    order, S3) and sequences are file-offset based, so downstream
    ordering via (fileName, offset) is total. Not splittable within a
    file by design; see module docstring."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            vals: list[str] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                name = fpath.rsplit("/", 1)[-1]
                vals.extend(
                    parse_binlog_bytes(
                        bytes(content),
                        file_name=name,
                        server=server,
                        columns_by_table=columns_by_table,
                        strict=strict,
                    )
                )
            yield pd.DataFrame({"value": vals})

    return files.select("path", "content").mapInPandas(parse, schema="value string")
