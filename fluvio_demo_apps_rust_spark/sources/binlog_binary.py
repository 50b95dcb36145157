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

Supported column types cover the reference's full Value surface
(src/messages/values.rs:9-45, fed by the mysql_binlog crate):
LONGLONG/LONG/INT24/SHORT/TINY, FLOAT/DOUBLE, VARCHAR / VAR_STRING /
STRING(CHAR), BLOB/TEXT, DATE, DATETIME + DATETIME2, TIME + TIME2,
TIMESTAMP + TIMESTAMP2, YEAR, ENUM, SET (bitmask, one bit per DDL
member — the reference's mysql_binlog SET shape), NEWDECIMAL, JSON
(binary JSONB decode) and NULL — emitting the same externally-tagged
wire variants ({"Enum":n}, {"Set":n}, {"Year":n}, {"Time":{...}},
{"DateTime":{...}}, {"Timestamp":{"unix_time":..,"subsecond":..}},
{"Decimal":"..."}, {"Json":...}). GEOMETRY (WKB) is rejected loudly:
raise (strict) or skip the event (lenient), mirroring the producer's
strict_ddl switch.

Verified against the REFERENCE'S OWN binary fixtures
(cdc-mysql/test_files/binlog.000001/.000002/.000003 — read-only data
inputs, not code): see tests/test_binlog_binary.py. Two quirks those
real files exposed that a writer/reader round-trip cannot:
FORMAT_DESCRIPTION checksums are computed with the
LOG_EVENT_BINLOG_IN_USE_F flag bit cleared (MySQL flips the flag in
place on clean close without re-checksumming), and MYSQL_TYPE_STRING
table-map metadata is a byte PAIR (byte0 = real type — ENUM/SET hide
here — byte1 = length, with the high-bit packing for >255), not a
little-endian u16.
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
T_NULL, T_TIMESTAMP, T_LONGLONG, T_INT24 = 0x06, 0x07, 0x08, 0x09
T_DATE, T_TIME, T_DATETIME, T_YEAR = 0x0A, 0x0B, 0x0C, 0x0D
T_VARCHAR, T_BLOB, T_VAR_STRING, T_STRING = 0x0F, 0xFC, 0xFD, 0xFE
T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 0x11, 0x12, 0x13
T_JSON, T_NEWDECIMAL, T_ENUM, T_SET, T_GEOMETRY = 0xF5, 0xF6, 0xF7, 0xF8, 0xFF

HEADER_LEN = 19
# Flag MySQL sets on the active binlog's FORMAT_DESCRIPTION and clears
# in place on clean close WITHOUT re-checksumming — so the FDE CRC is
# always computed over the header with this bit zeroed.
LOG_EVENT_BINLOG_IN_USE_F = 0x0001

# Fractional-seconds storage: fsp 1-2 -> 1 byte, 3-4 -> 2, 5-6 -> 3
_FSP_BYTES = (0, 1, 1, 2, 2, 3, 3)
# NEWDECIMAL: bytes needed for 0..9 leftover decimal digits
_DIG2BYTES = (0, 1, 1, 2, 2, 3, 3, 4, 4, 4)


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


def _read_fsp(data: bytes, pos: int, fsp: int) -> tuple[int, int]:
    """Fractional seconds (big-endian, stored in 10^-2·nbytes units) →
    (microseconds, new_pos)."""
    nb = _FSP_BYTES[fsp]
    if nb == 0:
        return 0, pos
    v = int.from_bytes(data[pos : pos + nb], "big")
    return v * 10 ** (6 - 2 * nb), pos + nb


def _read_decimal(data: bytes, pos: int, precision: int, scale: int) -> tuple[str, int]:
    """MySQL NEWDECIMAL binary → canonical decimal string (BigDecimal
    Display form: exactly `scale` fractional digits, no leading zeros,
    no negative zero)."""
    intg = precision - scale
    intg0, intg_rem = divmod(intg, 9)
    frac0, frac_rem = divmod(scale, 9)
    size = intg0 * 4 + _DIG2BYTES[intg_rem] + frac0 * 4 + _DIG2BYTES[frac_rem]
    buf = bytearray(data[pos : pos + size])
    if len(buf) < size:
        raise BinlogError("truncated NEWDECIMAL value")
    negative = not (buf[0] & 0x80)
    buf[0] ^= 0x80
    if negative:
        for i in range(size):
            buf[i] = ~buf[i] & 0xFF
    p = 0
    int_digits = ""
    if intg_rem:
        nb = _DIG2BYTES[intg_rem]
        int_digits += f"{int.from_bytes(buf[p:p+nb], 'big'):0{intg_rem}d}"
        p += nb
    for _ in range(intg0):
        int_digits += f"{int.from_bytes(buf[p:p+4], 'big'):09d}"
        p += 4
    frac_digits = ""
    for _ in range(frac0):
        frac_digits += f"{int.from_bytes(buf[p:p+4], 'big'):09d}"
        p += 4
    if frac_rem:
        nb = _DIG2BYTES[frac_rem]
        frac_digits += f"{int.from_bytes(buf[p:p+nb], 'big'):0{frac_rem}d}"
        p += nb
    int_digits = int_digits.lstrip("0") or "0"
    sign = "-" if negative and not (int_digits == "0" and set(frac_digits) <= {"0"}) else ""
    s = sign + int_digits + (f".{frac_digits}" if frac_digits else "")
    return s, pos + size


def _jsonb_varlen(b: bytes, p: int) -> tuple[int, int]:
    """JSONB variable-length (7 bits per byte, high bit continues)."""
    length = shift = 0
    while True:
        x = b[p]
        p += 1
        length |= (x & 0x7F) << shift
        if not (x & 0x80):
            return length, p
        shift += 7


def _jsonb_val(b: bytes, t: int, p: int):
    """Decode the JSONB value of type `t` whose data starts at b[p]."""
    if t in (0x00, 0x02):  # small object / array
        return _jsonb_container(b, p, is_obj=t == 0x00, w=2)
    if t in (0x01, 0x03):  # large object / array
        return _jsonb_container(b, p, is_obj=t == 0x01, w=4)
    if t == 0x04:  # literal
        return {0x00: None, 0x01: True, 0x02: False}[b[p]]
    if t == 0x05:
        return int.from_bytes(b[p : p + 2], "little", signed=True)
    if t == 0x06:
        return int.from_bytes(b[p : p + 2], "little")
    if t == 0x07:
        return int.from_bytes(b[p : p + 4], "little", signed=True)
    if t == 0x08:
        return int.from_bytes(b[p : p + 4], "little")
    if t == 0x09:
        return int.from_bytes(b[p : p + 8], "little", signed=True)
    if t == 0x0A:
        return int.from_bytes(b[p : p + 8], "little")
    if t == 0x0B:
        return struct.unpack_from("<d", b, p)[0]
    if t == 0x0C:
        n, p = _jsonb_varlen(b, p)
        return b[p : p + n].decode("utf-8")
    raise BinlogError(f"unsupported jsonb type {t:#x}")


def _jsonb_container(b: bytes, base: int, *, is_obj: bool, w: int):
    """Object/array: count(w) size(w), [key entries: off(w) len(2)],
    value entries: type(1) + offset-or-inlined(w). Offsets are relative
    to the container start (`base`)."""
    count = int.from_bytes(b[base : base + w], "little")
    p = base + 2 * w
    keys: list[str] = []
    if is_obj:
        for _ in range(count):
            off = int.from_bytes(b[p : p + w], "little")
            klen = int.from_bytes(b[p + w : p + w + 2], "little")
            keys.append(b[base + off : base + off + klen].decode("utf-8"))
            p += w + 2
    inline = {0x04, 0x05, 0x06} if w == 2 else {0x04, 0x05, 0x06, 0x07, 0x08}
    vals = []
    for _ in range(count):
        t = b[p]
        if t in inline:
            vals.append(_jsonb_val(b, t, p + 1))
        else:
            off = int.from_bytes(b[p + 1 : p + 1 + w], "little")
            vals.append(_jsonb_val(b, t, base + off))
        p += 1 + w
    return dict(zip(keys, vals)) if is_obj else vals


def _string_meta(b0: int, b1: int) -> int:
    """Max byte length for MYSQL_TYPE_STRING metadata (b0 = real type
    with length high bits packed into ~0x30, b1 = low length byte)."""
    if b0 == 0:
        return b1
    if (b0 & 0x30) != 0x30:
        return b1 | (((b0 & 0x30) ^ 0x30) << 4)
    return b1


def _dt(y: int, mo: int, d: int, h: int, mi: int, s: int, us: int) -> dict:
    return {
        "DateTime": {
            "year": y, "month": mo, "day": d,
            "hour": h, "minute": mi, "second": s, "subsecond": us,
        }
    }


def _read_value(t: int, meta: int, data: bytes, pos: int) -> tuple[dict | str, int]:
    """One column value from a row image → (wire Value object, new_pos).

    Wire variants match the reference's externally-tagged Value enum
    (cdc-mysql/src/messages/values.rs:9-45)."""
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
    if t == T_YEAR:
        # stored as offset from 1900 (mysql_binlog crate: val + 1900)
        return {"Year": data[pos] + 1900}, pos + 1
    if t == T_TIME:  # pre-5.6.4: 3-byte packed decimal HHMMSS
        v = int.from_bytes(data[pos : pos + 3], "little", signed=True)
        v = abs(v)
        return {
            "Time": {
                "hours": v // 10000, "minutes": (v // 100) % 100,
                "seconds": v % 100, "subseconds": 0,
            }
        }, pos + 3
    if t == T_TIME2:  # (3 + fsp)-byte big-endian offset-binary bitfield
        # MySQL stores the int and fractional parts as ONE offset-binary
        # number (my_time.c: the fsp bytes participate in the borrow for
        # negative values), so the whole (3+fsp)-byte value must be
        # negated as one integer — negating only the 3-byte part reads
        # wrong seconds AND subseconds for negative times with fsp > 0.
        nfrac = _FSP_BYTES[meta]
        nb = 3 + nfrac
        v = int.from_bytes(data[pos : pos + nb], "big")
        pos += nb
        bits = 8 * nb
        if not (v >> (bits - 1)):  # sign bit clear = negative
            v = (~v + 1) & ((1 << bits) - 1)
        frac_bits = 8 * nfrac
        us = (v & ((1 << frac_bits) - 1)) * 10 ** (6 - 2 * nfrac)
        v >>= frac_bits
        # Sign is discarded: the reference's Value::Time has no sign
        # field (cdc-mysql values.rs Time{hours,minutes,seconds,
        # subseconds}) — magnitude-only is reference parity.
        return {
            "Time": {
                "hours": (v >> 12) & 0x3FF, "minutes": (v >> 6) & 0x3F,
                "seconds": v & 0x3F, "subseconds": us,
            }
        }, pos
    if t == T_DATETIME:  # pre-5.6.4: 8-byte packed decimal
        v = int.from_bytes(data[pos : pos + 8], "little")
        d, tm = divmod(v, 1_000_000)
        return _dt(
            d // 10000, (d // 100) % 100, d % 100,
            tm // 10000, (tm // 100) % 100, tm % 100, 0,
        ), pos + 8
    if t == T_DATETIME2:  # 5-byte big-endian bitfield + fractional
        v = int.from_bytes(data[pos : pos + 5], "big")
        pos += 5
        ym = (v >> 22) & 0x1FFFF
        us, pos = _read_fsp(data, pos, meta)
        return _dt(
            ym // 13, ym % 13, (v >> 17) & 0x1F,
            (v >> 12) & 0x1F, (v >> 6) & 0x3F, v & 0x3F, us,
        ), pos
    if t == T_TIMESTAMP:  # pre-5.6.4: 4-byte little-endian epoch
        v = int.from_bytes(data[pos : pos + 4], "little")
        return {"Timestamp": {"unix_time": v, "subsecond": 0}}, pos + 4
    if t == T_TIMESTAMP2:  # 4-byte BIG-endian epoch + fractional
        v = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
        us, pos = _read_fsp(data, pos, meta)
        return {"Timestamp": {"unix_time": v, "subsecond": us}}, pos
    if t == T_NEWDECIMAL:
        s, pos = _read_decimal(data, pos, meta >> 8, meta & 0xFF)
        return {"Decimal": s}, pos
    if t == T_ENUM:  # only via T_STRING's real-type metadata
        n = meta  # packed byte width (1 or 2)
        return {"Enum": int.from_bytes(data[pos : pos + n], "little")}, pos + n
    if t == T_SET:  # only via T_STRING's real-type metadata
        n = meta  # packed byte width (1..8 — one bit per member)
        # Bitmask semantics, matching the reference's mysql_binlog SET
        # handling: member i of the DDL list is bit (1 << i).
        return {"Set": int.from_bytes(data[pos : pos + n], "little")}, pos + n
    if t == T_JSON:
        n = int.from_bytes(data[pos : pos + meta], "little")
        pos += meta
        blob = data[pos : pos + n]
        obj = None if n == 0 else _jsonb_val(blob, blob[0], 1)
        return {"Json": obj}, pos + n
    if t in (T_VARCHAR, T_VAR_STRING):
        if meta > 255:
            n = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            n = data[pos]
            pos += 1
        return {"String": _utf8(data[pos : pos + n])}, pos + n
    if t == T_STRING:
        b0, b1 = meta >> 8, meta & 0xFF
        if b0 == T_ENUM:
            return _read_value(T_ENUM, b1, data, pos)
        if b0 == T_SET:
            return _read_value(T_SET, b1, data, pos)
        maxlen = _string_meta(b0, b1)
        if maxlen > 255:
            n = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            n = data[pos]
            pos += 1
        return {"String": _utf8(data[pos : pos + n])}, pos + n
    if t == T_BLOB:
        n = int.from_bytes(data[pos : pos + meta], "little")
        pos += meta
        return {"String": data[pos : pos + n].decode("utf-8", "replace")}, pos + n
    if t == T_GEOMETRY:
        # Length-prefixed like BLOB (meta = prefix byte width); payload
        # is 4-byte SRID + WKB. Carried through OPAQUE as Blob —
        # reference parity: its mysql_binlog crate hands GEOMETRY bytes
        # straight to Value::Blob (cdc-mysql/src/messages/values.rs:16),
        # so the wire form is the Blob base64 canonical, and the typed
        # apply lands it as BinaryType via the DDL GEOMETRY mapping.
        n = int.from_bytes(data[pos : pos + meta], "little")
        pos += meta
        return {"Blob": list(data[pos : pos + n])}, pos + n
    raise BinlogError(f"unsupported column type {t:#x}")


def _utf8(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError as ex:  # lenient mode can then skip the event
        raise BinlogError(f"non-utf8 string value: {ex}") from None


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
                # MySQL checksums the FDE with LOG_EVENT_BINLOG_IN_USE_F
                # cleared, then flips the flag in place while the file is
                # active (real fixture binlog.000003 has it set).
                ev = bytearray(data[ev_start : ev_start + ev_len - 4])
                ev[17] &= ~LOG_EVENT_BINLOG_IN_USE_F & 0xFF
                if verify_checksum and zlib.crc32(bytes(ev)) != crc:
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
                    if t in (T_VARCHAR, T_VAR_STRING):
                        # max length, little-endian u16
                        col_meta.append(int.from_bytes(meta_block[mp : mp + 2], "little"))
                        mp += 2
                    elif t in (T_STRING, T_ENUM, T_SET, T_NEWDECIMAL):
                        # byte PAIR, order-significant: STRING carries
                        # (real_type, length), NEWDECIMAL (precision, scale)
                        col_meta.append((meta_block[mp] << 8) | meta_block[mp + 1])
                        mp += 2
                    elif t in (
                        T_BLOB, T_FLOAT, T_DOUBLE, T_JSON, T_GEOMETRY,
                        T_TIMESTAMP2, T_DATETIME2, T_TIME2,
                    ):
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
        except (IndexError, KeyError, ValueError, OverflowError, struct.error) as ex:
            # malformed payloads surface as low-level errors mid-decode;
            # normalize so strict raises one exception type and lenient
            # skips the event uniformly
            if strict:
                raise BinlogError(f"malformed event at offset {ev_start}: {ex!r}") from ex
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
