"""Synthetic binary binlog fixtures: a minimal MySQL binlog-v4 WRITER
(public format spec: magic, 19-byte headers, FORMAT_DESCRIPTION with
CRC32 trailers, QUERY / TABLE_MAP / ROWS_v2 events) plus the pet
scenario rendered as binlog bytes — the binary-input twin of
``fixtures.PET_EVENTS`` (reference wire goldens,
cdc-mysql/README.md:223-231). Used by tests and the
``cdc_binlog_replay`` gate query; also handy for generating demo
binlogs anywhere there is no live MySQL.
"""

from __future__ import annotations

import json
import struct
import zlib

SERVER_ID = 1
T_VARCHAR, T_STRING, T_DATE = 0x0F, 0xFE, 0x0A
T_YEAR, T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 0x0D, 0x11, 0x12, 0x13
T_JSON, T_NEWDECIMAL, T_ENUM, T_SET, T_GEOMETRY = 0xF5, 0xF6, 0xF7, 0xF8, 0xFF
_DIG2BYTES = (0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
_FSP_BYTES = (0, 1, 1, 2, 2, 3, 3)


def _enc_fsp(us: int, fsp: int) -> bytes:
    """Microseconds → big-endian fractional bytes for the given fsp."""
    nb = _FSP_BYTES[fsp]
    return (us // 10 ** (6 - 2 * nb)).to_bytes(nb, "big") if nb else b""


def _enc_decimal(s: str, precision: int, scale: int) -> bytes:
    """Decimal string → MySQL NEWDECIMAL binary (inverse of the reader)."""
    neg = s.startswith("-")
    s = s.lstrip("-")
    intpart, _, fracpart = s.partition(".")
    intpart = (intpart or "0").zfill(precision - scale)
    fracpart = fracpart.ljust(scale, "0")
    out = bytearray()
    intg0, intg_rem = divmod(precision - scale, 9)
    frac0, frac_rem = divmod(scale, 9)
    p = 0
    if intg_rem:
        out += int(intpart[: intg_rem]).to_bytes(_DIG2BYTES[intg_rem], "big")
        p = intg_rem
    for _ in range(intg0):
        out += int(intpart[p : p + 9]).to_bytes(4, "big")
        p += 9
    p = 0
    for _ in range(frac0):
        out += int(fracpart[p : p + 9]).to_bytes(4, "big")
        p += 9
    if frac_rem:
        out += int(fracpart[p : p + frac_rem]).to_bytes(_DIG2BYTES[frac_rem], "big")
    if neg:
        for i in range(len(out)):
            out[i] = ~out[i] & 0xFF
    out[0] ^= 0x80
    return bytes(out)


def _enc_jsonb(obj) -> bytes:
    """Python value → MySQL binary JSON (small-container form)."""
    t, data = _enc_jsonb_val(obj)
    return bytes([t]) + data


def _enc_jsonb_val(obj) -> tuple[int, bytes]:
    if obj is None:
        return 0x04, b"\x00"
    if obj is True:
        return 0x04, b"\x01"
    if obj is False:
        return 0x04, b"\x02"
    if isinstance(obj, int):
        if -(2**15) <= obj < 2**15:
            return 0x05, obj.to_bytes(2, "little", signed=True)
        if -(2**31) <= obj < 2**31:
            return 0x07, obj.to_bytes(4, "little", signed=True)
        return 0x09, obj.to_bytes(8, "little", signed=True)
    if isinstance(obj, float):
        return 0x0B, struct.pack("<d", obj)
    if isinstance(obj, str):
        b = obj.encode()
        assert len(b) < 128  # single varlen byte is enough for fixtures
        return 0x0C, bytes([len(b)]) + b
    if isinstance(obj, dict):
        items = list(obj.items())
        n = len(items)
        keys = [k.encode() for k, _ in items]
        vals = [_enc_jsonb_val(v) for _, v in items]
        header = 4 + 4 * n + 3 * n
        key_off = header
        key_entries = b""
        for k in keys:
            key_entries += struct.pack("<HH", key_off, len(k))
            key_off += len(k)
        val_entries, tail, val_off = b"", b"", key_off
        for t, data in vals:
            if t in (0x04, 0x05, 0x06):  # inlined
                val_entries += bytes([t]) + data.ljust(2, b"\x00")
            else:
                val_entries += bytes([t]) + struct.pack("<H", val_off)
                tail += data
                val_off += len(data)
        body = key_entries + val_entries + b"".join(keys) + tail
        return 0x00, struct.pack("<HH", n, 4 + len(body)) + body
    if isinstance(obj, list):
        n = len(obj)
        vals = [_enc_jsonb_val(v) for v in obj]
        val_entries, tail, val_off = b"", b"", 4 + 3 * n
        for t, data in vals:
            if t in (0x04, 0x05, 0x06):
                val_entries += bytes([t]) + data.ljust(2, b"\x00")
            else:
                val_entries += bytes([t]) + struct.pack("<H", val_off)
                tail += data
                val_off += len(data)
        body = val_entries + tail
        return 0x02, struct.pack("<HH", n, 4 + len(body)) + body
    raise ValueError(f"unsupported json fixture value {obj!r}")


class BinlogWriter:
    """Minimal binlog-v4 writer (CRC32 checksums on)."""

    def __init__(self) -> None:
        self.buf = bytearray(b"\xfebin")
        self._fde()

    def _event(self, type_code: int, body: bytes, checksum: bool = True) -> None:
        ev_len = 19 + len(body) + (4 if checksum else 0)
        header = struct.pack(
            "<IBIIIH", 0, type_code, SERVER_ID, ev_len, len(self.buf) + ev_len, 0
        )
        ev = header + body
        if checksum:
            ev += struct.pack("<I", zlib.crc32(ev))
        self.buf += ev

    def _fde(self) -> None:
        body = (
            struct.pack("<H", 4)
            + b"8.4.0".ljust(50, b"\x00")
            + struct.pack("<IB", 0, 19)
            + bytes(40)
            + b"\x01"  # checksum_alg = CRC32
        )
        self._event(0x0F, body)

    def rotate(self, next_name: str, pos: int = 4) -> None:
        """ROTATE event (0x04): 8-byte next-position + next file name —
        what mysqld appends before switching to the next index file
        (S3: index rotation). Carries no row data; the reader skips it
        (binlog_binary.py ROTATE_EVENT branch)."""
        self._event(0x04, struct.pack("<Q", pos) + next_name.encode())

    def query(self, db: str, sql: str) -> None:
        d, q = db.encode(), sql.encode()
        body = struct.pack("<IIBHH", 1, 0, len(d), 0, 0) + d + b"\x00" + q
        self._event(0x02, body)

    def table_map(
        self, table_id: int, db: str, table: str, types: list[int], metas: list[int]
    ) -> None:
        d, t = db.encode(), table.encode()
        meta = b""
        for ty, m in zip(types, metas):
            if ty == T_VARCHAR:
                meta += struct.pack("<H", m)  # max length, little-endian
            elif ty == T_STRING:
                # byte pair: (real type, length) — real MySQL layout,
                # verified against cdc-mysql/test_files/binlog.000003.
                # Pass m > 255 to carry an explicit real type in the high
                # byte (e.g. (0xF7 << 8) | 1 for ENUM-as-STRING).
                if m > 255:
                    meta += bytes([m >> 8, m & 0xFF])
                else:
                    meta += bytes([T_STRING, m])
            elif ty == T_NEWDECIMAL:
                meta += bytes([m >> 8, m & 0xFF])  # (precision, scale)
            elif ty in (T_JSON, T_TIMESTAMP2, T_DATETIME2, T_TIME2, T_GEOMETRY):
                meta += bytes([m])  # GEOMETRY meta = length-prefix width
        body = (
            table_id.to_bytes(6, "little")
            + struct.pack("<H", 1)
            + bytes([len(d)]) + d + b"\x00"
            + bytes([len(t)]) + t + b"\x00"
            + bytes([len(types)])  # lenenc (< 0xfb)
            + bytes(types)
            + bytes([len(meta)])
            + meta
            + bytes((len(types) + 7) // 8)  # null-allowed bitmap
        )
        self._event(0x13, body)

    @staticmethod
    def _row(values: list) -> bytes:
        """values: str | None (NULL) | tagged tuple:
        ('date',y,m,d) ('year',yyyy) ('time2',h,mi,s,us,fsp) — h < 0
        encodes a negative time — ('dt2',y,mo,d,h,mi,s,us,fsp)
        ('ts2',epoch,us,fsp) ('dec',text,precision,scale)
        ('enum',idx,nbytes) ('set',bitmask,nbytes) ('json',obj)."""
        nullmap = 0
        payload = b""
        for i, v in enumerate(values):
            if v is None:
                nullmap |= 1 << i
            elif isinstance(v, tuple):
                tag = v[0]
                if tag == "int4":
                    payload += v[1].to_bytes(4, "little", signed=True)
                elif tag == "date":
                    _, y, m, d = v
                    payload += ((y << 9) | (m << 5) | d).to_bytes(3, "little")
                elif tag == "year":
                    payload += bytes([v[1] - 1900])
                elif tag == "time2":
                    # Negative times (h < 0): MySQL stores the WHOLE
                    # (3+fsp)-byte value in offset binary — the
                    # fractional bytes participate in the borrow, so the
                    # combined magnitude is subtracted from the offset
                    # as one integer (pins the reader's combined-negate
                    # decode; my_time.c TIME_from_longlong_time_packed).
                    _, h, mi, s, us, fsp = v
                    neg, h = h < 0, abs(h)
                    nb = _FSP_BYTES[fsp]
                    frac_bits = 8 * nb
                    frac = us // 10 ** (6 - 2 * nb) if nb else 0
                    mag = (((h << 12) | (mi << 6) | s) << frac_bits) | frac
                    offset = 0x800000 << frac_bits
                    packed = offset - mag if neg else offset | mag
                    payload += packed.to_bytes(3 + nb, "big")
                elif tag == "dt2":
                    _, y, mo, d, h, mi, s, us, fsp = v
                    packed = (
                        (1 << 39) | ((y * 13 + mo) << 22) | (d << 17)
                        | (h << 12) | (mi << 6) | s
                    )
                    payload += packed.to_bytes(5, "big") + _enc_fsp(us, fsp)
                elif tag == "ts2":
                    _, epoch, us, fsp = v
                    payload += epoch.to_bytes(4, "big") + _enc_fsp(us, fsp)
                elif tag == "dec":
                    _, text, precision, scale = v
                    payload += _enc_decimal(text, precision, scale)
                elif tag == "enum":
                    payload += v[1].to_bytes(v[2], "little")
                elif tag == "set":
                    payload += v[1].to_bytes(v[2], "little")  # bitmask
                elif tag == "json":
                    blob = _enc_jsonb(v[1])
                    payload += struct.pack("<I", len(blob)) + blob
                elif tag == "geom":
                    # length prefix (width = table_map meta, default 4)
                    # + SRID+WKB body; ('geom', bytes[, width]) lets
                    # property tests exercise meta widths 1-4
                    width = v[2] if len(v) > 2 else 4
                    payload += len(v[1]).to_bytes(width, "little") + v[1]
                else:
                    raise ValueError(f"unknown row-value tag {tag!r}")
            else:
                b = str(v).encode()
                payload += bytes([len(b)]) + b
        nbytes = (len(values) + 7) // 8
        return nullmap.to_bytes(nbytes, "little") + payload

    def rows(self, type_code: int, table_id: int, n_cols: int, rows: list) -> None:
        present = bytes([0xFF] * ((n_cols + 7) // 8))
        body = (
            table_id.to_bytes(6, "little")
            + struct.pack("<HH", 1, 2)  # flags, extra_len (just itself)
            + bytes([n_cols])
            + present
        )
        if type_code == 0x1F:  # update: second present bitmap + row pairs
            body += present
            for before, after in rows:
                body += self._row(before) + self._row(after)
        else:
            for r in rows:
                body += self._row(r)
        self._event(type_code, body)


PET_BINLOG_COLUMNS = {
    ("flvdb", "pet"): ["name", "owner", "species", "sex", "birth", "last_vaccine"]
}

TYPED_BINLOG_COLUMNS = {
    ("typedb", "alltypes"): [
        "id", "label", "grade", "born_year", "appt_dt", "appt_time",
        "updated_at", "balance", "tags", "perks", "delta", "loc",
    ]
}

# GEOMETRY fixture value: SRID 0 + WKB POINT(1.5 -2.25), little-endian —
# the exact byte layout MySQL stores (4-byte SRID then standard WKB).
GEOM_POINT_WKB = (
    (0).to_bytes(4, "little")                      # SRID
    + b"\x01" + (1).to_bytes(4, "little")          # LE byte order, type=Point
    + struct.pack("<d", 1.5) + struct.pack("<d", -2.25)
)


def typed_binlog_bytes() -> bytes:
    """One INSERT + one UPDATE over a table exercising every §1.4 value
    type the reference decodes (values.rs:9-45): ENUM, YEAR, DATETIME2,
    TIME2, TIMESTAMP2, NEWDECIMAL, JSON (+ VARCHAR/DATE covered by the
    pet scenario), plus SET (bitmask via T_STRING real-type metadata)
    a NEGATIVE fsp>0 TIME2 (pins the combined offset-binary negate:
    the fractional bytes participate in the borrow), and GEOMETRY
    (length-prefixed SRID+WKB → opaque Blob)."""
    w = BinlogWriter()
    w.query("typedb", "CREATE DATABASE typedb")
    w.query(
        "typedb",
        "CREATE TABLE alltypes (id INT, label VARCHAR(20), "
        "grade ENUM('a','b','c'), born_year YEAR, appt_dt DATETIME(2), "
        "appt_time TIME(2), updated_at TIMESTAMP(2), "
        "balance DECIMAL(12,4), tags JSON, "
        "perks SET('x','y','z'), delta TIME(2), loc GEOMETRY)",
    )
    types = [
        0x03, T_VARCHAR, T_STRING, T_YEAR, T_DATETIME2,
        T_TIME2, T_TIMESTAMP2, T_NEWDECIMAL, T_JSON,
        T_STRING, T_TIME2, T_GEOMETRY,
    ]
    metas = [
        0, 20, (T_ENUM << 8) | 1, 0, 2, 2, 2, (12 << 8) | 4, 4,
        (T_SET << 8) | 1, 2, 4,
    ]
    row1 = [
        ("int4", 7), "widget", ("enum", 2, 1), ("year", 1999),
        ("dt2", 2024, 3, 30, 21, 31, 30, 120000, 2),
        ("time2", 21, 31, 30, 500000, 2),
        ("ts2", 1524885322, 250000, 2),
        ("dec", "-12345.6789", 12, 4),
        ("json", {"a": 2, "b": [True, None, "x"], "c": -1.5}),
        ("set", 0b101, 1),  # {'x','z'} — bits 0 and 2
        ("time2", -10, 30, 30, 250000, 2),  # -10:30:30.25
        ("geom", GEOM_POINT_WKB),  # SRID+WKB carried opaque as Blob
    ]
    row2 = list(row1)
    row2[7] = ("dec", "0.0000", 12, 4)
    w.table_map(200, "typedb", "alltypes", types, metas)
    w.rows(0x1E, 200, 12, [row1])
    w.table_map(200, "typedb", "alltypes", types, metas)
    w.rows(0x1F, 200, 12, [(row1, row2)])
    return bytes(w.buf)


def real_pet_binlog_bytes() -> bytes:
    """The reference's OWN recorded binlog bytes (cdc-mysql/test_files/
    binlog.000003 — 4 KB of binary DATA recorded by a real MySQL server,
    not code), vendored under fixtures/ so the oracle-gated
    cdc_binlog_real_pet query works without a reference checkout
    (r5 advice #2). Falls back to the reference path so a byte-level
    divergence from the upstream fixture can't go unnoticed in envs
    that do have it (test_real_fixture_vendored_identical)."""
    import os

    vendored = os.path.join(os.path.dirname(__file__), "fixtures", "binlog.000003")
    if os.path.isfile(vendored):
        with open(vendored, "rb") as f:
            return f.read()
    with open("/root/reference/cdc-mysql/test_files/binlog.000003", "rb") as f:
        return f.read()


GEO_BINLOG_COLUMNS = {("geodb", "places"): ["id", "name", "loc"]}


def _wkb_point(x: float, y: float, srid: int = 0) -> bytes:
    return (
        srid.to_bytes(4, "little")
        + b"\x01" + (1).to_bytes(4, "little")
        + struct.pack("<dd", x, y)
    )


def _wkb_linestring(pts: list[tuple[float, float]], srid: int = 4326) -> bytes:
    b = (
        srid.to_bytes(4, "little")
        + b"\x01" + (2).to_bytes(4, "little")
        + struct.pack("<I", len(pts))
    )
    for x, y in pts:
        b += struct.pack("<dd", x, y)
    return b


def geo_binlog_bytes() -> bytes:
    """GEOMETRY-focused scenario: a POINT (SRID 0), a LINESTRING
    (SRID 4326, 3 vertices), and a NULL geometry, plus an UPDATE that
    moves the point — pins the opaque SRID+WKB Blob carry for
    multi-row events, nullability, and full-row update matching over a
    binary column."""
    w = BinlogWriter()
    w.query("geodb", "CREATE DATABASE geodb")
    w.query(
        "geodb",
        "CREATE TABLE places (id INT, name VARCHAR(20), loc GEOMETRY)",
    )
    types = [0x03, T_VARCHAR, T_GEOMETRY]
    metas = [0, 20, 4]
    p1 = ("geom", _wkb_point(3.0, 4.5))
    row1 = [("int4", 1), "origin", p1]
    row2 = [("int4", 2), "trail", ("geom", _wkb_linestring([(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]))]
    row3 = [("int4", 3), "nowhere", None]
    w.table_map(300, "geodb", "places", types, metas)
    w.rows(0x1E, 300, 3, [row1, row2, row3])
    # move the point: full-row match on (id, name, 25-byte blob)
    moved = [("int4", 1), "origin", ("geom", _wkb_point(1.5, -2.25))]
    w.table_map(300, "geodb", "places", types, metas)
    w.rows(0x1F, 300, 3, [(row1, moved)])
    return bytes(w.buf)


def pet_binlog_bytes() -> bytes:
    """The nine-event pet scenario as binlog-v4 bytes (CRC32 on)."""
    d = lambda y, m, dd: ("date", y, m, dd)  # noqa: E731
    w = BinlogWriter()
    w.query("flvDb", "CREATE DATABASE flvDb")
    w.query(
        "flvdb",
        "CREATE TABLE pet (name VARCHAR(20), owner VARCHAR(20), "
        "species VARCHAR(20), sex CHAR(1), birth DATE)",
    )
    t5 = [T_VARCHAR, T_VARCHAR, T_VARCHAR, T_STRING, T_DATE]
    m5 = [20, 20, 20, 1, 0]
    w.table_map(100, "flvdb", "pet", t5, m5)
    w.rows(0x1E, 100, 5, [["Puffball", "Diane", "hamster", "f", d(1999, 3, 30)]])
    w.table_map(100, "flvdb", "pet", t5, m5)
    w.rows(0x1E, 100, 5, [["Jack", "Peter", "dog", "m", d(1999, 3, 30)]])
    w.table_map(100, "flvdb", "pet", t5, m5)
    w.rows(
        0x1F, 100, 5,
        [(
            ["Jack", "Peter", "dog", "m", d(1999, 3, 30)],
            ["Jack", "Peter", "dog", "m", d(1989, 8, 31)],
        )],
    )
    w.query("flvdb", "ALTER TABLE pet ADD COLUMN last_vaccine DATE")
    t6, m6 = t5 + [T_DATE], m5 + [0]
    w.table_map(101, "flvdb", "pet", t6, m6)
    w.rows(0x20, 101, 6, [["Puffball", "Diane", "hamster", "f", d(1999, 3, 30), None]])
    w.table_map(101, "flvdb", "pet", t6, m6)
    w.rows(0x1E, 101, 6, [["Spot", "Jane", "dog", "m", d(2010, 11, 2), None]])
    w.table_map(101, "flvdb", "pet", t6, m6)
    w.rows(
        0x1F, 101, 6,
        [(
            ["Spot", "Jane", "dog", "m", d(2010, 11, 2), None],
            ["Spot", "Jane", "dog", "m", d(2010, 11, 2), d(2020, 6, 10)],
        )],
    )
    return bytes(w.buf)


def pet_rotated_binlog_files() -> list[tuple[str, bytes]]:
    """The pet scenario SPLIT across an index rotation (S3): file
    binlog.000001 carries the DDL + pre-ALTER row events and ends with
    a ROTATE to binlog.000002; file 2 starts with its own FDE (every
    binlog file does) and RE-EMITS the TABLE_MAP before its row events
    (as mysqld does after rotation), then the ALTER + post-ALTER tail.
    Total replay order = files by name, then offset — concatenating
    the per-file parses equals the single-file pet_binlog_bytes parse
    modulo fileName/offset fields (pinned by test)."""
    d = lambda y, m, dd: ("date", y, m, dd)  # noqa: E731
    t5 = [T_VARCHAR, T_VARCHAR, T_VARCHAR, T_STRING, T_DATE]
    m5 = [20, 20, 20, 1, 0]
    w1 = BinlogWriter()
    w1.query("flvDb", "CREATE DATABASE flvDb")
    w1.query(
        "flvdb",
        "CREATE TABLE pet (name VARCHAR(20), owner VARCHAR(20), "
        "species VARCHAR(20), sex CHAR(1), birth DATE)",
    )
    w1.table_map(100, "flvdb", "pet", t5, m5)
    w1.rows(0x1E, 100, 5, [["Puffball", "Diane", "hamster", "f", d(1999, 3, 30)]])
    w1.table_map(100, "flvdb", "pet", t5, m5)
    w1.rows(0x1E, 100, 5, [["Jack", "Peter", "dog", "m", d(1999, 3, 30)]])
    w1.table_map(100, "flvdb", "pet", t5, m5)
    w1.rows(
        0x1F, 100, 5,
        [(
            ["Jack", "Peter", "dog", "m", d(1999, 3, 30)],
            ["Jack", "Peter", "dog", "m", d(1989, 8, 31)],
        )],
    )
    w1.rotate("binlog.000002")

    w2 = BinlogWriter()
    w2.query("flvdb", "ALTER TABLE pet ADD COLUMN last_vaccine DATE")
    t6, m6 = t5 + [T_DATE], m5 + [0]
    w2.table_map(101, "flvdb", "pet", t6, m6)
    w2.rows(0x20, 101, 6, [["Puffball", "Diane", "hamster", "f", d(1999, 3, 30), None]])
    w2.table_map(101, "flvdb", "pet", t6, m6)
    w2.rows(0x1E, 101, 6, [["Spot", "Jane", "dog", "m", d(2010, 11, 2), None]])
    w2.table_map(101, "flvdb", "pet", t6, m6)
    w2.rows(
        0x1F, 101, 6,
        [(
            ["Spot", "Jane", "dog", "m", d(2010, 11, 2), None],
            ["Spot", "Jane", "dog", "m", d(2010, 11, 2), d(2020, 6, 10)],
        )],
    )
    return [("binlog.000001", bytes(w1.buf)), ("binlog.000002", bytes(w2.buf))]
