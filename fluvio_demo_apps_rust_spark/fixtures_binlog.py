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

import struct
import zlib

SERVER_ID = 1
T_VARCHAR, T_STRING, T_DATE = 0x0F, 0xFE, 0x0A


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
            if ty in (T_VARCHAR, T_STRING):
                meta += struct.pack("<H", m)
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
        """values: str | ('date', y, m, d) | None (NULL)."""
        nullmap = 0
        payload = b""
        for i, v in enumerate(values):
            if v is None:
                nullmap |= 1 << i
            elif isinstance(v, tuple) and v[0] == "date":
                _, y, m, d = v
                payload += ((y << 9) | (m << 5) | d).to_bytes(3, "little")
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
