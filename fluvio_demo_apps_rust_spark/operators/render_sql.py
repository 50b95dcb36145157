"""SQL-statement rendering sink (K2/K3/K4 textual kernels).

Produces byte-identical statements to the reference consumer's
generators — INSERT (build_add_queries, mysql_manager.rs:208-229),
UPDATE with changed-columns-only SET and full-row WHERE with ``is
NULL`` (build_update_queries, :232-267), DELETE with full-row WHERE
(build_delete_queries, :270-292) — golden-tested against the expected
strings in the reference's own test suite. Inputs are wire-format
Value objects (decoded JSON); rendering is pure and runs wherever the
sink needs it (driver for DDL, per-partition in foreachPartition for a
JDBC-style sink).
"""

from __future__ import annotations

from typing import Any

from ..schemas import render_value_display


class RenderError(Exception):
    pass


def _check_cols(columns: list[str], row: list[Any]) -> None:
    """K6 guard (mysql_manager.rs:302-335): header must cover values."""
    if not columns:
        raise RenderError("columns are missing")
    if len(columns) < len(row):
        raise RenderError(f"column header {len(columns)} < row values {len(row)}")


def _where(columns: list[str], row: list[Any]) -> str:
    parts = []
    for c, v in zip(columns, row):
        if v == "Null" or v is None:
            parts.append(f"{c} is NULL")
        else:
            parts.append(f"{c}={render_value_display(v)}")
    return " AND ".join(parts)


def build_add_queries(table: str, columns: list[str], rows: list[list[Any]]) -> list[str]:
    out = []
    for row in rows:
        _check_cols(columns, row)
        vals = ", ".join(render_value_display(v) for v in row)
        out.append(f"INSERT INTO {table} ({', '.join(columns)}) VALUES ({vals})")
    return out


def build_update_queries(
    table: str, columns: list[str], pairs: list[tuple[list[Any], list[Any]]]
) -> list[str]:
    out = []
    for before, after in pairs:
        _check_cols(columns, before)
        _check_cols(columns, after)
        changed = [
            f"{c}={render_value_display(a)}"
            for c, b, a in zip(columns, before, after)
            if b != a
        ]
        out.append(f"UPDATE {table} SET {', '.join(changed)} WHERE {_where(columns, before)}")
    return out


def build_delete_queries(table: str, columns: list[str], rows: list[list[Any]]) -> list[str]:
    out = []
    for row in rows:
        _check_cols(columns, row)
        out.append(f"DELETE FROM {table} WHERE {_where(columns, row)}")
    return out
