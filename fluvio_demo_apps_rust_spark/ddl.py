"""DDL text → table operations.

Reproduces the behavior of the reference's sqlparser-based DDL frontend
(cdc-mysql/src/producer/binlog_manager/query_parser.rs:59-120, operator
T1): five statement shapes feed the schema registry — CREATE TABLE,
ALTER TABLE ADD/RENAME(CHANGE)/DROP COLUMN, DROP TABLE. Statements
mentioning "database" bypass the (table-scoped) registry, matching
query_parser.rs:63-66 (filter F5). Unlike the reference (which silently
ignores unsupported DDL — query_parser.rs:103,114), unsupported
statements raise in strict mode and warn otherwise (SURVEY §7.4.8).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field

log = logging.getLogger(__name__)


@dataclass
class CreateTable:
    table: str
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, mysql_type)


@dataclass
class AddColumn:
    table: str
    column: str
    mysql_type: str | None = None


@dataclass
class RenameColumn:
    table: str
    old: str
    new: str
    mysql_type: str | None = None


@dataclass
class DropColumn:
    table: str
    column: str


@dataclass
class DropTable:
    tables: list[str]


TableOp = CreateTable | AddColumn | RenameColumn | DropColumn | DropTable

_IDENT = r"`?(?:\w+`?\.`?)?(\w+)`?"  # optionally db-qualified, backticked
_CREATE_RE = re.compile(rf"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s*\((.*)\)\s*[^)]*$", re.I | re.S)
_ALTER_RE = re.compile(rf"^\s*ALTER\s+TABLE\s+{_IDENT}\s+(.*)$", re.I | re.S)
_DROP_RE = re.compile(r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(.*)$", re.I | re.S)
# Clauses are already split on TOP-LEVEL commas, so the type may
# contain parenthesized commas (DECIMAL(10,2), ENUM('a','b')).
_ADD_COL_RE = re.compile(r"^ADD\s+(?:COLUMN\s+)?`?(\w+)`?\s+(.+?)\s*$", re.I | re.S)
_RENAME_COL_RE = re.compile(r"^RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*$", re.I)
_CHANGE_COL_RE = re.compile(r"^CHANGE\s+(?:COLUMN\s+)?`?(\w+)`?\s+`?(\w+)`?\s+(.+?)\s*$", re.I | re.S)
_MODIFY_COL_RE = re.compile(r"^MODIFY\s+(?:COLUMN\s+)?`?(\w+)`?\s+(.+?)\s*$", re.I | re.S)
_DROP_COL_RE = re.compile(r"^DROP\s+(?:COLUMN\s+)?`?(\w+)`?\s*$", re.I)

_CONSTRAINT_PREFIXES = (
    "primary", "unique", "key", "index", "constraint", "foreign", "check", "fulltext", "spatial",
)


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren depth 0 (column defs may contain
    parenthesized type args like DECIMAL(10,2))."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_query(query: str | None, strict: bool = False) -> list[TableOp]:
    """Parse a DDL statement into registry operations (possibly empty)."""
    if not query:
        return []
    q = query.strip().rstrip(";").strip()
    if not q:
        return []
    lowered = q.lower()
    # Registry is table-scoped: database-level DDL bypasses it (F5).
    if "database" in lowered:
        return []
    if lowered.startswith("begin"):
        return []

    m = _CREATE_RE.match(q)
    if m:
        table, body = m.group(1).lower(), m.group(2)
        cols: list[tuple[str, str]] = []
        for part in _split_top_level(body):
            first = part.split(None, 1)[0].strip("`").lower()
            if first in _CONSTRAINT_PREFIXES:
                continue
            pieces = part.split(None, 1)
            name = pieces[0].strip("`")
            ctype = pieces[1].strip() if len(pieces) > 1 else ""
            cols.append((name.lower(), ctype))
        return [CreateTable(table=table, columns=cols)]

    m = _ALTER_RE.match(q)
    if m:
        table, rest = m.group(1).lower(), m.group(2).strip()
        ops: list[TableOp] = []
        for clause in _split_top_level(rest):
            if (mm := _ADD_COL_RE.match(clause)):
                ops.append(AddColumn(table, mm.group(1).lower(), mm.group(2).strip()))
            elif (mm := _RENAME_COL_RE.match(clause)):
                ops.append(RenameColumn(table, mm.group(1).lower(), mm.group(2).lower()))
            elif (mm := _CHANGE_COL_RE.match(clause)):
                ops.append(
                    RenameColumn(table, mm.group(1).lower(), mm.group(2).lower(), mm.group(3).strip())
                )
            elif (mm := _MODIFY_COL_RE.match(clause)):
                # MODIFY = type change, name unchanged: a self-rename
                # carrying the new type (registry updates the type slot).
                name = mm.group(1).lower()
                ops.append(RenameColumn(table, name, name, mm.group(2).strip()))
            elif (mm := _DROP_COL_RE.match(clause)):
                ops.append(DropColumn(table, mm.group(1).lower()))
            else:
                msg = f"unsupported ALTER clause: {clause!r}"
                if strict:
                    raise ValueError(msg)
                log.warning(msg)
        return ops

    m = _DROP_RE.match(q)
    if m:
        tables = [t.strip().strip("`").split(".")[-1].lower() for t in m.group(1).split(",")]
        return [DropTable(tables=[t for t in tables if t])]

    # "truncate" is a data op the registry ignores, like the reference's
    # sqlparser path (Statement::Truncate falls through the match arms).
    if any(lowered.startswith(p) for p in ("insert", "update", "delete", "select", "set", "use", "commit", "truncate")):
        return []
    msg = f"unsupported DDL statement: {q[:120]!r}"
    if strict:
        raise ValueError(msg)
    log.warning(msg)
    return []
