"""DDL text → table operations.

Reproduces the behavior of the reference's sqlparser-based DDL frontend
(cdc-mysql/src/producer/binlog_manager/query_parser.rs:59-120, operator
T1): five statement shapes feed the schema registry — CREATE TABLE,
ALTER TABLE ADD/RENAME(CHANGE)/DROP COLUMN, DROP TABLE. Statements
mentioning "database" bypass the (table-scoped) registry, matching
query_parser.rs:63-66 (filter F5). Unlike the reference (which silently
ignores unsupported DDL — query_parser.rs:103,114), unsupported
statements raise in strict mode and warn otherwise (SURVEY §7.4.8).

The frontend is a real tokenizer + recursive-descent parser (matching
the reference's use of a real SQL parser rather than regexes): MySQL
comments, backtick-quoted identifiers (including embedded commas and
escaped backticks), string literals with '' / \\ escapes, parenthesized
type arguments, multi-statement input, table options after the column
list, and constraint/index clauses are all handled at the token level.
A regex grammar (the round-1/2 frontend) is kept as a fallback if the
token parser itself fails unexpectedly.
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


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_WORD = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_$")


@dataclass(frozen=True)
class _Tok:
    kind: str  # "word" | "qident" | "string" | "punct"
    value: str  # normalized: unquoted identifier text / literal body
    raw: str  # original lexeme, used to reproduce type text verbatim


def _tokenize(s: str) -> list[_Tok]:
    """MySQL-flavored lexer: skips whitespace and comments, keeps quoted
    identifiers and string literals as single tokens."""
    toks: list[_Tok] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        # comments: '-- ' (space required by MySQL), '#...', '/* ... */'
        if c == "-" and s.startswith("--", i) and (i + 2 >= n or s[i + 2] in " \t\n"):
            j = s.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "#":
            j = s.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and s.startswith("/*", i):
            j = s.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c == "`":
            # backtick ident; `` escapes a literal backtick
            j, buf = i + 1, []
            while j < n:
                if s[j] == "`":
                    if j + 1 < n and s[j + 1] == "`":
                        buf.append("`")
                        j += 2
                        continue
                    break
                buf.append(s[j])
                j += 1
            toks.append(_Tok("qident", "".join(buf), s[i : j + 1]))
            i = j + 1
            continue
        if c in "'\"":
            q, j, buf = c, i + 1, []
            while j < n:
                if s[j] == "\\" and j + 1 < n:  # backslash escape
                    buf.append(s[j + 1])
                    j += 2
                    continue
                if s[j] == q:
                    if j + 1 < n and s[j + 1] == q:  # '' / "" doubling
                        buf.append(q)
                        j += 2
                        continue
                    break
                buf.append(s[j])
                j += 1
            toks.append(_Tok("string", "".join(buf), s[i : j + 1]))
            i = j + 1
            continue
        if c in _WORD:
            j = i
            while j < n and s[j] in _WORD:
                j += 1
            toks.append(_Tok("word", s[i:j], s[i:j]))
            i = j
            continue
        toks.append(_Tok("punct", c, c))
        i += 1
    return toks


def _render(toks: list[_Tok]) -> str:
    """Reassemble tokens into type text: spaces only between word-like
    neighbors, so DECIMAL(10,2) and ENUM('a','b') come back verbatim
    while TEXT NOT NULL keeps its spaces."""
    out: list[str] = []
    prev: _Tok | None = None
    for t in toks:
        wordlike = t.kind in ("word", "qident", "string")
        # operators keep their leading space ("DEFAULT -1", "a = 1");
        # structural puncts ( ) , . stay tight (DECIMAL(10,2))
        operator = t.kind == "punct" and t.value in "+-*/%<>=!"
        prev_wordlike = prev is not None and prev.kind in ("word", "qident", "string")
        prev_close = prev is not None and prev.kind == "punct" and prev.value == ")"
        if out and (wordlike or operator) and (prev_wordlike or prev_close):
            out.append(" ")
        out.append(t.raw)
        prev = t
    return "".join(out)


def _split_tokens(toks: list[_Tok], sep: str = ",") -> list[list[_Tok]]:
    """Split a token list on top-level `sep` puncts (paren-depth 0)."""
    parts: list[list[_Tok]] = []
    cur: list[_Tok] = []
    depth = 0
    for t in toks:
        if t.kind == "punct":
            if t.value == "(":
                depth += 1
            elif t.value == ")":
                depth -= 1
            elif t.value == sep and depth == 0:
                parts.append(cur)
                cur = []
                continue
        cur.append(t)
    parts.append(cur)
    return [p for p in parts if p]


def _kw(t: _Tok | None, *words: str) -> bool:
    return t is not None and t.kind == "word" and t.value.upper() in words


_CONSTRAINT_KEYWORDS = frozenset(
    ["PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FOREIGN", "CHECK", "FULLTEXT", "SPATIAL"]
)
# ALTER clauses that change storage/index/options but never the column
# set the registry tracks — benign even in strict mode.
_BENIGN_ALTER_KEYWORDS = frozenset(
    ["ALGORITHM", "LOCK", "ENGINE", "AUTO_INCREMENT", "COMMENT", "CONVERT", "DEFAULT",
     "CHARACTER", "CHARSET", "COLLATE", "ORDER", "ENABLE", "DISABLE", "FORCE", "ROW_FORMAT"]
)
_DML_KEYWORDS = frozenset(
    ["BEGIN", "COMMIT", "ROLLBACK", "INSERT", "UPDATE", "DELETE", "SELECT", "SET", "USE",
     "TRUNCATE", "START", "GRANT", "REVOKE", "FLUSH", "LOCK", "UNLOCK", "ANALYZE",
     "OPTIMIZE", "SHOW", "EXPLAIN", "DESCRIBE", "DESC", "CALL", "SAVEPOINT", "RELEASE",
     "REPLACE", "XA"]
)


class _Cursor:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, off: int = 0) -> _Tok | None:
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> _Tok | None:
        t = self.peek()
        self.i += 1
        return t

    def accept_kw(self, *words: str) -> bool:
        if _kw(self.peek(), *words):
            self.i += 1
            return True
        return False

    def rest(self) -> list[_Tok]:
        return self.toks[self.i :]


def _table_name(cur: _Cursor) -> str | None:
    """Parse [db.]name (either part quoted); returns the bare table name."""
    t = cur.next()
    if t is None or t.kind not in ("word", "qident"):
        return None
    name = t.value
    while True:
        p = cur.peek()
        if p is None or p.kind != "punct" or p.value != ".":
            break
        cur.next()
        t = cur.next()
        if t is None or t.kind not in ("word", "qident"):
            return None
        name = t.value
    return name.lower()


def _column_name(cur: _Cursor) -> str | None:
    t = cur.next()
    if t is None or t.kind not in ("word", "qident"):
        return None
    return t.value.lower()


def _strip_position(toks: list[_Tok]) -> list[_Tok]:
    """Drop a trailing FIRST / AFTER <col> position specifier."""
    if len(toks) >= 2 and _kw(toks[-2], "AFTER") and toks[-1].kind in ("word", "qident"):
        return toks[:-2]
    if toks and _kw(toks[-1], "FIRST"):
        return toks[:-1]
    return toks


def _paren_group(cur: _Cursor) -> list[_Tok] | None:
    """Consume a balanced (...) group, returning the inner tokens."""
    t = cur.peek()
    if t is None or t.kind != "punct" or t.value != "(":
        return None
    cur.next()
    depth, inner = 1, []
    while True:
        t = cur.next()
        if t is None:
            return inner  # unterminated; be forgiving
        if t.kind == "punct":
            if t.value == "(":
                depth += 1
            elif t.value == ")":
                depth -= 1
                if depth == 0:
                    return inner
        inner.append(t)


def _parse_column_defs(body: list[_Tok]) -> list[tuple[str, str]]:
    cols: list[tuple[str, str]] = []
    for part in _split_tokens(body):
        first = part[0]
        if _kw(first, *_CONSTRAINT_KEYWORDS):
            continue
        if first.kind not in ("word", "qident"):
            continue
        name = first.value.lower()
        cols.append((name, _render(part[1:])))
    return cols


def _parse_alter_clause(table: str, clause: list[_Tok], strict: bool, ops: list[TableOp]) -> None:
    cur = _Cursor(clause)
    if cur.accept_kw("ADD"):
        if _kw(cur.peek(), *_CONSTRAINT_KEYWORDS):
            return  # ADD PRIMARY KEY / INDEX / CONSTRAINT ... — no column change
        cur.accept_kw("COLUMN")
        # multi-column form: ADD [COLUMN] (a INT, b INT)
        group = _paren_group(cur)
        if group is not None:
            for name, ctype in _parse_column_defs(group):
                ops.append(AddColumn(table, name, ctype))
            return
        name = _column_name(cur)
        if name is None:
            raise ValueError(f"malformed ADD clause: {_render(clause)!r}")
        ops.append(AddColumn(table, name, _render(_strip_position(cur.rest()))))
        return
    if cur.accept_kw("DROP"):
        if _kw(cur.peek(), *_CONSTRAINT_KEYWORDS):
            return  # DROP PRIMARY KEY / INDEX / FOREIGN KEY ...
        cur.accept_kw("COLUMN")
        name = _column_name(cur)
        if name is None:
            raise ValueError(f"malformed DROP clause: {_render(clause)!r}")
        ops.append(DropColumn(table, name))
        return
    if cur.accept_kw("RENAME"):
        if cur.accept_kw("COLUMN"):
            old = _column_name(cur)
            if not cur.accept_kw("TO") or old is None:
                raise ValueError(f"malformed RENAME COLUMN clause: {_render(clause)!r}")
            new = _column_name(cur)
            if new is None:
                raise ValueError(f"malformed RENAME COLUMN clause: {_render(clause)!r}")
            ops.append(RenameColumn(table, old, new))
            return
        if _kw(cur.peek(), "INDEX", "KEY"):
            return  # RENAME INDEX — registry doesn't track indexes
        # RENAME [TO|AS] new_table: table rename isn't a registry op
        msg = f"unsupported ALTER clause: {_render(clause)!r}"
        if strict:
            raise ValueError(msg)
        log.warning(msg)
        return
    if cur.accept_kw("CHANGE"):
        cur.accept_kw("COLUMN")
        old, new = _column_name(cur), _column_name(cur)
        if old is None or new is None:
            raise ValueError(f"malformed CHANGE clause: {_render(clause)!r}")
        ops.append(RenameColumn(table, old, new, _render(_strip_position(cur.rest()))))
        return
    if cur.accept_kw("MODIFY"):
        cur.accept_kw("COLUMN")
        name = _column_name(cur)
        if name is None:
            raise ValueError(f"malformed MODIFY clause: {_render(clause)!r}")
        # MODIFY = type change, name unchanged: a self-rename carrying
        # the new type (registry updates the type slot).
        ops.append(RenameColumn(table, name, name, _render(_strip_position(cur.rest()))))
        return
    if _kw(cur.peek(), "ALTER"):
        return  # ALTER COLUMN c SET/DROP DEFAULT — column set unchanged
    if _kw(cur.peek(), *_BENIGN_ALTER_KEYWORDS):
        return  # storage/option clauses, no schema change
    msg = f"unsupported ALTER clause: {_render(clause)!r}"
    if strict:
        raise ValueError(msg)
    log.warning(msg)


def _parse_statement(toks: list[_Tok], strict: bool) -> list[TableOp]:
    # Registry is table-scoped: database-level DDL bypasses it (F5).
    # The reference matches on the word "database" anywhere in the
    # statement (query_parser.rs:63-66); we match whole tokens.
    if any(t.kind == "word" and t.value.upper() in ("DATABASE", "SCHEMA") for t in toks):
        return []
    cur = _Cursor(toks)
    head = cur.peek()
    if head is None:
        return []
    if _kw(head, *_DML_KEYWORDS):
        return []  # data/session ops the registry ignores
    if cur.accept_kw("CREATE"):
        cur.accept_kw("TEMPORARY")
        if not cur.accept_kw("TABLE"):
            msg = f"unsupported DDL statement: {_render(toks)[:120]!r}"
            if strict:
                raise ValueError(msg)
            log.warning(msg)
            return []
        if _kw(cur.peek(), "IF"):
            cur.next()
            cur.accept_kw("NOT")
            cur.accept_kw("EXISTS")
        table = _table_name(cur)
        body = _paren_group(cur)
        if table is None or body is None:
            raise ValueError(f"malformed CREATE TABLE: {_render(toks)[:120]!r}")
        # anything after the column list is table options — ignored
        return [CreateTable(table=table, columns=_parse_column_defs(body))]
    if cur.accept_kw("ALTER"):
        if not cur.accept_kw("TABLE"):
            msg = f"unsupported DDL statement: {_render(toks)[:120]!r}"
            if strict:
                raise ValueError(msg)
            log.warning(msg)
            return []
        table = _table_name(cur)
        if table is None:
            raise ValueError(f"malformed ALTER TABLE: {_render(toks)[:120]!r}")
        ops: list[TableOp] = []
        for clause in _split_tokens(cur.rest()):
            _parse_alter_clause(table, clause, strict, ops)
        return ops
    if cur.accept_kw("DROP"):
        cur.accept_kw("TEMPORARY")
        if not cur.accept_kw("TABLE"):
            msg = f"unsupported DDL statement: {_render(toks)[:120]!r}"
            if strict:
                raise ValueError(msg)
            log.warning(msg)
            return []
        if _kw(cur.peek(), "IF"):
            cur.next()
            cur.accept_kw("EXISTS")
        tables: list[str] = []
        for part in _split_tokens(cur.rest()):
            # drop trailing RESTRICT/CASCADE
            if len(part) == 1 and _kw(part[0], "RESTRICT", "CASCADE"):
                continue
            sub = _Cursor(part)
            name = _table_name(sub)
            if name:
                tables.append(name)
        return [DropTable(tables=tables)]
    msg = f"unsupported DDL statement: {_render(toks)[:120]!r}"
    if strict:
        raise ValueError(msg)
    log.warning(msg)
    return []


def parse_query(query: str | None, strict: bool = False) -> list[TableOp]:
    """Parse DDL into registry operations (possibly empty). Accepts
    multiple ';'-separated statements."""
    if not query:
        return []
    try:
        toks = _tokenize(query)
        ops: list[TableOp] = []
        for stmt in _split_tokens(toks, sep=";"):
            try:
                ops.extend(_parse_statement(stmt, strict))
            except ValueError:
                # Strict mode surfaces the malformed statement; the
                # default mirrors the reference's ignore-and-continue
                # posture (query_parser.rs:103,114) with a warning.
                if strict:
                    raise
                log.warning("skipping malformed DDL statement: %r", _render(stmt)[:120])
        return ops
    except ValueError:
        raise
    except Exception:  # pragma: no cover — lexer/parser invariant broke
        log.exception("token DDL parser failed; falling back to regex grammar")
        return _parse_query_regex(query, strict)


# ---------------------------------------------------------------------------
# Regex fallback (the round-1/2 frontend, kept verbatim as a safety net)
# ---------------------------------------------------------------------------

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


def _parse_query_regex(query: str | None, strict: bool = False) -> list[TableOp]:
    """Regex-grammar frontend (legacy): same TableOp output on the
    non-exotic statement shapes."""
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
