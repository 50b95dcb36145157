"""Property tests for the tokenizer DDL frontend: generated statements
must parse into well-formed TableOps (or raise cleanly in strict mode),
and the token parser must agree with the legacy regex grammar on the
regex-expressible subset."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fluvio_demo_apps_rust_spark import ddl as D

ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.upper() not in ("DATABASE", "SCHEMA")
)
weird_ident = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), whitelist_characters=" ,._-"),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip() == s and "`" not in s and s.upper() not in ("DATABASE", "SCHEMA"))
mysql_type = st.sampled_from(
    ["INT", "BIGINT", "VARCHAR(20)", "DECIMAL(10,2)", "TEXT NOT NULL",
     "ENUM('a,b','c(d)')", "DOUBLE", "DATE", "CHAR(1) DEFAULT 'x,y'"]
)


def q(name: str) -> str:
    return f"`{name}`" if not name.isidentifier() else name


@settings(max_examples=60, deadline=None)
@given(
    table=weird_ident,
    cols=st.lists(st.tuples(weird_ident, mysql_type), min_size=1, max_size=5, unique_by=lambda t: t[0].lower()),
)
def test_create_roundtrip(table, cols):
    body = ", ".join(f"`{c}` {t}" for c, t in cols)
    ops = D.parse_query(f"CREATE TABLE `{table}` ({body})", strict=True)
    assert len(ops) == 1
    op = ops[0]
    assert isinstance(op, D.CreateTable)
    assert op.table == table.lower()
    assert [c for c, _ in op.columns] == [c.lower() for c, _ in cols]
    # parenthesized/quoted commas in the types survived the split
    for (_, got), (_, want) in zip(op.columns, cols):
        assert got.replace(" ", "") == want.replace(" ", "")


@settings(max_examples=60, deadline=None)
@given(
    table=ident,
    actions=st.lists(
        st.one_of(
            st.tuples(st.just("ADD"), ident, mysql_type),
            st.tuples(st.just("DROP"), ident, st.none()),
            st.tuples(st.just("MODIFY"), ident, mysql_type),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_alter_multi_clause_roundtrip(table, actions):
    clauses = []
    for kind, col, typ in actions:
        if kind == "ADD":
            clauses.append(f"ADD COLUMN {col} {typ}")
        elif kind == "DROP":
            clauses.append(f"DROP COLUMN {col}")
        else:
            clauses.append(f"MODIFY {col} {typ}")
    ops = D.parse_query(f"ALTER TABLE {table} " + ", ".join(clauses), strict=True)
    assert len(ops) == len(actions)
    for op, (kind, col, typ) in zip(ops, actions):
        if kind == "ADD":
            assert op == D.AddColumn(table.lower(), col.lower(), typ)
        elif kind == "DROP":
            assert op == D.DropColumn(table.lower(), col.lower())
        else:
            assert op == D.RenameColumn(table.lower(), col.lower(), col.lower(), typ)


@settings(max_examples=40, deadline=None)
@given(
    table=ident,
    cols=st.lists(st.tuples(ident, st.sampled_from(["INT", "VARCHAR(20)", "DECIMAL(10,2)"])),
                  min_size=1, max_size=4, unique_by=lambda t: t[0].lower()),
)
def test_token_parser_agrees_with_regex_grammar(table, cols):
    body = ", ".join(f"{c} {t}" for c, t in cols)
    for stmt in (
        f"CREATE TABLE {table} ({body})",
        f"ALTER TABLE {table} ADD COLUMN {cols[0][0]} {cols[0][1]}",
        f"DROP TABLE {table}",
    ):
        assert D.parse_query(stmt) == D._parse_query_regex(stmt), stmt


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=120))
def test_parser_never_crashes_non_strict(junk):
    # arbitrary input: non-strict mode must return a (possibly empty)
    # list, never raise
    ops = D.parse_query(junk, strict=False)
    assert isinstance(ops, list)
