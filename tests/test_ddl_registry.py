"""DDL parser + schema registry state machine (reference
query_parser.rs / local_store.rs semantics)."""

from __future__ import annotations

import pytest

from fluvio_demo_apps_rust_spark import ddl as D
from fluvio_demo_apps_rust_spark.registry import RegistryError, SchemaRegistry


def test_create_table():
    ops = D.parse_query(
        "CREATE TABLE pet (name VARCHAR(20), owner VARCHAR(20), species VARCHAR(20), "
        "sex CHAR(1), birth DATE)"
    )
    assert len(ops) == 1
    op = ops[0]
    assert isinstance(op, D.CreateTable) and op.table == "pet"
    assert [c for c, _ in op.columns] == ["name", "owner", "species", "sex", "birth"]
    assert op.columns[0][1] == "VARCHAR(20)"


def test_create_table_skips_constraints_and_decimal_commas():
    ops = D.parse_query(
        "CREATE TABLE t (a DECIMAL(10,2), b INT, PRIMARY KEY (a), KEY idx (b))"
    )
    assert [c for c, _ in ops[0].columns] == ["a", "b"]
    assert ops[0].columns[0][1] == "DECIMAL(10,2)"


def test_alter_variants():
    assert D.parse_query("ALTER TABLE pet ADD COLUMN last_vaccine DATE") == [
        D.AddColumn("pet", "last_vaccine", "DATE")
    ]
    assert D.parse_query("ALTER TABLE pet ADD nick VARCHAR(10)") == [
        D.AddColumn("pet", "nick", "VARCHAR(10)")
    ]
    assert D.parse_query("ALTER TABLE pet RENAME COLUMN owner TO keeper") == [
        D.RenameColumn("pet", "owner", "keeper")
    ]
    assert D.parse_query("ALTER TABLE pet CHANGE owner keeper VARCHAR(30)") == [
        D.RenameColumn("pet", "owner", "keeper", "VARCHAR(30)")
    ]
    assert D.parse_query("ALTER TABLE pet DROP COLUMN sex") == [D.DropColumn("pet", "sex")]
    # MODIFY: type change with the name unchanged = self-rename + type
    assert D.parse_query("ALTER TABLE pet MODIFY COLUMN owner VARCHAR(50)") == [
        D.RenameColumn("pet", "owner", "owner", "VARCHAR(50)")
    ]
    assert D.parse_query("ALTER TABLE pet MODIFY owner TEXT NOT NULL") == [
        D.RenameColumn("pet", "owner", "owner", "TEXT NOT NULL")
    ]


def test_alter_multi_clause():
    # multi-action ALTER splits on top-level commas; parenthesized type
    # args (DECIMAL(10,2)) must survive the split AND the clause regex
    assert D.parse_query(
        "ALTER TABLE t ADD a INT, ADD b DECIMAL(10,2), DROP COLUMN c, "
        "RENAME COLUMN d TO e, CHANGE f g VARCHAR(5)"
    ) == [
        D.AddColumn("t", "a", "INT"),
        D.AddColumn("t", "b", "DECIMAL(10,2)"),
        D.DropColumn("t", "c"),
        D.RenameColumn("t", "d", "e"),
        D.RenameColumn("t", "f", "g", "VARCHAR(5)"),
    ]


def test_drop_table_multi():
    assert D.parse_query("DROP TABLE a, `b`") == [D.DropTable(["a", "b"])]
    assert D.parse_query("DROP TABLE IF EXISTS db1.c") == [D.DropTable(["c"])]


def test_database_ddl_bypasses_registry():
    assert D.parse_query("CREATE DATABASE flvDb") == []
    assert D.parse_query("DROP DATABASE flvDb") == []


def test_dml_ignored_and_unsupported_raises_in_strict():
    assert D.parse_query("BEGIN") == []
    assert D.parse_query("INSERT INTO t VALUES (1)") == []
    # TRUNCATE is a data op the registry ignores (reference sqlparser
    # falls through its match arms) — benign even in strict mode
    assert D.parse_query("TRUNCATE TABLE t") == []
    assert D.parse_query("TRUNCATE TABLE t", strict=True) == []
    with pytest.raises(ValueError):
        D.parse_query("CREATE INDEX idx ON t(a)", strict=True)


def test_exotic_but_legal_ddl():
    # quoted identifiers containing commas/spaces survive the tokenizer
    ops = D.parse_query("CREATE TABLE `weird, name` (`col, a` INT, `col b` TEXT)")
    assert ops == [D.CreateTable("weird, name", [("col, a", "INT"), ("col b", "TEXT")])]
    # string literals with commas/parens/escapes don't break clause splits
    ops = D.parse_query(
        "CREATE TABLE t (a ENUM('x,y','z(1)') DEFAULT 'a''b', b INT COMMENT 'c, (d)')"
    )
    assert [c for c, _ in ops[0].columns] == ["a", "b"]
    assert "ENUM('x,y','z(1)')" in ops[0].columns[0][1]
    # table options after the column list are ignored
    ops = D.parse_query(
        "CREATE TABLE t (a INT) ENGINE=InnoDB AUTO_INCREMENT=7 "
        "DEFAULT CHARSET=utf8mb4 COMMENT='opts (x), y'"
    )
    assert ops == [D.CreateTable("t", [("a", "INT")])]
    # comments are stripped anywhere
    ops = D.parse_query(
        "CREATE TABLE t ( -- trailing\n a INT, /* block, with comma */ b TEXT)"
    )
    assert [c for c, _ in ops[0].columns] == ["a", "b"]
    # multi-column ADD and position specifiers
    assert D.parse_query("ALTER TABLE t ADD COLUMN (a INT, b DECIMAL(10,2))") == [
        D.AddColumn("t", "a", "INT"),
        D.AddColumn("t", "b", "DECIMAL(10,2)"),
    ]
    assert D.parse_query("ALTER TABLE t ADD a INT AFTER z, ADD b INT FIRST") == [
        D.AddColumn("t", "a", "INT"),
        D.AddColumn("t", "b", "INT"),
    ]
    # index/constraint/option ALTER clauses are benign, even in strict mode
    assert D.parse_query(
        "ALTER TABLE t ADD PRIMARY KEY (a), DROP INDEX idx, ADD CONSTRAINT fk "
        "FOREIGN KEY (b) REFERENCES o(id), ALGORITHM=INPLACE, LOCK=NONE, "
        "ALTER COLUMN c SET DEFAULT 1, ADD d INT",
        strict=True,
    ) == [D.AddColumn("t", "d", "INT")]
    # IF NOT EXISTS + db-qualified quoted names
    assert D.parse_query("CREATE TABLE IF NOT EXISTS `db`.`t` (a INT)") == [
        D.CreateTable("t", [("a", "INT")])
    ]
    # multi-statement input and DROP ... CASCADE
    assert D.parse_query("DROP TABLE a CASCADE; CREATE TABLE b (x INT);") == [
        D.DropTable(["a"]),
        D.CreateTable("b", [("x", "INT")]),
    ]


def test_regex_fallback_agrees_on_core_shapes():
    for stmt in [
        "CREATE TABLE pet (name VARCHAR(20), birth DATE)",
        "ALTER TABLE pet ADD COLUMN nick VARCHAR(10)",
        "ALTER TABLE pet CHANGE owner keeper VARCHAR(30)",
        "ALTER TABLE pet MODIFY owner TEXT NOT NULL",
        "ALTER TABLE pet DROP COLUMN sex",
        "DROP TABLE a, `b`",
        "CREATE DATABASE flvDb",
        "INSERT INTO t VALUES (1)",
    ]:
        assert D.parse_query(stmt) == D._parse_query_regex(stmt), stmt


def test_registry_state_machine():
    r = SchemaRegistry()
    r.apply_query("flvdb", "CREATE TABLE pet (name VARCHAR(20), birth DATE)")
    assert r.get_columns("flvdb", "pet") == ["name", "birth"]
    r.apply_query("flvdb", "ALTER TABLE pet ADD COLUMN last_vaccine DATE")
    assert r.get_columns("flvdb", "pet") == ["name", "birth", "last_vaccine"]
    r.apply_query("flvdb", "ALTER TABLE pet RENAME COLUMN name TO pet_name")
    assert r.get_columns("flvdb", "pet")[0] == "pet_name"
    r.apply_query("flvdb", "ALTER TABLE pet DROP COLUMN birth")
    assert r.get_columns("flvdb", "pet") == ["pet_name", "last_vaccine"]
    # duplicate create errors (local_store.rs:103-108)
    with pytest.raises(RegistryError):
        r.apply_query("flvdb", "CREATE TABLE pet (x INT)")
    # drop removes table, removing the db when empty (local_store.rs:131-133)
    r.apply_query("flvdb", "DROP TABLE pet")
    assert r.dbs == {}


def test_registry_persistence(tmp_path):
    r = SchemaRegistry()
    r.apply_query("db1", "CREATE TABLE t (a INT, b VARCHAR(5))")
    p = tmp_path / "registry.json"
    r.save(p)
    r2 = SchemaRegistry.load(p)
    assert r2.get_columns("db1", "t") == ["a", "b"]
    schema = r2.get_spark_schema("db1", "t")
    assert [f.dataType.simpleString() for f in schema.fields] == ["int", "string"]


def test_spark_schema_types():
    r = SchemaRegistry()
    r.apply_query(
        "db",
        "CREATE TABLE t (a BIGINT, b DOUBLE, c DATE, d DATETIME, e DECIMAL(10,2), "
        "f BLOB, g JSON, h TIME, i YEAR, j TINYINT)",
    )
    got = [f.dataType.simpleString() for f in r.get_spark_schema("db", "t").fields]
    assert got == [
        "bigint", "double", "date", "timestamp_ntz", "decimal(10,2)",
        "binary", "string", "string", "int", "smallint",
    ]


def test_malformed_ddl_non_strict_skips():
    # truncated CREATE / garbled ALTER: non-strict warns and returns [],
    # strict raises (the reference silently ignores; SURVEY §7.4.8)
    for stmt in ["CREATE TABLE t", "ALTER TABLE t ADD", "CREATE TABLE (a INT)"]:
        assert D.parse_query(stmt) == [], stmt
        with pytest.raises(ValueError):
            D.parse_query(stmt, strict=True)
    # a malformed statement doesn't poison its multi-statement siblings
    assert D.parse_query("CREATE TABLE t; CREATE TABLE u (a INT)") == [
        D.CreateTable("u", [("a", "INT")])
    ]


def test_type_text_preserves_operator_spacing():
    ops = D.parse_query("ALTER TABLE t ADD a INT DEFAULT -1")
    assert ops == [D.AddColumn("t", "a", "INT DEFAULT -1")]
    ops = D.parse_query("CREATE TABLE t (a INT DEFAULT -1, b DECIMAL(10,2))")
    assert ops[0].columns == [("a", "INT DEFAULT -1"), ("b", "DECIMAL(10,2)")]
