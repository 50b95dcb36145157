"""DDL-driven schema registry (keyed state, operator T2).

Reference semantics (cdc-mysql/src/producer/binlog_manager/
local_store.rs:14-206): an ordered db → table → column-list map,
mutated by replaying DDL, persisted as JSON after every update, and
serving positional column lookups so each row event can be enriched
with its then-current header (T3). Divergences, both deliberate:
columns here carry the MySQL type text (the reference stores names
only) so the apply kernel can materialize typed tables, and persistence
is to a caller-chosen path (the streaming pipeline persists per
microbatch — coarser than the reference's per-DDL fsync but aligned
with Spark's checkpoint commit model, SURVEY §4).

Driver-side state is the right home at any scale: the registry holds
schemas (KBs), never data, and mutates only on DDL events, which are
vanishingly rare relative to row events.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import types as T

from . import ddl as D
from .schemas import mysql_type_to_spark


class RegistryError(Exception):
    pass


class SchemaRegistry:
    """db → table → ordered [(column, mysql_type|None)]."""

    def __init__(self) -> None:
        self.dbs: dict[str, dict[str, list[tuple[str, str | None]]]] = {}

    # -- lookups ------------------------------------------------------------

    def get_columns(self, db: str, table: str) -> list[str] | None:
        cols = self.dbs.get(db.lower(), {}).get(table.lower())
        return [c for c, _ in cols] if cols is not None else None

    def get_spark_schema(self, db: str, table: str) -> T.StructType | None:
        cols = self.dbs.get(db.lower(), {}).get(table.lower())
        if cols is None:
            return None
        return T.StructType([T.StructField(c, mysql_type_to_spark(t), True) for c, t in cols])

    def tables(self) -> list[tuple[str, str]]:
        return [(db, t) for db, ts in self.dbs.items() for t in ts]

    # -- mutation (local_store.rs:89-169 semantics) -------------------------

    def apply_ops(self, db: str, ops: list[D.TableOp]) -> None:
        db = db.lower()
        for op in ops:
            if isinstance(op, D.CreateTable):
                tables = self.dbs.setdefault(db, {})
                if op.table in tables:
                    raise RegistryError(f"table exists: {db}.{op.table}")
                tables[op.table] = [(c, t or None) for c, t in op.columns]
            elif isinstance(op, D.AddColumn):
                self._cols(db, op.table).append((op.column, op.mysql_type))
            elif isinstance(op, D.RenameColumn):
                cols = self._cols(db, op.table)
                for i, (c, t) in enumerate(cols):
                    if c == op.old:
                        cols[i] = (op.new, op.mysql_type or t)
                        break
                else:
                    raise RegistryError(f"no such column: {db}.{op.table}.{op.old}")
            elif isinstance(op, D.DropColumn):
                cols = self._cols(db, op.table)
                self.dbs[db][op.table] = [(c, t) for c, t in cols if c != op.column]
            elif isinstance(op, D.DropTable):
                tables = self.dbs.get(db, {})
                for t in op.tables:
                    tables.pop(t, None)
                if db in self.dbs and not self.dbs[db]:
                    del self.dbs[db]  # remove db when empty (local_store.rs:131-133)

    def apply_query(self, db: str, query: str | None, strict: bool = False) -> list[D.TableOp]:
        ops = D.parse_query(query, strict=strict)
        if ops:
            self.apply_ops(db, ops)
        return ops

    def _cols(self, db: str, table: str) -> list[tuple[str, str | None]]:
        try:
            return self.dbs[db][table.lower()]
        except KeyError:
            raise RegistryError(f"no such table: {db}.{table}") from None

    # -- persistence --------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(self.dbs, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "SchemaRegistry":
        r = cls()
        raw = json.loads(s)
        r.dbs = {
            db: {t: [(c, ty) for c, ty in cols] for t, cols in tables.items()}
            for db, tables in raw.items()
        }
        return r

    def save(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(p.suffix + ".tmp")
        tmp.write_text(self.to_json())
        tmp.replace(p)

    @classmethod
    def load(cls, path: str | Path) -> "SchemaRegistry":
        p = Path(path)
        return cls.from_json(p.read_text()) if p.exists() else cls()
