"""Canonical test fixtures.

``PET_EVENTS``: the nine-event pet-store scenario — the reference's
end-to-end golden test (event JSONs documented at
cdc-mysql/README.md:223-231, driven by
cdc-mysql/scripts/helpers/mysql-send-cmds.sh:12-21). Exercises all four
operation kinds, mid-stream schema evolution (ALTER ADD COLUMN), and
NULL handling. ``PET_GOLDEN`` is the expected final table
(cdc-mysql/README.md:191-198).
"""

from __future__ import annotations

import json


def _ev(seq: int, offset: int, db_or_table: str, operation: dict, columns: list[str] | None = None) -> str:
    obj: dict = {
        "uri": f"flv://mysql-srv1/{db_or_table}",
        "sequence": seq,
        "bn_file": {"fileName": "binlog.000003", "offset": offset},
    }
    if columns is not None:
        obj["columns"] = columns
    obj["operation"] = operation
    return json.dumps(obj, separators=(",", ":"))


def _d(y: int, m: int, d: int) -> dict:
    return {"Date": {"year": y, "month": m, "day": d}}


def _s(s: str) -> dict:
    return {"String": s}


_C5 = ["name", "owner", "species", "sex", "birth"]
_C6 = _C5 + ["last_vaccine"]

PET_EVENTS: list[str] = [
    _ev(0, 233, "flvDb", {"Query": "CREATE DATABASE flvDb"}),
    _ev(1, 423, "flvdb", {"Query": (
        "CREATE TABLE pet (name VARCHAR(20), owner VARCHAR(20), "
        "species VARCHAR(20), sex CHAR(1), birth DATE)")}),
    _ev(2, 832, "flvdb/pet", {"Add": {"rows": [
        {"cols": [_s("Puffball"), _s("Diane"), _s("hamster"), _s("f"), _d(1999, 3, 30)]}]}}, _C5),
    _ev(3, 1146, "flvdb/pet", {"Add": {"rows": [
        {"cols": [_s("Jack"), _s("Peter"), _s("dog"), _s("m"), _d(1999, 3, 30)]}]}}, _C5),
    _ev(4, 1461, "flvdb/pet", {"Update": {"rows": [{
        "before_cols": [_s("Jack"), _s("Peter"), _s("dog"), _s("m"), _d(1999, 3, 30)],
        "after_cols": [_s("Jack"), _s("Peter"), _s("dog"), _s("m"), _d(1989, 8, 31)]}]}}, _C5),
    _ev(5, 1647, "flvdb", {"Query": "ALTER TABLE pet ADD COLUMN last_vaccine DATE"}),
    _ev(6, 2001, "flvdb/pet", {"Delete": {"rows": [
        {"cols": [_s("Puffball"), _s("Diane"), _s("hamster"), _s("f"), _d(1999, 3, 30), "Null"]}]}}, _C6),
    _ev(7, 2316, "flvdb/pet", {"Add": {"rows": [
        {"cols": [_s("Spot"), _s("Jane"), _s("dog"), _s("m"), _d(2010, 11, 2), "Null"]}]}}, _C6),
    _ev(8, 2631, "flvdb/pet", {"Update": {"rows": [{
        "before_cols": [_s("Spot"), _s("Jane"), _s("dog"), _s("m"), _d(2010, 11, 2), "Null"],
        "after_cols": [_s("Spot"), _s("Jane"), _s("dog"), _s("m"), _d(2010, 11, 2),
                       _d(2020, 6, 10)]}]}}, _C6),
]

# Expected final pet table (dates as ISO strings).
PET_GOLDEN: list[tuple] = [
    ("Jack", "Peter", "dog", "m", "1989-08-31", None),
    ("Spot", "Jane", "dog", "m", "2010-11-02", "2020-06-10"),
]
PET_COLUMNS = ["name", "owner", "species", "sex", "birth", "last_vaccine"]
