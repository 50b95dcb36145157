"""SQL-rendering sink golden parity with the reference's generated
statements (mysql_manager.rs test expectations)."""

from __future__ import annotations

import pytest

from fluvio_demo_apps_rust_spark.operators.render_sql import (
    RenderError,
    build_add_queries,
    build_delete_queries,
    build_update_queries,
)

COLS = ["name", "owner", "species", "sex", "birth", "death"]


def _s(x):
    return {"String": x}


def _d(y, m, d):
    return {"Date": {"year": y, "month": m, "day": d}}


PIP = [_s("Pip"), _s("Jake"), _s("mouse"), _s("m"), _d(2020, 3, 30), "Null"]
SPOT = [_s("Spot"), _s("Jane"), _s("dog"), _s("m"), _d(2010, 11, 2), "Null"]


def test_insert_golden():
    # golden strings: cdc-mysql/src/consumer/mysql_manager.rs:449-453
    assert build_add_queries("pet", COLS, [PIP, SPOT]) == [
        'INSERT INTO pet (name, owner, species, sex, birth, death) '
        'VALUES ("Pip", "Jake", "mouse", "m", "2020-3-30", Null)',
        'INSERT INTO pet (name, owner, species, sex, birth, death) '
        'VALUES ("Spot", "Jane", "dog", "m", "2010-11-2", Null)',
    ]


def test_update_golden():
    # golden strings: cdc-mysql/src/consumer/mysql_manager.rs:535-539
    mickey = [_s("Mickey"), _s("Jack"), _s("mouse"), _s("m"), _d(2020, 3, 30), "Null"]
    spot_after = [_s("Spot"), _s("Jane"), _s("dog"), _s("m"), _d(2010, 11, 2), _d(2020, 6, 10)]
    assert build_update_queries("pet", COLS, [(PIP, mickey), (SPOT, spot_after)]) == [
        'UPDATE pet SET name="Mickey", owner="Jack" WHERE name="Pip" AND owner="Jake" '
        'AND species="mouse" AND sex="m" AND birth="2020-3-30" AND death is NULL',
        'UPDATE pet SET death="2020-6-10" WHERE name="Spot" AND owner="Jane" '
        'AND species="dog" AND sex="m" AND birth="2010-11-2" AND death is NULL',
    ]


def test_delete_golden():
    # golden strings: cdc-mysql/src/consumer/mysql_manager.rs:593-597
    assert build_delete_queries("pet", COLS, [PIP, SPOT]) == [
        'DELETE FROM pet WHERE name="Pip" AND owner="Jake" AND species="mouse" '
        'AND sex="m" AND birth="2020-3-30" AND death is NULL',
        'DELETE FROM pet WHERE name="Spot" AND owner="Jane" AND species="dog" '
        'AND sex="m" AND birth="2010-11-2" AND death is NULL',
    ]


def test_k6_guards():
    with pytest.raises(RenderError):
        build_add_queries("t", [], [[_s("x")]])
    with pytest.raises(RenderError):
        build_add_queries("t", ["a"], [[_s("x"), _s("y")]])
