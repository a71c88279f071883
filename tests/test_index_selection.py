"""Lateral-index selection + scan-bound derivation tests
(reference `runtime/tests.rs` test_index / test_index_short)."""

import pytest

from cozo_tpu import Db


@pytest.fixture()
def db():
    d = Db("mem")
    d.run_script(":create person {id: Int => name: String, age: Int}")
    rows = [[i, f"p{i}", 20 + (i % 50)] for i in range(200)]
    d.run_script("?[id, name, age] <- $rows :put person {id => name, age}", {"rows": rows})
    d.run_script("::index create person:by_name {name}")
    d.run_script("::index create person:by_age {age, name}")
    return d


def test_index_backfill_and_lookup(db):
    res = db.run_script("?[id] := *person{id, name: 'p42'}")
    assert res.rows == [[42]]


def test_index_covering_query(db):
    res = db.run_script("?[name] := *person{name, age: 25}")
    assert sorted(r[0] for r in res.rows) == sorted(
        f"p{i}" for i in range(200) if 20 + (i % 50) == 25
    )


def test_index_noncovering_join_back(db):
    # age is indexed but the query also needs name+id from the base
    res = db.run_script("?[id, name] := *person{id, name, age: 30}")
    expected = sorted([i, f"p{i}"] for i in range(200) if 20 + (i % 50) == 30)
    assert sorted(res.rows) == expected


def test_index_maintenance_on_put_rm(db):
    db.run_script("?[id, name, age] <- [[999, 'zz', 99]] :put person {id => name, age}")
    assert db.run_script("?[id] := *person{id, name: 'zz'}").rows == [[999]]
    db.run_script("?[id] <- [[999]] :rm person {id}")
    assert db.run_script("?[id] := *person{id, name: 'zz'}").rows == []


def test_index_queryable_directly(db):
    res = db.run_script("?[name, id] := *person:by_name[name, id] :limit 3")
    assert len(res.rows) == 3


def test_range_bounds(db):
    res = db.run_script("?[id] := *person[id, name, age], id >= 5, id < 8")
    assert [r[0] for r in res.rows] == [5, 6, 7]
    res = db.run_script("?[id] := *person[id, name, age], id == 17")
    assert res.rows == [[17]]


def test_index_drop_restores_base_scan(db):
    db.run_script("::index drop person:by_name")
    res = db.run_script("?[id] := *person{id, name: 'p42'}")
    assert res.rows == [[42]]
