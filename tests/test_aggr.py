"""Aggregation unit + integration tests (mirrors reference
`data/tests/aggrs.rs`)."""

import math

import pytest

from cozo_tpu import Db
from cozo_tpu.data.aggr import AGGR_REGISTRY, get_aggr


@pytest.fixture()
def db():
    return Db("mem")


def run_aggr(name, values, extra=()):
    acc = get_aggr(name).make(list(extra))
    for v in values:
        acc.set(v)
    return acc.get()


def run_meet(name, values):
    a = get_aggr(name)
    assert a.is_meet
    cur = None
    for v in values:
        cur, _ = a.meet_update(cur, v)
    return cur


def test_registry_complete():
    expected = {
        "and", "or", "unique", "group_count", "union", "intersection",
        "count", "count_unique", "variance", "std_dev", "sum", "product",
        "min", "max", "mean", "collect", "choice_rand", "latest_by",
        "smallest_by", "min_cost", "shortest", "choice", "bit_and",
        "bit_or", "bit_xor",
    }
    assert set(AGGR_REGISTRY) == expected
    # meet flags follow the reference's define_aggr declarations
    for name in ("min", "max", "and", "or", "union", "intersection",
                 "min_cost", "shortest", "choice", "bit_and", "bit_or"):
        assert AGGR_REGISTRY[name].is_meet, name
    for name in ("bit_xor", "latest_by", "smallest_by", "count", "sum",
                 "collect", "mean"):
        assert not AGGR_REGISTRY[name].is_meet, name


def test_basic_accumulators():
    assert run_aggr("count", [1, 2, 2]) == 3
    assert run_aggr("count_unique", [1, 2, 2]) == 2
    assert run_aggr("sum", [1, 2, 3]) == 6.0
    assert run_aggr("product", [2, 3]) == 6.0
    assert run_aggr("mean", [1, 2, 3]) == 2.0
    assert abs(run_aggr("variance", [1.0, 2.0, 3.0]) - 1.0) < 1e-9
    assert abs(run_aggr("std_dev", [1.0, 2.0, 3.0]) - 1.0) < 1e-9
    assert run_aggr("min", [3, 1, 2]) == 1
    assert run_aggr("max", [3, 1, 2]) == 3
    assert run_aggr("unique", [2, 1, 2]) == [1, 2]
    assert run_aggr("group_count", ["a", "b", "a"]) == [["a", 2], ["b", 1]]
    assert run_aggr("collect", [1, 2, 3]) == [1, 2, 3]
    assert run_aggr("collect", [1, 2, 3], extra=[2]) == [1, 2]
    assert run_aggr("union", [[1, 2], [2, 3]]) == [1, 2, 3]
    assert run_aggr("intersection", [[1, 2], [2, 3]]) == [2]
    assert run_aggr("and", [True, True]) is True
    assert run_aggr("and", [True, False]) is False
    assert run_aggr("or", [False, True]) is True
    assert run_aggr("choice", [5, 6]) == 5
    assert run_aggr("latest_by", [["a", 1], ["b", 3], ["c", 2]]) == "b"
    assert run_aggr("smallest_by", [["a", 5], ["b", 2]]) == "b"
    assert run_aggr("min_cost", [["a", 3.0], ["b", 1.0]]) == ["b", 1.0]
    assert run_aggr("shortest", [[1, 2, 3], [1, 2]]) == [1, 2]
    assert run_aggr("bit_and", [b"\xff\x0f", b"\xf0\xff"]) == b"\xf0\x0f"
    assert run_aggr("bit_or", [b"\x0f\x00", b"\xf0\x00"]) == b"\xff\x00"
    assert run_aggr("bit_xor", [b"\xff", b"\x0f"]) == b"\xf0"


def test_meet_ops():
    assert run_meet("min", [3, 1, 2]) == 1
    assert run_meet("max", [3, 1, 2]) == 3
    assert run_meet("union", [[1], [2]]) == [1, 2]
    assert run_meet("intersection", [[1, 2], [2, 3]]) == [2]
    assert run_meet("min_cost", [["a", 3.0], ["b", 1.0], ["c", 2.0]]) == ["b", 1.0]
    assert run_meet("shortest", [[1, 2, 3], [9]]) == [9]
    assert run_meet("choice", [7, 8]) == 7


def test_aggr_in_queries(db):
    res = db.run_script(
        "?[b, collect(a)] := a in [1,2,3,4], b = a % 2"
    )
    d = {r[0]: r[1] for r in res.rows}
    assert sorted(d[0]) == [2, 4] and sorted(d[1]) == [1, 3]
    res = db.run_script("?[variance(a)] := a in [1.0, 2.0, 3.0]")
    assert abs(res.rows[0][0] - 1.0) < 1e-9
    res = db.run_script("?[group_count(a)] := a in ['x', 'y', 'x']")
    assert res.rows[0][0] == [["x", 2], ["y", 1]]
    # empty input with all-aggr head yields the neutral row (eval.rs:364-380)
    res = db.run_script("?[count(a)] := a in []")
    assert res.rows == [[0]]


def test_recursive_meet_union(db):
    db.run_script("?[f, t] <- [[1,2],[2,3],[1,3]] :create ug {f, t}")
    res = db.run_script(
        """
        grp[x, union(s)] := *ug[x, y], s = [y]
        grp[x, union(s)] := grp[y, s0], *ug[x, y], s = s0
        ?[x, s] := grp[x, s]
        """
    )
    d = {r[0]: r[1] for r in res.rows}
    assert set(d[1]) == {2, 3}
