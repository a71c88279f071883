"""Regression tests for the OLTP mutation fast path (query/fastpath.py
MutatePlan): results and errors must be indistinguishable from the
general mutation executor, and every feature that needs the general
path (indexes, triggers, callbacks, validity) must fall back to it.

Reference semantics anchor: cozo-core/src/query/stored.rs.
"""

import time

import pytest

from cozo_tpu.query.fastpath import MutatePlan
from cozo_tpu.runtime.db import Db
from cozo_tpu.utils.errors import CozoError


@pytest.fixture()
def db():
    d = Db("mem")
    d.run_script(":create kv {k: Int => v: Int}")
    yield d
    d.close()


def _plan_installed(db, script):
    return isinstance(db._fast_plans.get(script), MutatePlan)


def test_put_via_fastpath_and_roundtrip(db):
    s = "?[k,v] <- [[$k,$v]] :put kv {k => v}"
    for i in range(5):
        db.run_script(s, params={"k": i, "v": i * 10})
    assert _plan_installed(db, s)
    rows = db.run_script("?[k,v] := *kv{k,v}").rows
    assert rows == [[i, i * 10] for i in range(5)]


def test_param_rows_put_and_dedup(db):
    s = "?[k,v] <- $rows :put kv {k => v}"
    db.run_script(s, params={"rows": [[3, 1], [1, 1], [3, 1], [2, 2]]})
    assert _plan_installed(db, s)
    rows = db.run_script("?[k,v] := *kv{k,v}").rows
    assert rows == [[1, 1], [2, 2], [3, 1]]


def test_insert_conflict_error_matches_general_path(db):
    db.run_script("?[k,v] <- [[1,1]] :insert kv {k => v}")
    with pytest.raises(CozoError) as e1:
        db.run_script("?[k,v] <- [[1,2]] :insert kv {k => v}")
    # same error against a fresh db forced through the general path
    d2 = Db("mem")
    d2.run_script(":create kv {k: Int => v: Int}")
    d2.run_script("?[k,v] <- [[1,1]] :insert kv {k => v}")
    d2._fast_plans.clear()
    d2._plan_cache.clear()
    with pytest.raises(CozoError) as e2:
        d2.run_script("?[k,v] <- [[1,2]] :insert kv {k => v} :offset 0")
    assert e1.value.code == e2.value.code == "eval::assert_insert_failure"


def test_update_merges_unmentioned_columns():
    d = Db("mem")
    d.run_script(":create m {k: Int => a: Int, b: Int}")
    d.run_script("?[k,a,b] <- [[1,10,20]] :put m {k => a, b}")
    d.run_script("?[k,a] <- [[1,11]] :update m {k => a}")
    assert d.run_script("?[a,b] := *m{k:1,a,b}").rows == [[11, 20]]
    with pytest.raises(CozoError):
        d.run_script("?[k,a] <- [[9,1]] :update m {k => a}")


def test_rm_and_delete_semantics(db):
    db.run_script("?[k,v] <- [[1,1],[2,2]] :put kv {k => v}")
    db.run_script("?[k] <- [[1]] :rm kv {k}")
    db.run_script("?[k] <- [[1]] :rm kv {k}")  # rm of absent key is fine
    with pytest.raises(CozoError):
        db.run_script("?[k] <- [[1]] :delete kv {k}")
    assert db.run_script("?[k,v] := *kv{k,v}").rows == [[2, 2]]


def test_immutable_refuses_fast_write(db):
    with pytest.raises(CozoError):
        db.run_script("?[k,v] <- [[1,1]] :put kv {k => v}", immutable=True)
    assert db.run_script("?[k,v] := *kv{k,v}").rows == []


def test_fallback_with_lateral_index(db):
    s = "?[k,v] <- [[$k,$v]] :put kv {k => v}"
    db.run_script(s, params={"k": 1, "v": 5})
    db.run_script("::index create kv:by_v {v}")
    db.run_script(s, params={"k": 2, "v": 7})
    assert db.run_script("?[k] := *kv:by_v{v: 7, k}").rows == [[2]]
    # removal maintains the index too
    db.run_script("?[k] <- [[2]] :rm kv {k}")
    assert db.run_script("?[k] := *kv:by_v{v: 7, k}").rows == []


def test_fallback_with_trigger(db):
    db.run_script(":create log {k: Int => at: Float}")
    db.run_script(
        '::set_triggers kv on put { ?[k, at] := _new[k, v], at = 1.0 '
        ':put log {k => at} }'
    )
    db.run_script("?[k,v] <- [[42,1]] :put kv {k => v}")
    assert db.run_script("?[k] := *log{k}").rows == [[42]]


def test_fallback_with_callback(db):
    got = []
    cb_id = db.register_callback("kv", lambda op, rel, new, old: got.append((op, new)))
    db.run_script("?[k,v] <- [[7,8]] :put kv {k => v}")
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        time.sleep(0.01)
    assert got and got[0][0] == "Put" and got[0][1] == [[7, 8]]
    db.unregister_callback(cb_id)
    # after unregistration the fast path engages again (no collection)
    db.run_script("?[k,v] <- [[8,9]] :put kv {k => v}")
    assert db.run_script("?[v] := *kv{k:8,v}").rows == [[9]]


def test_fallback_validity_relation():
    d = Db("mem")
    d.run_script(":create hist {k: Int, at: Validity => v: Int}")
    d.run_script("?[k, at, v] <- [[1, 'ASSERT', 10]] :put hist {k, at => v}")
    assert d.run_script("?[v] := *hist{k: 1, v, @ 'NOW'}").rows == [[10]]


def test_type_coercion_and_errors(db):
    # float that is integral coerces into Int column
    db.run_script("?[k,v] <- [[1.0, 2]] :put kv {k => v}")
    assert db.run_script("?[v] := *kv{k:1,v}").rows == [[2]]
    with pytest.raises(CozoError):
        db.run_script("?[k,v] <- [['x', 2]] :put kv {k => v}")


def test_returning_falls_back(db):
    r = db.run_script("?[k,v] <- [[5,6]] :put kv {k => v} :returning")
    assert r.headers[0] == "_kind"
    assert r.rows[0][0] == "inserted"


def test_access_level_respected(db):
    db.run_script("?[k,v] <- [[1,1]] :put kv {k => v}")
    db.run_script("::access_level read_only kv")
    with pytest.raises(CozoError):
        db.run_script("?[k,v] <- [[2,2]] :put kv {k => v}")
    db.run_script("::access_level normal kv")
    db.run_script("?[k,v] <- [[2,2]] :put kv {k => v}")
    assert len(db.run_script("?[k] := *kv{k}").rows) == 2


def test_fastpath_conflict_detection_tkv(tmp_path):
    """Optimistic-commit conflict semantics survive the fast path (tkv)."""
    d = Db("tkv", str(tmp_path / "t.db"))
    try:
        d.run_script(":create kv {k: Int => v: Int}")
        s = "?[k,v] <- [[$k,$v]] :put kv {k => v}"
        for i in range(50):
            d.run_script(s, params={"k": i, "v": i})
        assert _plan_installed(d, s)
        assert d.run_script("?[v] := *kv{k: 49, v}").rows == [[49]]
    finally:
        d.close()
