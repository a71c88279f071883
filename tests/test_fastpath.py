"""Point/prefix fast path (query/fastpath.py): results must be identical
to the general pipeline (which `, true` in the body forces)."""

import pytest

from cozo_tpu.runtime.db import Db


@pytest.fixture
def db():
    db = Db("mem")
    db.run_script(":create kv {a: Int, b: Int => v: Int, w: Any}")
    rows = [[i // 10, i % 10, i * 2, f"s{i%3}"] for i in range(300)]
    db.run_script("?[a, b, v, w] <- $rows :put kv {a, b => v, w}", params={"rows": rows})
    return db


def both(db, fast_script, slow_script, params=None):
    f = db.run_script(fast_script, params=params)
    s = db.run_script(slow_script, params=params)
    assert f.rows == s.rows, (f.rows, s.rows)
    return f.rows


def test_full_key_get(db):
    rows = both(
        db,
        "?[v] := *kv{a: $a, b: $b, v}",
        "?[v] := *kv{a: $a, b: $b, v}, true",
        {"a": 3, "b": 7},
    )
    assert rows == [[74]]


def test_prefix_scan_order_and_dedup(db):
    # head drops the b key column → duplicates must collapse, output in
    # value order like the general memo store
    both(db, "?[w] := *kv{a: 2, w}", "?[w] := *kv{a: 2, w}, true")


def test_limit_offset(db):
    both(
        db,
        "?[b, v] := *kv{a: 4, b, v} :limit 3 :offset 2",
        "?[b, v] := *kv{a: 4, b, v}, true :limit 3 :offset 2",
    )


def test_const_value_filter(db):
    both(db, '?[a, b] := *kv{a, b, w: "s1"}', '?[a, b] := *kv{a, b, w: "s1"}, true')


def test_missing_key(db):
    assert db.run_script("?[v] := *kv{a: 99, b: 0, v}").rows == []


def test_wrong_type_key(db):
    rows = db.run_script('?[v] := *kv{a: "zap", b: 0, v}').rows
    assert rows == []


def test_mutation_visibility(db):
    db.run_script("?[v] := *kv{a: 1, b: 1, v}")
    db.run_script('?[a, b, v, w] <- [[1, 1, 777, "x"]] :put kv {a, b => v, w}')
    assert db.run_script("?[v] := *kv{a: 1, b: 1, v}").rows == [[777]]
    db.run_script("?[a, b] <- [[1, 1]] :rm kv {a, b}")
    assert db.run_script("?[v] := *kv{a: 1, b: 1, v}").rows == []


def test_access_level_hidden_bails_to_canonical_error(db):
    db.run_script("?[v] := *kv{a: 0, b: 0, v}")  # prime fast plan
    db.run_script("::access_level hidden kv")
    with pytest.raises(Exception):
        db.run_script("?[v] := *kv{a: 0, b: 0, v}")


def test_relation_drop_and_recreate(db):
    db.run_script("?[v] := *kv{a: 0, b: 0, v}")
    db.run_script("::remove kv")
    with pytest.raises(Exception):
        db.run_script("?[v] := *kv{a: 0, b: 0, v}")
    db.run_script(":create kv {a: Int, b: Int => v: Int, w: Any}")
    assert db.run_script("?[v] := *kv{a: 0, b: 0, v}").rows == []


def test_validity_relation_not_fastpathed():
    db = Db("mem")
    db.run_script(":create h {k: Int, vld: Validity => v: Int}")
    db.run_script("?[k, vld, v] <- [[1, [9, true], 10]] :put h {k, vld => v}")
    fast = db.run_script("?[v] := *h{k: 1, v}").rows
    slow = db.run_script("?[v] := *h{k: 1, v}, true").rows
    assert fast == slow  # fastpath must defer validity semantics


def test_head_reorder(db):
    both(db, "?[v, b] := *kv{a: 5, b, v}", "?[v, b] := *kv{a: 5, b, v}, true")


def test_repeated_binding_not_fast(db):
    db2 = Db("mem")
    db2.run_script(":create eq {x: Int => y: Int}")
    db2.run_script("?[x, y] <- [[1, 1], [2, 3]] :put eq {x => y}")
    assert db2.run_script("?[x] := *eq{x, y: x}").rows == [[1]]


def test_count_fast_path(db):
    both(db, "?[count(v)] := *kv{a, b, v}", "?[count(v)] := *kv{a, b, v}, true")
    both(db, "?[count(b)] := *kv{a: 2, b, v, w}", "?[count(b)] := *kv{a: 2, b, v, w}, true")
    # distinct-collapsing shape must NOT be fast-pathed: only b bound
    both(db, "?[count(w)] := *kv{a, b, w}", "?[count(w)] := *kv{a, b, w}, true")
    r = db.run_script("?[count(w)] := *kv{a: 1, w}")  # w dedups: general path
    s = db.run_script("?[count(w)] := *kv{a: 1, w}, true")
    assert r.rows == s.rows
    # repeated-binding equality must not be counted as all rows
    db2 = Db("mem")
    db2.run_script(":create ee {f: Int, t: Int}")
    db2.run_script("?[f, t] <- [[1,1],[1,2],[2,2]] :put ee {f, t}")
    assert db2.run_script("?[count(x)] := *ee{f: x, t: x}").rows == [[2]]


def test_count_headers_match(db):
    f = db.run_script("?[count(v)] := *kv{a, b, v}")
    s = db.run_script("?[count(v)] := *kv{a, b, v}, true")
    assert f.headers == s.headers
