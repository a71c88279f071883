"""End-to-end query tests against the in-mem engine — mirrors the shape of
the reference's `runtime/tests.rs` integration suite."""

import pytest

from cozo_tpu import Db
from cozo_tpu.utils.errors import CozoError


import os


# like the reference's COZO_TEST_DB_ENGINE (air_routes.rs:28): the same
# integration suite runs against every engine
@pytest.fixture()
def db(tmp_path):
    engine = os.environ.get("COZO_TEST_DB_ENGINE", "mem")
    if engine == "mem":
        yield Db("mem")
    elif engine == "sqlite":
        yield Db("sqlite", str(tmp_path / "test.db"))
    elif engine == "tkv":
        yield Db("tkv", str(tmp_path / "test.tkv"))
    elif engine == "plog":
        yield Db("plog", str(tmp_path / "test.plog"))
    elif engine == "remote":
        from cozo_tpu.storage.mem import MemStorage
        from cozo_tpu.storage.remote import KvServer

        srv = KvServer(MemStorage())
        srv.start_background()
        yield Db("remote", f"{srv.addr[0]}:{srv.addr[1]}")
        srv.shutdown()
    else:
        raise ValueError(engine)


def q(db, script, params=None):
    return db.run_script(script, params)


def test_const_rule(db):
    res = q(db, "?[a] <- [[1], [2], [1]]")
    assert res.rows == [[1], [2]]
    assert res.headers == ["a"]


def test_expressions_in_rules(db):
    res = q(db, "?[a, b] := a in [1, 2, 3], b = a * 2, b > 2")
    assert res.rows == [[2, 4], [3, 6]]


def test_joins(db):
    q(db, "?[a, b] <- [[1, 'x'], [2, 'y']] :create r1 {a => b}")
    q(db, "?[a, c] <- [[1, 10], [2, 20], [3, 30]] :create r2 {a => c}")
    res = q(db, "?[b, c] := *r1[a, b], *r2[a, c]")
    assert res.rows == [["x", 10], ["y", 20]]


def test_recursion_transitive_closure(db):
    q(db, "?[f, t] <- [[1,2],[2,3],[3,4]] :create e {f, t}")
    res = q(
        db,
        """
        reach[a, b] := *e[a, b]
        reach[a, c] := reach[a, b], *e[b, c]
        ?[a, b] := reach[a, b]
        """,
    )
    assert len(res.rows) == 6
    assert [1, 4] in res.rows


def test_negation(db):
    q(db, "?[a] <- [[1],[2],[3]] :create n1 {a}")
    q(db, "?[a] <- [[2]] :create n2 {a}")
    res = q(db, "?[a] := *n1[a], not *n2[a]")
    assert res.rows == [[1], [3]]


def test_disjunction(db):
    res = q(db, "r[a] <- [[1],[2]]; s[a] <- [[3]]; ?[a] := r[a] or s[a]")
    assert res.rows == [[1], [2], [3]]


def test_aggregations(db):
    res = q(db, "?[count(a), sum(a), min(a), max(a)] := a in [1, 2, 3, 4]")
    assert res.rows == [[4, 10.0, 1, 4]]
    res = q(db, "?[a, count(b)] := a in [1, 2], b in [10, 20, 30]")
    assert res.rows == [[1, 3], [2, 3]]


def test_meet_aggr_recursion_shortest_path(db):
    q(
        db,
        "?[f, t, w] <- [['a','b',1.0],['b','c',2.0],['a','c',5.0]] "
        ":create edge {f, t => w}",
    )
    res = q(
        db,
        """
        sp[t, min(c)] := *edge['a', t, w], c = w
        sp[t, min(c)] := sp[m, c0], *edge[m, t, w], c = c0 + w
        ?[t, c] := sp[t, c]
        """,
    )
    d = {r[0]: r[1] for r in res.rows}
    assert d["c"] == 3.0


def test_limit_offset_order(db):
    res = q(db, "?[a] := a in [5, 3, 1, 4, 2] :order -a :limit 2 :offset 1")
    assert res.rows == [[4], [3]]


def test_put_update_rm(db):
    q(db, ":create t1 {k: Int => v: Int}")
    q(db, "?[k, v] <- [[1, 10], [2, 20]] :put t1 {k => v}")
    res = q(db, "?[k, v] := *t1[k, v]")
    assert res.rows == [[1, 10], [2, 20]]
    q(db, "?[k, v] <- [[1, 11]] :put t1 {k => v}")
    res = q(db, "?[v] := *t1[1, v]")
    assert res.rows == [[11]]
    q(db, "?[k] <- [[2]] :rm t1 {k}")
    res = q(db, "?[k, v] := *t1[k, v]")
    assert res.rows == [[1, 11]]


def test_insert_conflict(db):
    q(db, ":create t2 {k: Int}")
    q(db, "?[k] <- [[1]] :insert t2 {k}")
    with pytest.raises(CozoError):
        q(db, "?[k] <- [[1]] :insert t2 {k}")


def test_update_preserves_other_cols(db):
    q(db, ":create t3 {k => a default 0, b default 0}")
    q(db, "?[k, a, b] <- [[1, 5, 6]] :put t3 {k => a, b}")
    q(db, "?[k, a] <- [[1, 50]] :update t3 {k => a}")
    res = q(db, "?[a, b] := *t3[1, a, b]")
    assert res.rows == [[50, 6]]


def test_create_with_defaults(db):
    q(db, ":create t4 {k: Int => v: Int default 42}")
    q(db, "?[k] <- [[1]] :put t4 {k}")
    res = q(db, "?[v] := *t4[1, v]")
    assert res.rows == [[42]]


def test_named_relation_access(db):
    q(db, ":create loc {name: String => lat: Float, lon: Float}")
    q(db, "?[name, lat, lon] <- [['a', 1.0, 2.0]] :put loc {name => lat, lon}")
    res = q(db, "?[lat] := *loc{name: 'a', lat}")
    assert res.rows == [[1.0]]


def test_stratified_negation_error(db):
    with pytest.raises(CozoError):
        q(db, "p[a] := a in [1], not q[a]; q[a] := a in [1], not p[a]; ?[a] := p[a]")


def test_assert_options(db):
    q(db, "?[a] <- [[1]] :assert some")
    with pytest.raises(CozoError):
        q(db, "?[a] <- [[1]] :assert none")
    q(db, "?[a] <- [] :assert none")


def test_fixed_rule_pagerank(db):
    q(db, "?[f, t] <- [[1,2],[2,3],[3,1],[1,3]] :create pr_e {f, t}")
    res = q(db, "?[node, score] <~ PageRank(*pr_e[])")
    assert len(res.rows) == 3
    scores = {r[0]: r[1] for r in res.rows}
    assert scores[3] > scores[2]


def test_fixed_rule_dijkstra(db):
    q(
        db,
        "?[f, t, w] <- [['a','b',1.0],['b','c',1.0],['a','c',5.0]] "
        ":create dj {f, t => w}",
    )
    res = q(
        db,
        "st[n] <- [['a']]; en[n] <- [['c']]; "
        "?[s, g, c, p] <~ ShortestPathDijkstra(*dj[], st[], en[])",
    )
    assert res.rows[0][2] == 2.0
    assert res.rows[0][3] == ["a", "b", "c"]


def test_fixed_rule_topsort(db):
    q(db, "?[f, t] <- [['a','b'],['b','c']] :create ts {f, t}")
    res = q(db, "?[i, n] <~ TopSort(*ts[])")
    order = [r[1] for r in sorted(res.rows)]
    assert order == ["a", "b", "c"]


def test_reorder_sort(db):
    res = q(
        db,
        "r[a, b] <- [[1, 'x'], [3, 'z'], [2, 'y']]; "
        "?[rank, b] <~ ReorderSort(r[a, b], out: [b], sort_by: a, descending: true)",
    )
    assert res.rows == [[1, "z"], [2, "y"], [3, "x"]]


def test_sys_relations(db):
    q(db, ":create sysrel {a}")
    res = q(db, "::relations")
    assert any(r[0] == "sysrel" for r in res.rows)
    res = q(db, "::columns sysrel")
    assert res.rows[0][0] == "a"


def test_remove_rename(db):
    q(db, ":create rr1 {a}")
    q(db, "::rename rr1 -> rr2")
    res = q(db, "::relations")
    names = [r[0] for r in res.rows]
    assert "rr2" in names and "rr1" not in names
    q(db, "::remove rr2")
    res = q(db, "::relations")
    assert "rr2" not in [r[0] for r in res.rows]


def test_triggers(db):
    q(db, ":create main_rel {k => v}")
    q(db, ":create audit {k => v}")
    q(
        db,
        "::set_triggers main_rel on put { ?[k, v] := _new[k, v] :put audit {k => v} }",
    )
    q(db, "?[k, v] <- [[1, 2]] :put main_rel {k => v}")
    res = q(db, "?[k, v] := *audit[k, v]")
    assert res.rows == [[1, 2]]


def test_imperative_loop(db):
    res = q(
        db,
        """
        {?[a] <- [[1]] :replace _test {a}}
        %loop
            %if { ?[x] := *_test[x], x >= 10 }
                %then %break
            %end
            { ?[a] := *_test[b], a = b + 1 :replace _test {a} }
        %end
        %return _test
        """,
    )
    assert res.rows == [[10]]


def test_callbacks(db):
    events = []
    db.register_callback("cbrel", lambda op, rel, new, old: events.append((op, new)))
    q(db, ":create cbrel {k}")
    q(db, "?[k] <- [[7]] :put cbrel {k}")
    assert events and events[0][0] == "Put" and events[0][1] == [[7]]


def test_custom_fixed_rule(db):
    from cozo_tpu import SimpleFixedRule

    db.register_fixed_rule(
        "Double", SimpleFixedRule("Double", 1, lambda inputs, opts: [[r[0] * 2] for r in inputs[0]])
    )
    res = q(db, "r[a] <- [[1],[2]]; ?[x] <~ Double(r[a])")
    assert res.rows == [[2], [4]]


def test_multi_transaction(db):
    tx = db.multi_transaction()
    tx.run_script(":create mt {k}")
    tx.run_script("?[k] <- [[1]] :put mt {k}")
    tx.commit()
    res = q(db, "?[k] := *mt[k]")
    assert res.rows == [[1]]


def test_params_in_query(db):
    res = q(db, "?[a] := a in $list, a > $min", {"list": [1, 2, 3], "min": 1})
    assert res.rows == [[2], [3]]


def test_validity_time_travel(db):
    q(db, ":create hist {k: String, at: Validity => v: Int}")
    q(db, "?[k, at, v] <- [['a', [100, true], 1]] :put hist {k, at => v}")
    q(db, "?[k, at, v] <- [['a', [200, true], 2]] :put hist {k, at => v}")
    res = q(db, "?[v] := *hist{k: 'a', v @ 150}")
    assert res.rows == [[1]]
    res = q(db, "?[v] := *hist{k: 'a', v @ 250}")
    assert res.rows == [[2]]
    res = q(db, "?[v] := *hist{k: 'a', v @ 50}")
    assert res.rows == []


def test_export_import(db):
    q(db, ":create ei {a => b}")
    q(db, "?[a, b] <- [[1, 2]] :put ei {a => b}")
    data = db.export_relations(["ei"])
    assert data["ei"]["rows"] == [[1, 2]]
    db2 = Db("mem")
    db2.run_script(":create ei {a => b}")
    db2.import_relations(data)
    assert db2.run_script("?[a, b] := *ei[a, b]").rows == [[1, 2]]


def test_backup_restore(db, tmp_path):
    q(db, ":create br {a}")
    q(db, "?[a] <- [[1], [2]] :put br {a}")
    path = str(tmp_path / "backup.db")
    db.backup_db(path)
    db2 = Db("mem")
    db2.restore_backup(path)
    assert db2.run_script("?[a] := *br[a]").rows == [[1], [2]]


def test_disjunct_binding_order_isolation(db):
    """DNF disjuncts share parsed Expr nodes; compiled clauses must not
    clobber each other's binding indices."""
    q(db, "?[x, y] <- [[1, 10]] :create dr1 {x => y}")
    q(db, "?[y, x] <- [[2, 20]] :create dr2 {y => x}")
    res = q(db, "?[s] := (*dr1[x, y] or *dr2[y, x]), s = x * 100 + y")
    assert sorted(r[0] for r in res.rows) == [110, 2002]


def test_unregister_callback_and_rule(db):
    from cozo_tpu import SimpleFixedRule

    events = []
    cb_id = db.register_callback("ucb", lambda *a: events.append(a))
    q(db, ":create ucb {k}")
    assert db.unregister_callback(cb_id) is True
    q(db, "?[k] <- [[1]] :put ucb {k}")
    assert events == []

    db.register_fixed_rule("Tmp", SimpleFixedRule("Tmp", 1, lambda i, o: [[1]]))
    assert q(db, "?[x] <~ Tmp()").rows == [[1]]
    assert db.unregister_fixed_rule("Tmp") is True
    with pytest.raises(CozoError):
        q(db, "?[x] <~ Tmp()")
    with pytest.raises(CozoError):
        db.unregister_fixed_rule("PageRank")  # builtin protected


def test_kill_running_query(db):
    import threading
    import time

    q(db, "?[a] <- $rows :create killme {a}", {"rows": [[i] for i in range(300)]})
    errs = []

    def slow():
        try:
            db.run_script(
                "?[count(x)] := *killme[a], *killme[b], *killme[c], "
                "x = a + b + c"
            )
        except CozoError as e:
            errs.append(e.code)

    t = threading.Thread(target=slow)
    t.start()
    time.sleep(0.3)
    res = db.run_script("::running")
    if res.rows:
        db.run_script(f"::kill {res.rows[0][0]}")
    t.join(timeout=30)
    assert errs and errs[0] == "query::killed"
