"""Coverage for auxiliary features: access levels, :returning, time travel
keywords, imperative statements, multi-index relations, timeouts, json."""

import time

import numpy as np
import pytest

from cozo_tpu import Db
from cozo_tpu.utils.errors import CozoError


@pytest.fixture()
def db():
    return Db("mem")


def test_access_levels(db):
    db.run_script(":create guarded {a}")
    db.run_script("?[a] <- [[1]] :put guarded {a}")
    db.run_script("::access_level read_only guarded")
    with pytest.raises(CozoError):
        db.run_script("?[a] <- [[2]] :put guarded {a}")
    assert db.run_script("?[a] := *guarded[a]").rows == [[1]]
    db.run_script("::access_level hidden guarded")
    with pytest.raises(CozoError):
        db.run_script("?[a] := *guarded[a]")
    db.run_script("::access_level normal guarded")
    db.run_script("?[a] <- [[2]] :put guarded {a}")
    # removal protection
    db.run_script("::access_level protected guarded")
    with pytest.raises(CozoError):
        db.run_script("::remove guarded")


def test_returning(db):
    db.run_script(":create ret {k => v}")
    res = db.run_script("?[k, v] <- [[1, 2]] :put ret {k => v} :returning")
    assert res.headers == ["_kind", "k", "v"]
    assert res.rows == [["inserted", 1, 2]]
    res = db.run_script("?[k] <- [[1]] :rm ret {k} :returning")
    assert res.rows[0][0] == "deleted"


def test_describe(db):
    db.run_script(":create desc_rel {a}")
    db.run_script("::describe desc_rel 'my relation'")
    res = db.run_script("::relations")
    row = [r for r in res.rows if r[0] == "desc_rel"][0]
    assert row[-1] == "my relation"


def test_timeout(db):
    db.run_script("?[a] <- [[1]] :create big {a}")
    with pytest.raises(CozoError):
        db.run_script(
            """
            nums[x] := x in int_range(400)
            ?[count(s)] := nums[a], nums[b], nums[c], s = a + b + c
            :timeout 0.2
            """
        )


def test_sleep_option(db):
    t0 = time.time()
    db.run_script("?[a] <- [[1]] :sleep 0.2")
    assert time.time() - t0 >= 0.2


def test_time_travel_keywords(db):
    db.run_script(":create tt {k: String, at: Validity => v: Int}")
    db.run_script(
        "?[k, at, v] <- [['x', 'ASSERT', 1]] :put tt {k, at => v}"
    )
    res = db.run_script("?[v] := *tt{k: 'x', v @ 'NOW'}")
    assert res.rows == [[1]]
    res = db.run_script("?[v] := *tt{k: 'x', v @ 'END'}")
    assert res.rows == [[1]]
    # retraction hides the fact from then on
    db.run_script("?[k, at, v] <- [['x', 'RETRACT', 0]] :put tt {k, at => v}")
    res = db.run_script("?[v] := *tt{k: 'x', v @ 'NOW'}")
    assert res.rows == []


def test_imperative_swap_debug_ignore(db, capsys):
    res = db.run_script(
        """
        {?[a] <- [[1]] :replace _l {a}}
        {?[a] <- [[2]] :replace _r {a}}
        %swap _l _r
        %debug _l
        %ignore_error { ?[a] := *nonexistent[a] :replace _x {a} }
        %return _l
        """
    )
    assert res.rows == [[2]]
    assert "_l" in capsys.readouterr().out


def test_imperative_if_not_and_chained_return(db):
    res = db.run_script(
        """
        {?[a] <- [] :replace _empty {a}}
        %if_not _empty
            %then {?[a] <- [[7]] :replace _out {a}}
        %end
        %return _out, _empty
        """
    )
    assert res.rows == [[7]]
    assert res.next is not None and res.next.rows == []


def test_multi_index_same_relation(db):
    rng = np.random.default_rng(0)
    db.run_script(
        ":create item {id: Int => label: String, emb: <F32; 4>}"
    )
    rows = [[i, f"label {i} text", rng.standard_normal(4).tolist()] for i in range(20)]
    db.run_script("?[id, label, emb] <- $rows :put item {id => label, emb}", {"rows": rows})
    db.run_script("::hnsw create item:vec {dim: 4, m: 8, ef_construction: 20, fields: [emb]}")
    db.run_script("::fts create item:ft {extractor: label, tokenizer: Simple}")
    db.run_script("::index create item:by_label {label}")
    # all three maintained on one write
    db.run_script(
        "?[id, label, emb] <- [[99, 'special marker', $e]] :put item {id => label, emb}",
        {"e": rng.standard_normal(4).tolist()},
    )
    assert db.run_script("?[id] := ~item:ft{id | query: 'special', k: 5}").rows == [[99]]
    assert db.run_script("?[id] := *item{id, label: 'special marker'}").rows == [[99]]
    res = db.run_script(
        "?[id] := ~item:vec{id | query: q, k: 1, ef: 10}, q = vec($e)",
        {"e": rows[5][2]},
    )
    assert res.rows == [[5]]
    rels = db.run_script("::indices item")
    assert {r[0] for r in rels.rows} == {"vec", "ft", "by_label"}


def test_json_column_roundtrip(db):
    db.run_script(":create jdoc {k: Int => doc: Json}")
    db.run_script(
        "?[k, doc] <- [[1, parse_json('{\"a\": {\"b\": 2}}')]] :put jdoc {k => doc}"
    )
    res = db.run_script("?[x] := *jdoc[1, doc], x = doc->'a'->'b'")
    assert res.rows == [[2]]


def test_vec_f64_index(db):
    rng = np.random.default_rng(1)
    db.run_script(":create dv {id: Int => v: <F64; 4>}")
    rows = [[i, rng.standard_normal(4).tolist()] for i in range(10)]
    db.run_script("?[id, v] <- $rows :put dv {id => v}", {"rows": rows})
    db.run_script(
        "::hnsw create dv:idx {dim: 4, m: 8, ef_construction: 16, dtype: F64, "
        "fields: [v], distance: Cosine}"
    )
    res = db.run_script(
        "?[id] := ~dv:idx{id | query: vec($q, 'F64'), k: 1, ef: 8}",
        {"q": rows[3][1]},
    )
    assert res.rows == [[3]]


def test_rules_tolerate_semicolons_and_comments(db):
    res = db.run_script(
        """
        # comment line
        r1[a] <- [[1]]; /* block
        comment */ r2[a] <- [[2]];
        ?[a] := r1[a] or r2[a]
        """
    )
    assert res.rows == [[1], [2]]


def test_run_script_json_roundtrip(db):
    import json

    out = json.loads(db.run_script_json("?[a] := a in [1, 2]"))
    assert out["ok"] is True and out["rows"] == [[1], [2]]
    out = json.loads(db.run_script_json("?[a] := *missing[a]"))
    assert out["ok"] is False and "missing" in out["message"]


def test_ensure_and_ensure_not(db):
    db.run_script(":create ens {k => v}")
    db.run_script("?[k, v] <- [[1, 2]] :put ens {k => v}")
    db.run_script("?[k, v] <- [[1, 2]] :ensure ens {k => v}")
    with pytest.raises(CozoError):
        db.run_script("?[k, v] <- [[1, 3]] :ensure ens {k => v}")
    with pytest.raises(CozoError):
        db.run_script("?[k] <- [[1]] :ensure_not ens {k}")
    db.run_script("?[k] <- [[9]] :ensure_not ens {k}")


def test_replace_preserves_triggers(db):
    db.run_script(":create rp {k}")
    db.run_script(":create rp_log {k}")
    db.run_script("::set_triggers rp on put { ?[k] := _new[k] :put rp_log {k} }")
    db.run_script("?[k] <- [[5]] :replace rp {k}")
    db.run_script("?[k] <- [[6]] :put rp {k}")
    res = db.run_script("?[k] := *rp_log[k]")
    assert [6] in res.rows  # triggers survive :replace (stored.rs:123-125)


def test_rm_trigger_sees_old_rows(db):
    db.run_script(":create rt {k => v}")
    db.run_script(":create rt_graveyard {k => v}")
    db.run_script(
        "::set_triggers rt on rm { ?[k, v] := _old[k, v] :put rt_graveyard {k => v} }"
    )
    db.run_script("?[k, v] <- [[1, 10]] :put rt {k => v}")
    db.run_script("?[k] <- [[1]] :rm rt {k}")
    res = db.run_script("?[k, v] := *rt_graveyard[k, v]")
    assert res.rows == [[1, 10]]


def test_uuid_keys(db):
    db.run_script(":create urel {id: Uuid => v: Int}")
    db.run_script(
        "?[id, v] <- [[to_uuid('f1b2c3d4-aaaa-bbbb-cccc-deadbeef0001'), 7]] "
        ":put urel {id => v}"
    )
    res = db.run_script(
        "?[v] := *urel{id: to_uuid('f1b2c3d4-aaaa-bbbb-cccc-deadbeef0001'), v}"
    )
    assert res.rows == [[7]]


def test_reorder_sort_skip_take(db):
    res = db.run_script(
        "r[a] <- [[5],[3],[1],[4],[2]]; "
        "?[rank, v] <~ ReorderSort(r[a], out: [a], sort_by: a, skip: 1, take: 2)"
    )
    assert res.rows == [[2, 2], [3, 3]]


def test_limit_early_return_correct(db):
    db.run_script("?[a] <- $rows :create big_lim {a}", {"rows": [[i] for i in range(5000)]})
    res = db.run_script("?[a] := *big_lim[a] :limit 3")
    assert len(res.rows) == 3


def test_bytes_values(db):
    db.run_script(":create brel {k: Bytes => v}")
    db.run_script(
        "?[k, v] <- [[decode_base64('AQI='), 1]] :put brel {k => v}"
    )
    res = db.run_script("?[v] := *brel{k: decode_base64('AQI='), v}")
    assert res.rows == [[1]]


def test_list_column_type_enforcement(db):
    db.run_script(":create lrel {k => v: [Int]}")
    db.run_script("?[k, v] <- [[1, [1, 2]]] :put lrel {k => v}")
    with pytest.raises(CozoError):
        db.run_script("?[k, v] <- [[2, 'notalist']] :put lrel {k => v}")


def test_csv_reader(db, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,score\n1,alice,9.5\n2,bob,8.0\nbad,row,x\n")
    res = db.run_script(
        "?[id, name, score] <~ CsvReader(url: $u, "
        "types: ['Int', 'String', 'Float'], has_headers: true)",
        {"u": f"file://{p}"},
    )
    assert sorted(res.rows) == [[1, "alice", 9.5], [2, "bob", 8.0]]


def test_json_reader(db, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2}\n')
    res = db.run_script(
        "?[a, b] <~ JsonReader(url: $u, fields: ['a', 'b'], null_if_absent: true)",
        {"u": f"file://{p}"},
    )
    assert sorted(res.rows, key=str) == [[1, "x"], [2, None]]


def test_labeled_loop_break(db):
    res = db.run_script(
        """
        {?[a] <- [[0]] :replace _c {a}}
        %mark outer
        %loop
            %loop
                {?[a] := *_c[b], a = b + 1 :replace _c {a}}
                %if { ?[x] := *_c[x], x >= 3 }
                    %then %break outer
                %end
            %end
        %end
        %return _c
        """
    )
    assert res.rows == [[3]]


def test_compact_all_engines(tmp_path):
    for engine, path in (("mem", ""), ("sqlite", str(tmp_path / "c.db")),
                         ("tkv", str(tmp_path / "c.tkv"))):
        d = Db(engine, path)
        d.run_script(":create c1 {a}")
        d.run_script("?[a] <- [[1]] :put c1 {a}")
        d.run_script("::compact")
        assert d.run_script("?[a] := *c1[a]").rows == [[1]]
