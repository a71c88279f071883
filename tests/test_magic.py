"""Magic-set rewrite tests (reference `query/magic.rs` semantics:
same results, demand-restricted evaluation)."""

import pytest

from cozo_tpu import Db
from cozo_tpu.query.magic import magic_rewrite
from cozo_tpu.query.normalize import normalize_program
from cozo_tpu.parse.parser import parse_script


@pytest.fixture()
def db():
    d = Db("mem")
    edges = [[i, i + 1] for i in range(50)] + [[100 + i, 100 + i + 1] for i in range(50)]
    d.run_script("?[f, t] <- $e :create e {f, t}", {"e": edges})
    return d


TC = """
tc[a, b] := *e[a, b]
tc[a, c] := tc[a, b], *e[b, c]
?[b] := tc[1, b]
"""


def test_magic_same_results(db):
    with_magic = db.run_script(TC)
    without = db.run_script(TC + " :disable_magic_rewrite true")
    assert with_magic.rows == without.rows
    assert len(with_magic.rows) == 49


def test_magic_rewrites_program():
    prog = parse_script(TC).prog
    nf = magic_rewrite(normalize_program(prog))
    names = set(nf.prog)
    assert any(n.startswith("*magic*tc|bf") for n in names)
    assert "tc|bf" in names


def test_magic_not_applied_without_bound_calls():
    prog = parse_script("r[a] := a in [1,2]; ?[a] := r[a]").prog
    nf0 = normalize_program(prog)
    nf = magic_rewrite(nf0)
    assert nf is nf0  # untouched


def test_magic_aggr_exempt(db):
    # aggregations must see the full extension even when called bound-ish
    script = """
    cnt[a, count(b)] := *e[a, b]
    ?[c] := cnt[1, c]
    """
    r1 = db.run_script(script)
    r2 = db.run_script(script + " :disable_magic_rewrite true")
    assert r1.rows == r2.rows == [[1]]


def test_magic_negation_exempt(db):
    script = """
    reach[b] := *e[1, b]
    reach[c] := reach[b], *e[b, c]
    other[x] := *e[x, y], x > 25
    ?[b] := reach[b], not other[b]
    """
    r1 = db.run_script(script)
    r2 = db.run_script(script + " :disable_magic_rewrite true")
    assert r1.rows == r2.rows


def test_magic_mutual_recursion(db):
    script = """
    even[a, b] := *e[a, b]
    even[a, c] := odd[a, b], *e[b, c]
    odd[a, c] := even[a, b], *e[b, c]
    ?[b] := odd[1, b]
    """
    r1 = db.run_script(script)
    r2 = db.run_script(script + " :disable_magic_rewrite true")
    assert r1.rows == r2.rows


def test_magic_multiple_adornments(db):
    script = """
    tc[a, b] := *e[a, b]
    tc[a, c] := tc[a, b], *e[b, c]
    ?[x, y] := tc[1, x], tc[x, y]
    """
    r1 = db.run_script(script)
    r2 = db.run_script(script + " :disable_magic_rewrite true")
    assert sorted(map(tuple, r1.rows)) == sorted(map(tuple, r2.rows))


def test_magic_const_seed(db):
    script = """
    p[a, b] := *e[a, b]
    ?[b] := p[3, b]
    """
    r1 = db.run_script(script)
    assert r1.rows == [[4]]
