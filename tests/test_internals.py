"""Algorithm-local invariants (mirrors the reference's inline #[cfg(test)]
mods: HNSW level distribution hnsw.rs:1015, stratifier stratify.rs:311)."""

import numpy as np
import pytest

from cozo_tpu.data.value import Validity, cmp_key
from cozo_tpu.models.hnsw_index import HnswIndex
from cozo_tpu.parse.parser import parse_script
from cozo_tpu.query.normalize import normalize_program
from cozo_tpu.query.stratify import stratify_program
from cozo_tpu.utils.errors import CozoError


def test_hnsw_level_distribution():
    idx = HnswIndex(dim=2, m=16)
    levels = [idx.random_level() for _ in range(50_000)]
    counts = {}
    for l in levels:
        counts[l] = counts.get(l, 0) + 1
    # geometric decay with ratio ~1/m
    assert counts[0] > 0.9 * 50_000
    assert 0 < counts.get(1, 0) < 50_000 / 8


def test_stratifier_orders_dependencies_first():
    prog = parse_script(
        """
        base[a] <- [[1], [2]]
        derived[a] := base[a]
        agg[count(a)] := derived[a]
        ?[c] := agg[c]
        """
    ).prog
    strata = stratify_program(normalize_program(prog))
    order = []
    for s in strata:
        order.extend(s.keys())
    assert order.index("base") < order.index("derived")
    assert order.index("derived") < order.index("agg")
    assert order.index("agg") < order.index("?")


def test_stratifier_mutual_recursion_same_stratum():
    prog = parse_script(
        """
        p[a] := q[a]
        p[a] := a in [1]
        q[a] := p[a], a < 10
        ?[a] := p[a]
        """
    ).prog
    strata = stratify_program(normalize_program(prog))
    for s in strata:
        if "p" in s:
            assert "q" in s


def test_unsafe_rule_detection():
    with pytest.raises(CozoError):
        normalize_program(parse_script("?[x] := not r[x]; r[a] <- [[1]]").prog)
    with pytest.raises(CozoError):
        normalize_program(parse_script("?[x] := y > 1").prog)


def test_validity_storage_order():
    """In encoded keys, newer validity sorts first within a key group."""
    from cozo_tpu.data.memcmp import encode_value

    def enc(v):
        buf = bytearray()
        encode_value(buf, v)
        return bytes(buf)

    assert enc(Validity(200, True)) < enc(Validity(100, True))
    assert enc(Validity(100, True)) < enc(Validity(100, False))


def test_heterogeneous_tuple_order_consistency():
    """Byte order of encoded tuples == cmp_key order for mixed-type rows
    within the same leading type."""
    from cozo_tpu.data.memcmp import encode_tuple

    rows = [
        [1, "b"],
        [1, "a"],
        [1, 5],
        [1, 5.5],
        [1, None],
        [1, True],
        [1, [1, 2]],
        [1, b"x"],
        [2, "a"],
    ]
    by_bytes = sorted(rows, key=encode_tuple)
    # null < bool < num < str < bytes < list per storage tags… except Vec
    # (checked separately); here verify groups are contiguous & nums sorted
    second = [r[1] for r in by_bytes if r[0] == 1]
    type_seq = [type(v).__name__ for v in second]
    seen = []
    for t in type_seq:
        if not seen or seen[-1] != t:
            seen.append(t)
    assert len(seen) == len(set(seen)), f"type groups interleaved: {type_seq}"


def test_hnsw_entry_repair_after_mass_delete():
    rng = np.random.default_rng(0)
    idx = HnswIndex(dim=4, m=8, ef_construction=20)
    slots = [idx.insert(v) for v in rng.standard_normal((100, 4)).astype(np.float32)]
    # delete the top half incl. likely entry points
    for s in slots[:50]:
        idx.remove(s)
    assert idx.entry >= 0 and idx.alive[idx.entry]
    q = rng.standard_normal(4).astype(np.float32)
    ids, _ = idx.search(q[None], k=5, ef=20, use_tpu=False)
    assert all(i >= 0 for i in ids[0])
    assert all(idx.alive[i] for i in ids[0])
