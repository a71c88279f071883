"""Bulk vector `:put` lane (`query/fastpath._try_bulk_vector_put`).

Pins the vectorized memcmp encoding — including the r5 in-place
order-bit transform — byte-for-byte against the generic per-value
encoder, and the set-semantics dedup winner against the generic
cmp_key dedup.  Reference parity anchor: `cozo-core/src/data/memcmp.rs`
(order-preserving float encoding) + `runtime/relation.rs` put
semantics.
"""

import numpy as np
import pytest

from cozo_tpu.data.memcmp import encode_value
from cozo_tpu.data.value import Vector
from cozo_tpu.runtime.db import Db

D = 8

EDGE_F32 = np.array(
    [
        0.0,
        -0.0,
        1.5,
        -1.5,
        np.inf,
        -np.inf,
        np.float32(1e-40),  # denormal
        np.finfo(np.float32).max,
    ],
    dtype=np.float32,
)


@pytest.fixture
def db():
    d = Db("mem")
    d.run_script(f":create item {{id: Int => v: <F32; {D}>}}")
    return d


def _stored_vec(db, i):
    r = db.run_script("?[v] := *item{id, v}, id == $i", {"i": i})
    v = r.rows[0][0]
    return v.a if isinstance(v, Vector) else np.asarray(v, np.float32)


def test_bitexact_roundtrip_edge_floats(db):
    rows = [[0, EDGE_F32], [1, -EDGE_F32]]
    db.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": rows})
    for i, src in enumerate([EDGE_F32, -EDGE_F32]):
        got = np.asarray(_stored_vec(db, i), np.float32)
        assert np.array_equal(got.view(np.uint32), src.view(np.uint32)), i


def test_nan_roundtrip(db):
    v = np.full(D, np.nan, dtype=np.float32)
    db.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": [[7, v]]})
    got = np.asarray(_stored_vec(db, 7), np.float32)
    assert np.isnan(got).all()


def test_encoded_bytes_match_generic_encoder(db):
    """The bulk lane's value bytes must equal encode_value(Vector) —
    the codec invariant the dedup and all scans rely on."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(32, D)).astype(np.float32)
    vecs[0] = EDGE_F32
    rows = [[int(i), vecs[i]] for i in range(32)]
    db.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": rows})
    from cozo_tpu.runtime.relation import rel_prefix, rel_upper

    tx = db._new_session(False, 0)
    try:
        h = tx.get_relation("item")
        st = tx.store_tx_for(h)
        stored = dict(st.range_scan(rel_prefix(h.id), rel_upper(h.id)))
    finally:
        tx.abort()
    assert len(stored) == 32
    by_bytes = sorted(stored.values())

    def enc(v):
        buf = bytearray()
        encode_value(buf, Vector(v))
        return bytes(buf)

    generic = sorted(enc(vecs[i]) for i in range(32))
    assert by_bytes == generic


def test_dup_key_winner_matches_generic_path():
    """Duplicate ids in one batch: winner = lexicographically largest
    encoded row, identical to the generic cmp_key dedup."""
    a = Db("mem")
    b = Db("mem")
    for d in (a, b):
        d.run_script(f":create item {{id: Int => v: <F32; {D}>}}")
    v1 = np.full(D, 1.0, dtype=np.float32)
    v2 = np.full(D, 2.0, dtype=np.float32)
    rows = [[5, v1], [5, v2], [5, v1]]
    # bulk lane (ndarray values)
    a.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": rows})
    # generic path (plain lists force the fallback)
    b.run_script(
        "?[id, v] <- $rows :put item {id => v}",
        {"rows": [[i, v.tolist()] for i, v in rows]},
    )
    va = np.asarray(_stored_vec(a, 5), np.float32)
    vb = np.asarray(_stored_vec(b, 5), np.float32)
    assert np.array_equal(va, vb)


def test_f64_lane(db):
    db.run_script(f":create item64 {{id: Int => v: <F64; {D}>}}")
    vecs = np.array([EDGE_F32.astype(np.float64), -EDGE_F32.astype(np.float64)])
    rows = [[int(i), vecs[i]] for i in range(2)]
    db.run_script("?[id, v] <- $rows :put item64 {id => v}", {"rows": rows})
    r = db.run_script("?[id, v] := *item64{id, v}")
    assert len(r.rows) == 2
    for i, v in r.rows:
        a = v.a if isinstance(v, Vector) else np.asarray(v, np.float64)
        assert np.array_equal(
            np.asarray(a, np.float64).view(np.uint64),
            vecs[i].view(np.uint64),
        )
