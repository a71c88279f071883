"""Packed KV image for large HNSW indexes (`runtime/hnsw_packed.py`).

The reference persists HNSW as one row per edge (`/root/reference/
cozo-core/src/runtime/hnsw.rs:679`); past `COZO_TPU_PACKED_KV_MIN` the
TPU rebuild persists the neighbor arrays as chunked blobs and serves the
index relation as a virtual view.  These tests pin the contract: readers
can never tell the two storage modes apart.
"""

import os
import tempfile

import numpy as np
import pytest

from cozo_tpu import Db

N, D = 60, 4
RNG = np.random.default_rng(7)
VECS = RNG.normal(size=(N + 8, D)).astype(np.float32)
ROWS = [[i, list(map(float, VECS[i]))] for i in range(N)]


def _build(packed_min, engine="mem", path=None):
    os.environ["COZO_TPU_PACKED_KV_MIN"] = str(packed_min)
    try:
        db = Db(engine, path) if path else Db(engine)
        db.run_script(":create pts {id: Int => v: <F32; 4>}")
        db.run_script("?[id, v] <- $rows :put pts {id => v}", {"rows": ROWS})
        db.run_script(
            "::hnsw create pts:idx {dim: 4, m: 8, ef_construction: 32, "
            "fields: [v], distance: L2}"
        )
        return db
    finally:
        os.environ.pop("COZO_TPU_PACKED_KV_MIN", None)


def _full_scan(db):
    return sorted(
        map(
            tuple,
            db.run_script(
                "?[layer, fr_id, to_id, dist] := "
                "*pts:idx{layer, fr_id, to_id, dist}"
            ).rows,
        )
    )


def _is_packed(db):
    import cozo_tpu.runtime.hnsw_packed as hp

    tx = db._new_session(False, 0)
    try:
        h = tx.get_relation("pts:idx")
        return h.packed_src is not None and hp.read_packed_meta(
            tx.store_tx_for(h), "pts", "idx"
        ) is not None
    finally:
        tx.abort()


def _mutate(db):
    db.run_script(
        "?[id, v] <- [[100, $v]] :put pts {id => v}",
        {"v": list(map(float, VECS[N]))},
    )
    db.run_script(
        "?[id, v] <- [[3, $v]] :put pts {id => v}",  # vector update
        {"v": list(map(float, VECS[N + 1]))},
    )
    db.run_script("?[id] <- [[5]] :rm pts {id}")


def test_packed_scan_parity_with_row_image():
    dbp, dbr = _build(10), _build(10**9)
    assert _is_packed(dbp) and not _is_packed(dbr)
    assert _full_scan(dbp) == _full_scan(dbr)
    # count goes through the fastpath; must see virtual rows
    cp = dbp.run_script("?[count(fr_id)] := *pts:idx{layer, fr_id, to_id}")
    cr = dbr.run_script("?[count(fr_id)] := *pts:idx{layer, fr_id, to_id}")
    assert cp.rows == cr.rows


def test_packed_point_and_prefix_reads():
    dbp, dbr = _build(10), _build(10**9)
    for db in (dbp, dbr):
        db.r3 = sorted(
            map(
                tuple,
                db.run_script(
                    "?[to_id, dist] := *pts:idx{layer: 0, fr_id: 3, to_id, dist}"
                ).rows,
            )
        )
    assert dbp.r3 == dbr.r3 and len(dbp.r3) >= 2
    # self-membership row point-read
    for db in (dbp, dbr):
        got = db.run_script(
            "?[dist] := *pts:idx{layer: 0, fr_id: 3, fr_field: 0, "
            "to_id: 3, to_field: 0, dist}"
        ).rows
        assert got == [[0.0]]


def test_packed_search_and_mutations_match_row_image():
    dbp, dbr = _build(10), _build(10**9)
    _mutate(dbp)
    _mutate(dbr)
    q = list(map(float, VECS[7]))
    res = []
    for db in (dbp, dbr):
        res.append(
            sorted(
                map(
                    tuple,
                    db.run_script(
                        "?[id, d] := ~pts:idx{id | query: vec($q), k: 8, "
                        "ef: 48, bind_distance: d}",
                        {"q": q},
                    ).rows,
                )
            )
        )
    assert res[0] == res[1]
    sp, sr = _full_scan(dbp), _full_scan(dbr)
    assert sp == sr
    assert not any(r[1] == 5 or r[2] == 5 for r in sp)
    assert any(r[1] == 100 for r in sp)


def test_packed_rebuild_after_reopen():
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "t.db")
    db1 = _build(10, "sqlite", path)
    assert _is_packed(db1)
    _mutate(db1)
    scan1 = _full_scan(db1)
    q = list(map(float, VECS[7]))
    s1 = sorted(
        map(
            tuple,
            db1.run_script(
                "?[id, d] := ~pts:idx{id | query: vec($q), k: 8, ef: 48, "
                "bind_distance: d}",
                {"q": q},
            ).rows,
        )
    )
    del db1
    db2 = Db("sqlite", path)
    assert _full_scan(db2) == scan1
    s2 = sorted(
        map(
            tuple,
            db2.run_script(
                "?[id, d] := ~pts:idx{id | query: vec($q), k: 8, ef: 48, "
                "bind_distance: d}",
                {"q": q},
            ).rows,
        )
    )
    assert s2 == s1
    # post-pack insert must survive the rebuild (fresh slot from overlay)
    assert any(r[0] == 100 for r in s2) or db2.run_script(
        "?[dist] := *pts:idx{layer: 0, fr_id: 100, fr_field: 0, "
        "to_id: 100, to_field: 0, dist}"
    ).rows == [[0.0]]


def test_packed_backup_restore(tmp_path):
    """`backup_db` streams the raw KV range, so packed blobs + overlay
    + canary travel with it; the restored db serves identical scans."""
    db = _build(10)
    _mutate(db)
    scan1 = _full_scan(db)
    bk = str(tmp_path / "b.db")
    db.backup_db(bk)
    db2 = Db("mem")
    db2.restore_backup(bk)
    assert _full_scan(db2) == scan1
    q = list(map(float, VECS[7]))
    r = db2.run_script(
        "?[id, d] := ~pts:idx{id | query: vec($q), k: 5, ef: 32, "
        "bind_distance: d}",
        {"q": q},
    ).rows
    assert len(r) == 5


def test_packed_drop_cleans_blobs():
    import cozo_tpu.runtime.hnsw_packed as hp

    db = _build(10)
    assert _is_packed(db)
    db.run_script("::index drop pts:idx")
    tx = db._new_session(False, 0)
    try:
        p = hp._pfx("pts", "idx")
        assert list(tx.store_tx.range_scan(p, p + b"\xff" * 8)) == []
    finally:
        tx.abort()
    # relation destroy also cleans (fresh packed build, then ::remove)
    os.environ["COZO_TPU_PACKED_KV_MIN"] = "10"
    try:
        db.run_script(
            "::hnsw create pts:idx {dim: 4, m: 8, ef_construction: 32, "
            "fields: [v], distance: L2}"
        )
    finally:
        os.environ.pop("COZO_TPU_PACKED_KV_MIN", None)
    db.run_script("::remove pts")
    tx = db._new_session(False, 0)
    try:
        p = hp._pfx("pts", "idx")
        assert list(tx.store_tx.range_scan(p, p + b"\xff" * 8)) == []
    finally:
        tx.abort()


@pytest.mark.parametrize("engine", ["tkv", "plog"])
def test_packed_rebuild_on_native_engines(engine, tmp_path):
    """Packed blobs + overlay round-trip through the C++ LSM (tkv) and
    the WAL+snapshot engine (plog), including reopen."""
    path = str(tmp_path / f"t.{engine}")
    db1 = _build(10, engine, path)
    assert _is_packed(db1)
    _mutate(db1)
    scan1 = _full_scan(db1)
    del db1
    db2 = Db(engine, path)
    assert _full_scan(db2) == scan1
    q = list(map(float, VECS[7]))
    r = db2.run_script(
        "?[id, d] := ~pts:idx{id | query: vec($q), k: 5, ef: 32, "
        "bind_distance: d}",
        {"q": q},
    ).rows
    assert len(r) == 5


def test_proximity_graph_algo_on_packed_index():
    """Fixed rules consuming the packed proximity graph (BASELINE config
    5 shape: community detection over `*pts:idx{layer: 0, ...}`)."""
    dbp, dbr = _build(10), _build(10**9)
    script = (
        "nodes[fr_id, to_id] := *pts:idx{layer: 0, fr_id, to_id}\n"
        "?[id, pr] <~ PageRank(nodes[])\n:order id"
    )
    rp = dbp.run_script(script).rows
    rr = dbr.run_script(script).rows
    assert [r[0] for r in rp] == [r[0] for r in rr]
    for a, b in zip(rp, rr):
        assert abs(a[1] - b[1]) < 1e-6


def test_fixed_rule_pin_fast_staging_parity():
    """`<~ PageRank(*pts:idx{layer: 0, fr_id, to_id})` — the constant-pin
    named-rel arg (parser extension) stages (src, dst) straight from the
    in-memory HNSW adjacency; results must match the rule-staged scan on
    both storage modes, and the fast path must actually engage."""
    import cozo_tpu.query.fixed_payload as fp

    hits = []
    orig = fp.FixedInput._hnsw_layer0_fast

    def spy(self):
        r = orig(self)
        hits.append(r is not None)
        return r

    fp.FixedInput._hnsw_layer0_fast = spy
    try:
        dbp, dbr = _build(10), _build(10**9)
        pin_q = (
            "?[id, pr] <~ PageRank(*pts:idx{layer: 0, fr_id, to_id})\n"
            ":order id"
        )
        rule_q = (
            "nodes[f, t] := *pts:idx{layer: 0, fr_id: f, to_id: t}\n"
            "?[id, pr] <~ PageRank(nodes[])\n:order id"
        )
        r_pin_p = dbp.run_script(pin_q).rows
        r_rule = dbp.run_script(rule_q).rows
        r_pin_r = dbr.run_script(pin_q).rows
        assert hits[0] and hits[-1]  # fast staging engaged on both modes
        assert [r[0] for r in r_pin_p] == [r[0] for r in r_rule]
        for a, b in zip(r_pin_p, r_rule):
            assert abs(a[1] - b[1]) < 1e-9
        for a, b in zip(r_pin_p, r_pin_r):
            assert abs(a[1] - b[1]) < 1e-9
    finally:
        fp.FixedInput._hnsw_layer0_fast = orig
