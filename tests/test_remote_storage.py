"""Remote (tikv-analog) storage engine: client/server protocol, engine
semantics through the full Db, and optimistic conflict detection.

Reference anchor: `/root/reference/cozo-core/src/storage/tikv.rs`.
"""

import pytest

from cozo_tpu.storage.base import ConflictError
from cozo_tpu.storage.mem import MemStorage
from cozo_tpu.storage.remote import KvServer, RemoteStorage, SCAN_BATCH


@pytest.fixture()
def server():
    srv = KvServer(MemStorage())
    srv.start_background()
    yield srv
    srv.shutdown()


def _addr(srv):
    return f"{srv.addr[0]}:{srv.addr[1]}"


def test_kv_roundtrip_and_scans(server):
    st = RemoteStorage(_addr(server))
    tx = st.transact(write=True)
    n = SCAN_BATCH * 2 + 17  # force multi-batch cursor scans
    for i in range(n):
        tx.put(b"k%06d" % i, b"v%d" % i)
    tx.commit()

    tx = st.transact()
    assert tx.get(b"k000005") == b"v5"
    assert tx.get(b"missing") is None
    rows = list(tx.range_scan(b"k", b"l"))
    assert len(rows) == n
    assert rows == sorted(rows)
    rev = list(tx.range_scan_rev(b"k", b"l"))
    assert rev == rows[::-1]
    assert tx.range_count(b"k", b"l") == n
    assert tx.seek_first(b"k000100", b"l") == (b"k000100", b"v100")
    tx.abort()

    # overlay merge: uncommitted writes interleave with remote base
    tx = st.transact(write=True)
    tx.put(b"k000000x", b"mid")
    tx.delete(b"k000001")
    got = [k for k, _ in tx.range_scan(b"k000000", b"k000003")]
    assert got == [b"k000000", b"k000000x", b"k000002"]
    tx.abort()

    st.del_range(b"k000000", b"k000010")
    tx = st.transact()
    assert tx.get(b"k000005") is None
    assert tx.get(b"k000010") == b"v10"
    tx.abort()
    st.close()


def test_batch_put_streams(server):
    st = RemoteStorage(_addr(server))
    big = b"x" * 4096
    st.batch_put([(b"b%05d" % i, big) for i in range(3000)])  # >4MB: chunks
    tx = st.transact()
    assert tx.range_count(b"b", b"c") == 3000
    tx.abort()
    st.close()


def test_occ_lost_update_conflict(server):
    st1 = RemoteStorage(_addr(server))
    st2 = RemoteStorage(_addr(server))
    tx = st1.transact(write=True)
    tx.put(b"counter", b"0")
    tx.commit()

    t1 = st1.transact(write=True)
    t2 = st2.transact(write=True)
    assert t1.get(b"counter", for_update=True) == b"0"
    assert t2.get(b"counter", for_update=True) == b"0"
    t1.put(b"counter", b"1")
    t2.put(b"counter", b"1")
    t1.commit()
    with pytest.raises(ConflictError):
        t2.commit()
    st1.close()
    st2.close()


def test_occ_delete_after_snapshot(server):
    st1 = RemoteStorage(_addr(server))
    st2 = RemoteStorage(_addr(server))
    tx = st1.transact(write=True)
    tx.put(b"doomed", b"1")
    tx.commit()

    t2 = st2.transact(write=True)
    assert t2.get(b"doomed", for_update=True) == b"1"
    t1 = st1.transact(write=True)
    t1.delete(b"doomed")
    t1.commit()
    t2.put(b"doomed", b"2")
    with pytest.raises(ConflictError):
        t2.commit()
    st1.close()
    st2.close()


def test_db_end_to_end_over_remote(server):
    from cozo_tpu.runtime.db import Db

    db = Db("remote", _addr(server))
    db.run_script(":create person {id: Int => name: String, age: Int}")
    db.run_script(
        "?[id, name, age] <- [[1, 'ann', 30], [2, 'bob', 41], [3, 'cy', 25]] "
        ":put person {id => name, age}"
    )
    out = db.run_script("?[name] := *person{age, name}, age > 28")
    assert sorted(r[0] for r in out.rows) == ["ann", "bob"]

    # lateral index DDL + indexed query over the remote engine
    db.run_script("::index create person:by_age {age}")
    out = db.run_script("?[id] := *person{id, age: 41}")
    assert [r[0] for r in out.rows] == [2]

    # a second client sees committed state (shared remote storage)
    db2 = Db("remote", _addr(server))
    out = db2.run_script("?[count(id)] := *person{id}")
    assert out.rows[0][0] == 3
    db2.run_script("?[id, name, age] <- [[4, 'dee', 55]] :put person {id => name, age}")
    out = db.run_script("?[name] := *person{id: 4, name}")
    assert out.rows[0][0] == "dee"

    # datalog recursion through the remote engine
    db.run_script(":create edge {f: Int, t: Int}")
    db.run_script("?[f, t] <- [[1,2],[2,3],[3,4]] :put edge {f, t}")
    out = db.run_script(
        "reach[x, y] := *edge{f: x, t: y}\n"
        "reach[x, y] := reach[x, z], *edge{f: z, t: y}\n"
        "?[y] := reach[1, y]"
    )
    assert sorted(r[0] for r in out.rows) == [2, 3, 4]


def test_concurrent_db_writers_conflict_detected(server):
    """Two Db instances (separate 'processes' sharing the remote store)
    race a read-modify-write on the same cell; Db-level per-relation
    locks don't span clients, so the server's OCC must reject the
    second commit (deterministic interleave via multi-transactions)."""
    from cozo_tpu.runtime.db import Db

    db1 = Db("remote", _addr(server))
    db1.run_script(":create cell {k: Int => v: Int}")
    db1.run_script("?[k, v] <- [[0, 0]] :put cell {k => v}")
    db2 = Db("remote", _addr(server))

    bump = (
        "?[k, v] := *cell{k: 0, v: old}, k = 0, v = old + 1 "
        ":update cell {k => v}"
    )
    t1 = db1.multi_transaction()
    t2 = db2.multi_transaction()
    t1.run_script(bump)
    t2.run_script(bump)
    t1.commit()
    with pytest.raises(Exception, match="[Cc]onflict"):
        t2.commit()
    out = db1.run_script("?[v] := *cell{k: 0, v}")
    assert out.rows[0][0] == 1


def _mk_vec_db(addr):
    from cozo_tpu.runtime.db import Db

    db = Db("remote", addr)
    return db


def test_hnsw_cross_client_visibility(server):
    """Two Db processes share an HNSW index through the remote store;
    the canary version (reference `runtime/hnsw.rs:660-669` analog)
    invalidates the second client's in-memory cache when the first
    mutates the index."""
    db1 = _mk_vec_db(_addr(server))
    db1.run_script(":create doc {id: Int => v: <F32; 4>}")
    db1.run_script(
        "?[id, v] <- [[0, [1.0,0.0,0.0,0.0]], [1, [0.0,1.0,0.0,0.0]]] "
        ":put doc {id => v}"
    )
    db1.run_script(
        "::hnsw create doc:ix {dim: 4, m: 4, dtype: F32, fields: [v], "
        "distance: L2, ef_construction: 16}"
    )
    db2 = _mk_vec_db(_addr(server))
    out = db2.run_script(
        "?[id] := ~doc:ix{id | query: vec([1.0,0.0,0.0,0.0]), k: 1, ef: 8}"
    )
    assert [r[0] for r in out.rows] == [0]  # db2 cache now built

    # db1 inserts a closer vector; db2 must observe it (stale cache rebuilt)
    db1.run_script(
        "?[id, v] <- [[9, [0.9,0.1,0.0,0.0]]] :put doc {id => v}"
    )
    out = db2.run_script(
        "?[id] := ~doc:ix{id | query: vec([0.9,0.1,0.0,0.0]), k: 1, ef: 8}"
    )
    assert [r[0] for r in out.rows] == [9]

    # and deletes propagate too
    db1.run_script("?[id] <- [[0]] :rm doc {id}")
    out = db2.run_script(
        "?[id] := ~doc:ix{id | query: vec([1.0,0.0,0.0,0.0]), k: 2, ef: 8}"
    )
    assert 0 not in {r[0] for r in out.rows}


def test_hnsw_concurrent_writers_conflict(server):
    """Concurrent structural mutations of the same index from two
    clients: the canary's for_update read-modify-write must make the
    second commit fail under the server's OCC."""
    db1 = _mk_vec_db(_addr(server))
    db1.run_script(":create emb {id: Int => v: <F32; 4>}")
    db1.run_script(
        "?[id, v] <- [[0, [1.0,0.0,0.0,0.0]]] :put emb {id => v}"
    )
    db1.run_script(
        "::hnsw create emb:ix {dim: 4, m: 4, dtype: F32, fields: [v], "
        "distance: L2, ef_construction: 16}"
    )
    db2 = _mk_vec_db(_addr(server))
    # warm both caches
    for d in (db1, db2):
        d.run_script(
            "?[id] := ~emb:ix{id | query: vec([1.0,0.0,0.0,0.0]), k: 1, ef: 8}"
        )
    t1 = db1.multi_transaction()
    t2 = db2.multi_transaction()
    t1.run_script("?[id, v] <- [[10, [0.5,0.5,0.0,0.0]]] :put emb {id => v}")
    t2.run_script("?[id, v] <- [[11, [0.5,0.0,0.5,0.0]]] :put emb {id => v}")
    t1.commit()
    with pytest.raises(Exception, match="[Cc]onflict"):
        t2.commit()
    # loser retries on a fresh tx and succeeds; index sees both worlds
    db2.run_script("?[id, v] <- [[11, [0.5,0.0,0.5,0.0]]] :put emb {id => v}")
    out = db1.run_script(
        "?[id] := ~emb:ix{id | query: vec([0.5,0.0,0.5,0.0]), k: 1, ef: 8}"
    )
    assert [r[0] for r in out.rows] == [11]


def test_multi_get_batches_one_round_trip(server):
    st = RemoteStorage(_addr(server))
    tx = st.transact(write=True)
    for i in range(20):
        tx.put(b"m%02d" % i, b"v%d" % i)
    tx.commit()

    tx = st.transact(write=True)
    tx.put(b"m05", b"overlaid")
    tx.delete(b"m06")
    got = tx.multi_get([b"m01", b"m05", b"m06", b"nope", b"m19"])
    assert got == [b"v1", b"overlaid", None, None, b"v19"]
    tx.abort()
    st.close()
