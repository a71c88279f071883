"""HNSW index tests: recall vs brute force, DDL, maintenance, KV image
(mirrors reference `runtime/tests.rs` test_vec_index* + index parity)."""

import numpy as np
import pytest

from cozo_tpu import Db
from cozo_tpu.models.hnsw_index import HnswIndex


def brute_knn(data, q, k, metric="L2"):
    if metric == "L2":
        d = ((data - q) ** 2).sum(axis=1)
    elif metric == "IP":
        d = 1 - data @ q
    else:
        d = 1 - (data @ q) / (np.linalg.norm(data, axis=1) * np.linalg.norm(q))
    return np.argsort(d, kind="stable")[:k]


def test_hnsw_model_recall_l2():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1200, 32)).astype(np.float32)
    idx = HnswIndex(dim=32, m=16, ef_construction=100, distance="L2")
    for v in data:
        idx.insert(v)
    queries = rng.standard_normal((20, 32)).astype(np.float32)
    hits = 0
    for q in queries:
        ids, dists = idx.search(q[None, :], k=10, ef=64, use_tpu=False)
        truth = set(brute_knn(data, q, 10))
        hits += len(truth & set(ids[0].tolist()))
    recall = hits / (20 * 10)
    assert recall > 0.9, f"recall {recall}"


def test_hnsw_model_recall_cosine():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((1000, 16)).astype(np.float32)
    idx = HnswIndex(dim=16, m=16, ef_construction=100, distance="Cosine")
    for v in data:
        idx.insert(v)
    q = rng.standard_normal(16).astype(np.float32)
    ids, dists = idx.search(q[None, :], k=5, ef=64, use_tpu=False)
    truth = brute_knn(data, q, 5, "Cos")
    assert len(set(ids[0].tolist()) & set(truth.tolist())) >= 4


def test_hnsw_device_search_matches_host():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((600, 24)).astype(np.float32)
    idx = HnswIndex(dim=24, m=8, ef_construction=60, distance="L2")
    for v in data:
        idx.insert(v)
    queries = rng.standard_normal((8, 24)).astype(np.float32)
    ids_d, d_d = idx.search(queries, k=10, ef=64, use_tpu=True)
    hits = 0
    for b, q in enumerate(queries):
        truth = set(brute_knn(data, q, 10).tolist())
        hits += len(truth & set(ids_d[b].tolist()))
    recall = hits / 80
    assert recall > 0.85, f"device recall {recall}"


def test_hnsw_remove():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((300, 8)).astype(np.float32)
    idx = HnswIndex(dim=8, m=8, ef_construction=50)
    slots = [idx.insert(v) for v in data]
    q = data[5]
    ids, _ = idx.search(q[None, :], k=1, ef=32, use_tpu=False)
    assert ids[0, 0] == slots[5]
    idx.remove(slots[5])
    ids, _ = idx.search(q[None, :], k=3, ef=32, use_tpu=False)
    assert slots[5] not in ids[0].tolist()


# --- integration through the DB ------------------------------------------------


@pytest.fixture()
def db():
    return Db("mem")


def seed_vectors(db, n=100, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    db.run_script(f":create vecs {{k: Int => v: <F32; {dim}>}}")
    rows = [[i, data[i].tolist()] for i in range(n)]
    db.run_script(
        "?[k, v] <- $rows :put vecs {k => v}", {"rows": rows}
    )
    return data


def test_hnsw_ddl_and_search(db):
    data = seed_vectors(db, 100, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    res = db.run_script(
        "?[k, d] := ~vecs:idx{k | query: q, k: 5, ef: 30, bind_distance: d}, "
        "q = vec($q)",
        {"q": data[7].tolist()},
    )
    assert res.rows[0][0] == 7 or 7 in [r[0] for r in res.rows]
    top = min(res.rows, key=lambda r: r[1])
    assert top[0] == 7
    assert abs(top[1]) < 1e-5


def test_hnsw_incremental_put(db):
    data = seed_vectors(db, 50, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    newv = (data[3] + 0.0001).tolist()
    db.run_script("?[k, v] <- [[999, $v]] :put vecs {k => v}", {"v": newv})
    res = db.run_script(
        "?[k] := ~vecs:idx{k | query: vec($q), k: 2, ef: 30}",
        {"q": data[3].tolist()},
    )
    ks = [r[0] for r in res.rows]
    assert 3 in ks and 999 in ks


def test_hnsw_rm_row(db):
    data = seed_vectors(db, 50, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    db.run_script("?[k] <- [[7]] :rm vecs {k}")
    res = db.run_script(
        "?[k] := ~vecs:idx{k | query: vec($q), k: 3, ef: 30}",
        {"q": data[7].tolist()},
    )
    assert 7 not in [r[0] for r in res.rows]


def test_hnsw_kv_image_queryable(db):
    seed_vectors(db, 30, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    # the proximity graph is a queryable relation (reference README:52-54)
    res = db.run_script(
        "?[fr, to, d] := *vecs:idx{layer: 0, fr_k: fr, to_k: to, dist: d}, fr != to "
        ":limit 5"
    )
    assert len(res.rows) == 5


def test_hnsw_cache_rebuild_from_kv(db):
    data = seed_vectors(db, 60, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    db.algo_cache.clear()  # force rebuild from the KV image
    res = db.run_script(
        "?[k, d] := ~vecs:idx{k | query: vec($q), k: 3, ef: 30, bind_distance: d}",
        {"q": data[11].tolist()},
    )
    top = min(res.rows, key=lambda r: r[1])
    assert top[0] == 11


def test_hnsw_filter_and_radius(db):
    data = seed_vectors(db, 60, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    res = db.run_script(
        "?[k] := ~vecs:idx{k | query: vec($q), k: 10, ef: 40, filter: k % 2 == 0}",
        {"q": data[10].tolist()},
    )
    assert all(r[0] % 2 == 0 for r in res.rows)
    res = db.run_script(
        "?[k, d] := ~vecs:idx{k | query: vec($q), k: 10, ef: 40, "
        "radius: 0.001, bind_distance: d}",
        {"q": data[10].tolist()},
    )
    assert [r[0] for r in res.rows] == [10]


def test_hnsw_drop(db):
    seed_vectors(db, 20, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    db.run_script("::hnsw drop vecs:idx")
    res = db.run_script("::indices vecs")
    assert res.rows == []


def test_hnsw_query_joined_with_rule(db):
    """Hybrid query: HNSW search with a per-row query vector (batched)."""
    data = seed_vectors(db, 40, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 50, fields: [v]}"
    )
    res = db.run_script(
        """
        starters[q] := *vecs[3, q]
        starters[q] := *vecs[5, q]
        ?[k] := starters[q], ~vecs:idx{k | query: q, k: 1, ef: 20}
        """
    )
    ks = sorted(r[0] for r in res.rows)
    assert ks == [3, 5]


def test_hybrid_proximity_graph_community(db):
    """BASELINE config 5 (downscaled): recursive Datalog + HNSW proximity
    graph + community detection on that graph."""
    seed_vectors(db, 80, 8)
    db.run_script(
        "::hnsw create vecs:idx {dim: 8, m: 8, ef_construction: 40, fields: [v]}"
    )
    # communities over the HNSW level-0 proximity graph, queried as a relation
    res = db.run_script(
        """
        edges[fr, to] := *vecs:idx{layer: 0, fr_k: fr, to_k: to}, fr != to
        ?[label, node] <~ CommunityDetectionLouvain(edges[fr, to])
        """
    )
    assert len(res.rows) == 80
    # hybrid recursion: nearest neighbor of the nearest neighbor
    res = db.run_script(
        """
        first[k, v2] := ~vecs:idx{k, v: v2 | query: q, k: 1, ef: 20},
                        q = vec($q)
        ?[k2] := first[k, v2], ~vecs:idx{k: k2 | query: v2, k: 2, ef: 20},
                 k2 != k
        """,
        {"q": [float(i) for i in range(8)]},
    )
    assert len(res.rows) >= 1


def test_incremental_device_update_consistency():
    """Mutations apply to the device mirror as dirty-slot scatters; results
    must match a full re-push."""
    import numpy as np

    from cozo_tpu.models.hnsw_index import HnswIndex
    from cozo_tpu.ops.vector_search import hnsw_search_device

    rng = np.random.default_rng(4)
    data = rng.standard_normal((400, 8)).astype(np.float32)
    idx = HnswIndex(dim=8, m=8, ef_construction=30)
    slots = [idx.insert(v) for v in data]
    qs = rng.standard_normal((4, 8)).astype(np.float32)
    hnsw_search_device(idx, qs, 3, 16)
    cache_before = idx._dev_cache
    idx.insert(data[7] + 0.001)
    idx.remove(slots[2])
    ids_inc, d_inc = hnsw_search_device(idx, qs, 3, 16)
    assert idx._dev_cache is cache_before  # incremental, not rebuilt
    idx._dev_cache = None
    ids_full, d_full = hnsw_search_device(idx, qs, 3, 16)
    assert np.array_equal(ids_inc, ids_full)
    assert np.allclose(d_inc, d_full)
