"""Staged-image cache keying: graph_content_key covers topology only, so
the per-graph staged device images (which bake edge weights in) must be
keyed by a weight fingerprint too — same-topology-different-weights calls
previously returned results computed with the FIRST call's weights.

Also covers the on-disk packed-ELL image cache (VERDICT r3 next #5: the
ELL bucketing is a cacheable artifact of the graph).
"""

import numpy as np
import pytest


def _tiny_graph():
    # 0 -> 1 -> 2, 0 -> 2 (direct edge): shortest path 0->2 depends on w
    indptr = np.array([0, 2, 3, 3], dtype=np.int64)
    dst = np.array([1, 2, 2], dtype=np.int64)  # edges: 0->1, 0->2, 1->2
    return indptr, dst


def test_sssp_restage_on_weight_change():
    from cozo_tpu.ops.graph_algos import graph_content_key, sssp_device

    indptr, dst = _tiny_graph()
    ck = graph_content_key(indptr, dst)
    # direct edge cheap: dist(2) = 1.0
    w1 = np.array([1.0, 1.0, 1.0], dtype=np.float32)
    d1, _ = sssp_device(indptr, dst, w1, [0], cache_key=ck)
    assert d1[0, 2] == pytest.approx(1.0)
    # direct edge expensive: dist(2) = 0.5 + 0.5 via node 1
    w2 = np.array([0.5, 10.0, 0.5], dtype=np.float32)
    d2, _ = sssp_device(indptr, dst, w2, [0], cache_key=ck)
    assert d2[0, 2] == pytest.approx(1.0)
    assert d2[0, 1] == pytest.approx(0.5)
    # and uniform-but-different scalars must not share either
    w3 = np.array([2.0, 2.0, 2.0], dtype=np.float32)
    d3, _ = sssp_device(indptr, dst, w3, [0], cache_key=ck)
    assert d3[0, 2] == pytest.approx(2.0)


def test_labelprop_restage_on_weight_change():
    from cozo_tpu.ops.graph_algos import graph_content_key, labelprop_jax

    # two triangles bridged by one edge; the bridge's weight decides
    # whether node 3 joins the left community on iteration 1
    indptr = np.array([0, 2, 4, 6, 9, 11, 13], dtype=np.int64)
    dst = np.array([1, 2, 0, 2, 0, 1, 2, 4, 5, 3, 5, 3, 4], dtype=np.int64)
    ck = graph_content_key(indptr, dst)
    w_hi = np.ones(len(dst), dtype=np.float32)
    w_hi[6] = 100.0  # 3's in-edge from 2 dominates
    l1 = labelprop_jax(indptr, dst, w=w_hi, iterations=4, cache_key=ck)
    w_lo = np.ones(len(dst), dtype=np.float32)
    w_lo[6] = 0.01  # bridge negligible
    l2 = labelprop_jax(indptr, dst, w=w_lo, iterations=4, cache_key=ck)
    # with the stale-weight bug, l2 == l1 bit-for-bit; the exact labels
    # are kernel-defined, so just require the bridge weighting to matter
    assert not np.array_equal(l1, l2)


def test_sssp_disk_cache_roundtrip(tmp_path, monkeypatch):
    from cozo_tpu.ops import graph_algos as ga

    monkeypatch.setenv("COZO_TPU_GRAPH_CACHE", str(tmp_path))
    rng = np.random.default_rng(3)
    n, e = 200, 1200
    src = np.sort(rng.integers(0, n, e))
    dst = rng.integers(0, n, e).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    ck = ga.graph_content_key(indptr, dst)
    w = np.ones(e, dtype=np.float32)

    d1, p1 = ga.sssp_device(indptr, dst, w, [0, 7], cache_key=ck)
    files = list(tmp_path.iterdir())
    assert any(f.name.startswith("sssp1_") for f in files), files

    # fresh in-memory state -> must load the packed image from disk
    ga._GRAPH_DEV_CACHE.clear()
    ga._HOST_STAGE_CACHE.clear()
    d2, p2 = ga.sssp_device(indptr, dst, w, [0, 7], cache_key=ck)
    np.testing.assert_allclose(d1, d2)
    np.testing.assert_array_equal(p1, p2)

    # non-uniform weights round-trip through their own keyed image
    w2 = rng.uniform(0.5, 2.0, e).astype(np.float32)
    d3, _ = ga.sssp_device(indptr, dst, w2, [0], cache_key=ck)
    ga._GRAPH_DEV_CACHE.clear()
    d4, _ = ga.sssp_device(indptr, dst, w2, [0], cache_key=ck)
    np.testing.assert_allclose(d3, d4)
    assert not np.allclose(d1[0], d3[0])


def test_sssp_reuses_pagerank_device_source_array(capsys, monkeypatch):
    """PageRank publishes its dst-sorted source array under a "srcdev"
    device-cache key; a following SSSP over the same graph must pack its
    ELL image from that on-device alias (no host rebuild / relay upload)
    and still produce exact Dijkstra distances.

    The alias only engages when PageRank's and SSSP's edge paddings
    collapse to the same granule (pow2(e)//16 past ~131K edges), so the
    graph here carries ~140K edges.
    """
    import heapq

    from cozo_tpu.ops.graph_algos import (
        graph_content_key, pagerank_jax, sssp_device,
    )

    rng = np.random.default_rng(7)
    n, deg = 2000, 70
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = rng.integers(0, n, len(src))
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 4.0, len(src)).astype(np.float32)
    order = np.argsort(src, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)

    ck = graph_content_key(indptr, dst)
    pagerank_jax(indptr, dst, iterations=3, cache_key=ck)

    monkeypatch.setenv("COZO_TPU_SSSP_LOG", "1")
    dists, _ = sssp_device(indptr, dst, w, [0], cache_key=ck)
    out = capsys.readouterr().out
    assert "src=dev-alias" in out, out

    ref = np.full(n, np.inf)
    ref[0] = 0.0
    adj = [[] for _ in range(n)]
    for s, d, ww in zip(src, dst, w):
        adj[s].append((int(d), float(ww)))
    pq = [(0.0, 0)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > ref[u]:
            continue
        for v, ww in adj[u]:
            nd = du + ww
            if nd < ref[v] - 1e-9:
                ref[v] = nd
                heapq.heappush(pq, (nd, v))
    finite = np.isfinite(ref)
    assert np.allclose(dists[0][:n][finite], ref[finite], atol=1e-4)
