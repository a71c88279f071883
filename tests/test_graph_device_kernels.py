"""Device graph-kernel tests (CPU-mesh interpretable paths): label
propagation variants, Louvain, SSSP parity vs host Dijkstra."""

import numpy as np



def test_device_label_propagation_partitions():
    """Sort/scan LPA kernel: two cliques joined by one bridge edge must
    resolve into two communities matching clique membership."""
    import numpy as np

    from cozo_tpu.ops.graph_algos import labelprop_jax

    def clique_edges(nodes):
        return [(u, v) for u in nodes for v in nodes if u != v]

    a = list(range(0, 8))
    b = list(range(8, 16))
    edges = clique_edges(a) + clique_edges(b) + [(0, 8), (8, 0)]
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(17, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    labels = labelprop_jax(indptr, dst, iterations=10)
    assert len(set(labels[:8])) == 1
    assert len(set(labels[8:])) == 1
    assert labels[0] != labels[8]


def test_device_label_propagation_weighted():
    """Weights steer the mode: node 2 hears label-0 with weight 5 and
    label-1 with weight 1+1, so it must adopt node 0's label."""
    import numpy as np

    from cozo_tpu.ops.graph_algos import labelprop_jax

    # edges into node 2: from 0 (w=5), from 1 (w=1), from 3 (w=1);
    # 1 and 3 share a label after iteration 1?  keep it simpler: single round
    edges = [(0, 2, 5.0), (1, 2, 1.0), (3, 2, 1.0)]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    w = np.array([e[2] for e in edges], dtype=np.float32)
    indptr = np.zeros(5, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    labels = labelprop_jax(indptr, dst, w=w, iterations=1)
    assert labels[2] == labels[0]


def test_label_propagation_sort_path_hub():
    """A >128-in-degree hub forces the sort/scan kernel; partition must
    still resolve (hub + spokes adopt one label)."""
    import numpy as np

    from cozo_tpu.ops.graph_algos import labelprop_jax

    # star: 200 spokes all pointing at node 0, node 0 points back
    edges = [(i, 0) for i in range(1, 201)] + [(0, i) for i in range(1, 201)]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(202, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    labels = labelprop_jax(indptr, dst, iterations=6)
    # synchronous LPA two-colors a star (hub/spokes oscillate — inherent
    # to sync updates); all spokes must share one label
    assert len(set(labels[1:].tolist())) == 1
    assert len(set(labels.tolist())) <= 2


def test_label_propagation_dense_matches_sort():
    """Dense and sort kernels must produce identical labels on the same
    bounded-degree graph (dense is the dispatch default there)."""
    import numpy as np

    from cozo_tpu.ops import graph_algos as G

    rng = np.random.default_rng(5)
    n, deg = 400, 6
    src = np.repeat(np.arange(n), deg)
    dst = (src + rng.integers(1, 40, len(src))) % n
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    in_deg = np.bincount(dst, minlength=n)
    dense = G._labelprop_dense(indptr, dst, None, 5, None, in_deg, n, len(dst))
    saved = G.LP_DENSE_DMAX
    try:
        G.LP_DENSE_DMAX = -1  # force sort path
        srt = G.labelprop_jax(indptr, dst, iterations=5)
    finally:
        G.LP_DENSE_DMAX = saved
    assert (dense == srt).all()


def test_vectorized_louvain_through_db():
    """>200K edges routes Louvain to the vectorized parallel sweep; planted
    communities must resolve through the full engine."""
    import numpy as np

    from cozo_tpu.runtime.db import Db

    rng = np.random.default_rng(4)
    n_c, sz = 4, 120
    rows = []
    for c in range(n_c):
        b = c * sz
        e = rng.integers(0, sz, (sz * 240, 2))
        rows += [[int(b + x), int(b + y)] for x, y in e if x != y]
    assert len(rows) >= 200_000 // 2  # undirected doubling crosses 200K
    db = Db("mem")
    db.run_script(":create e {f: Int, t: Int}")
    for s in range(0, len(rows), 50000):
        db.run_script("?[f, t] <- $r :put e {f, t}", {"r": rows[s:s+50000]})
    out = db.run_script(
        "?[l, n] <~ CommunityDetectionLouvain(*e[f, t], undirected: true)"
    )
    lab = {r[1]: tuple(r[0]) for r in out.rows}
    import collections
    for c in range(n_c):
        cnt = collections.Counter(lab[c * sz + i] for i in range(sz))
        assert cnt.most_common(1)[0][1] > sz * 0.9


def test_sssp_device_matches_dijkstra():
    """Scatter-free segmented-scan Bellman-Ford vs host Dijkstra: exact
    distances and valid parent tree."""
    import heapq

    import numpy as np

    from cozo_tpu.ops.graph_algos import sssp_device

    rng = np.random.default_rng(11)
    n, deg = 300, 5
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

    import os

    os.environ["COZO_TPU_SSSP_SCAN"] = "1"
    try:
        dists, parents = sssp_device(indptr, dst, w, [0, 17])
    finally:
        del os.environ["COZO_TPU_SSSP_SCAN"]
    # default (scatter) kernel must agree
    d2, p2 = sssp_device(indptr, dst, w, [0, 17])
    assert np.allclose(dists, d2, atol=1e-5)

    adj = [[] for _ in range(n)]
    for s, d, ww in zip(src, dst, w):
        adj[s].append((int(d), float(ww)))
    for si, s0 in enumerate([0, 17]):
        ref = np.full(n, np.inf)
        ref[s0] = 0.0
        pq = [(0.0, s0)]
        while pq:
            du, u = heapq.heappop(pq)
            if du > ref[u]:
                continue
            for v2, ww in adj[u]:
                if du + ww < ref[v2]:
                    ref[v2] = du + ww
                    heapq.heappush(pq, (du + ww, v2))
        assert np.allclose(dists[si], ref, atol=1e-4), si
        # parent tree consistency: dist[v] == dist[parent] + w(parent, v)
        for v2 in range(n):
            p = int(parents[si][v2])
            if p < 0:
                continue
            wmin = min((ww for d2, ww in adj[p] if d2 == v2), default=None)
            assert wmin is not None
            assert abs(dists[si][p] + wmin - dists[si][v2]) < 1e-4
