"""LabelPropagation `degree_cap` option (extension over the reference's
`algos/label_propagation.rs` options): hub in-neighborhoods truncated to
the cap's highest-weight edges so power-law graphs stay on the dense
device kernel.  Community structure must survive the truncation."""

from collections import Counter

import numpy as np

from cozo_tpu.ops.graph_algos import LP_DENSE_DMAX, labelprop_jax


def _planted_graph(n_half=400, hub_extra=60, seed=2):
    rng = np.random.default_rng(seed)
    edges = []
    for base in (0, n_half):
        for _ in range(n_half * 20):
            a, b = rng.integers(0, n_half, 2)
            if a != b:
                edges.append((base + a, base + b))
    # one hub whose in-degree exceeds the dense-kernel bound
    for i in range(1, LP_DENSE_DMAX + hub_extra):
        edges.append((i, 0))
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    n = 2 * n_half
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    return np.cumsum(indptr), dst, n, n_half


def _purity(lab, n, n_half):
    p = 0
    for base in (0, n_half):
        c = Counter(lab[base : base + n_half].tolist())
        p += c.most_common(1)[0][1]
    return p / n


def test_degree_cap_keeps_community_structure():
    indptr, dst, n, n_half = _planted_graph()
    lab_exact = labelprop_jax(indptr, dst, iterations=10)
    lab_cap = labelprop_jax(indptr, dst, iterations=10, degree_cap=128)
    assert _purity(lab_exact, n, n_half) > 0.95
    assert _purity(lab_cap, n, n_half) > 0.95


def test_hybrid_matches_sort_kernel_on_hub_graph(monkeypatch):
    """The hybrid kernel (dense device pick + exact host hub mode) must
    produce EXACTLY the sort kernel's labels: both are synchronous
    weighted-mode updates with smallest-label tie-break."""
    import cozo_tpu.ops.graph_algos as ga

    indptr, dst, n, n_half = _planted_graph(n_half=200, hub_extra=200)
    monkeypatch.setenv("COZO_TPU_LP_IMPL", "sort")
    lab_sort = labelprop_jax(indptr, dst, iterations=6)
    monkeypatch.setenv("COZO_TPU_LP_IMPL", "hybrid")
    lab_hyb = labelprop_jax(indptr, dst, iterations=6)
    assert (lab_sort == lab_hyb).all()


def test_hybrid_multilane_matches_sort_kernel(monkeypatch):
    """Bucketed-lane hybrid (r5): degrees spanning several pow2 lanes
    PLUS one mega-hub past COZO_TPU_LP_TIER_MAX (host lane) must still
    reproduce the sort kernel's labels exactly."""
    rng = np.random.default_rng(7)
    n = 3000
    edges = []
    # degree spread: node i gets ~i/12 in-edges (lanes 8..256)
    for v in range(1, n - 1):
        for _ in range(1 + v // 12 % 250):
            edges.append((int(rng.integers(0, n)), v))
    # mega-hub: in-degree past the (shrunk) tier max -> host lane
    for i in range(600):
        edges.append((i % (n - 1), n - 1))
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    monkeypatch.setenv("COZO_TPU_LP_IMPL", "sort")
    lab_sort = labelprop_jax(indptr, dst, iterations=5)
    monkeypatch.setenv("COZO_TPU_LP_IMPL", "hybrid")
    monkeypatch.setenv("COZO_TPU_LP_TIER_MAX", "512")
    lab_hyb = labelprop_jax(indptr, dst, iterations=5)
    assert (lab_sort == lab_hyb).all()


def test_hybrid_weighted_hub_exact(monkeypatch):
    """Weighted hub mode through the hybrid path is exact: strong A
    edges beat a weak B flood WITHOUT any degree_cap truncation."""
    n = 300
    hub = n - 1
    edges, w = [], []
    for i in range(60):
        edges.append((i, hub))
        w.append(1.0)  # strong-ish A edges
    for i in range(100, 100 + LP_DENSE_DMAX + 40):
        edges.append((i % (n - 1), hub))
        w.append(0.3)  # weak B flood (but MORE total weight than A)
    for base, size in ((0, 60), (100, 140)):
        for i in range(size):
            for j in range(1, 4):
                edges.append((base + i, base + (i + j) % size))
                w.append(5.0)
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    wa = np.array(w, dtype=np.float32)
    order = np.argsort(src, kind="stable")
    src, dst, wa = src[order], dst[order], wa[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    # exact mode: B's flood carries 168 * 0.3 = 50.4 > A's 60 * 1.0?
    # no: 60 > 50.4 -> hub labels A.  A capped sample could get this
    # wrong either way; the hybrid must get it exactly right.
    lab = labelprop_jax(indptr, dst, w=wa, iterations=10)
    from collections import Counter as _C

    a_label = _C(lab[:60].tolist()).most_common(1)[0][0]
    assert lab[hub] == a_label, (lab[hub], a_label)


def test_degree_cap_weighted_keeps_strong_edges():
    """With weights, the cap must keep the HIGHEST-weight in-edges: a hub
    whose strong edges all come from community A must label with A even
    when B contributes more (weak) edges."""
    n = 300
    hub = n - 1
    edges, w = [], []
    for i in range(60):  # strong A edges
        edges.append((i, hub))
        w.append(10.0)
    for i in range(100, 100 + LP_DENSE_DMAX + 40):  # weak B flood
        edges.append((i % (n - 1), hub))
        w.append(0.01)
    # two cliques so A/B nodes hold distinct labels
    for base, size in ((0, 60), (100, 140)):
        for i in range(size):
            for j in range(1, 4):
                edges.append((base + i, base + (i + j) % size))
                w.append(5.0)
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    wa = np.array(w, dtype=np.float32)
    order = np.argsort(src, kind="stable")
    src, dst, wa = src[order], dst[order], wa[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    lab = labelprop_jax(indptr, dst, w=wa, iterations=10, degree_cap=64)
    # the hub's label must match community A's dominant label
    a_label = Counter(lab[:60].tolist()).most_common(1)[0][0]
    assert lab[hub] == a_label, (lab[hub], a_label)
