"""Pallas kernel tests (interpret mode on the CPU mesh; the compiled TPU
path is exercised by bench runs and verified for exact agreement there)."""

import numpy as np

from cozo_tpu.ops.pallas_kernels import knn_pallas


def test_knn_pallas_l2():
    rng = np.random.default_rng(0)
    n, d, B, k = 700, 32, 8, 5
    v = rng.standard_normal((n, d)).astype(np.float32)
    norms = (v.astype(np.float64) ** 2).sum(1)
    q = rng.standard_normal((B, d)).astype(np.float32)
    ids, dists = knn_pallas(v, norms, q, k, "L2", interpret=True)
    dm = ((v[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    truth = np.argsort(dm, axis=1)[:, :k]
    for b in range(B):
        assert set(ids[b].tolist()) == set(truth[b].tolist())
    assert np.all(np.diff(dists, axis=1) >= -1e-6)  # sorted ascending


def test_knn_pallas_ip():
    rng = np.random.default_rng(1)
    n, d, B, k = 600, 16, 4, 3
    v = rng.standard_normal((n, d)).astype(np.float32)
    norms = (v.astype(np.float64) ** 2).sum(1)
    q = rng.standard_normal((B, d)).astype(np.float32)
    ids, _ = knn_pallas(v, norms, q, k, "IP", interpret=True)
    truth = np.argsort(1 - q @ v.T, axis=1)[:, :k]
    for b in range(B):
        assert set(ids[b].tolist()) == set(truth[b].tolist())
