"""int8-quantized sweep (ops/quant_knn.py): recall against exact ground
truth, dead-row masking, IP metric, and the host re-rank contract."""

import numpy as np
import pytest

from cozo_tpu.ops.quant_knn import QuantSweepTable, quant_search


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    return rng.standard_normal((8192, 48)).astype(np.float32)


def _gt_cosine(data, qs, k):
    dn = data / np.linalg.norm(data, axis=1, keepdims=True)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    return np.argsort(-(qn @ dn.T), axis=1)[:, :k]


def test_recall_with_rerank(data):
    rng = np.random.default_rng(4)
    qs = data[:32] + 0.05 * rng.standard_normal((32, 48)).astype(np.float32)
    t = QuantSweepTable().load(data, "Cosine")
    ids, d = quant_search(data, t, qs, 10, overfetch=8, rt=0.99)
    gt = _gt_cosine(data, qs, 10)
    rec = np.mean([
        len(set(ids[b].tolist()) & set(gt[b].tolist())) / 10 for b in range(32)
    ])
    assert rec > 0.97, rec
    # distances ascending per row
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_dead_rows_never_returned(data):
    alive = np.ones(len(data), bool)
    alive[::3] = False
    t = QuantSweepTable().load(data, "Cosine", alive=alive)
    qs = data[::3][:16]  # queries exactly at dead rows
    ids, _ = quant_search(data, t, qs, 5)
    assert (ids % 3 != 0).all() or (ids < 0).any() is False
    assert not np.isin(ids[ids >= 0], np.nonzero(~alive)[0]).any()


def test_ip_metric(data):
    t = QuantSweepTable().load(data, "IP")
    qs = data[:8]
    ids, d = quant_search(data, t, qs, 5)
    gt = np.argsort(-(qs @ data.T), axis=1)[:, :5]
    agree = np.mean([
        len(set(ids[b].tolist()) & set(gt[b].tolist())) / 5 for b in range(8)
    ])
    assert agree > 0.95, agree


def test_l2_metric(data):
    """L2 serves through the bias lane (VERDICT r3 weak #8): rows stored
    with doubled scales + bias -||v||^2 so the int8 scan ranks
    2 q.v - ||v||^2; the host re-rank restores exact squared-L2 order."""
    t = QuantSweepTable().load(data, "L2")
    rng = np.random.default_rng(7)
    qs = data[:16] + 0.05 * rng.standard_normal((16, 48)).astype(np.float32)
    ids, d = quant_search(data, t, qs, 10, overfetch=8, rt=0.99)
    d2 = ((data[None, :, :] - qs[:, None, :]) ** 2).sum(axis=2)
    gt = np.argsort(d2, axis=1)[:, :10]
    rec = np.mean([
        len(set(ids[b].tolist()) & set(gt[b].tolist())) / 10
        for b in range(16)
    ])
    assert rec > 0.97, rec
    # returned distances are exact squared L2, ascending
    assert (np.diff(d, axis=1) >= -1e-5).all()
    exact = np.take_along_axis(d2, ids, axis=1)
    assert np.allclose(d, exact, rtol=1e-4, atol=1e-4)


def test_l2_dead_rows(data):
    alive = np.ones(len(data), bool)
    alive[::2] = False
    t = QuantSweepTable().load(data, "L2", alive=alive)
    qs = data[::2][:8]
    ids, _ = quant_search(data, t, qs, 5)
    assert not np.isin(ids[ids >= 0], np.nonzero(~alive)[0]).any()


def test_auto_quant_serving_policy(monkeypatch):
    """HnswIndex.search engages the int8 sweep when the f32 table would
    exceed the HBM budget (COZO_TPU_F32_TABLE_MAX)."""
    from cozo_tpu.models.hnsw_index import HnswIndex

    monkeypatch.setenv("COZO_TPU_F32_TABLE_MAX", "100000")
    rng = np.random.default_rng(0)
    n, d = 4096, 32
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(dim=d, m=8, ef_construction=32, distance="Cosine")
    idx.bulk_build(data, wave=1024)
    qs = data[:32] + 0.02 * rng.standard_normal((32, d)).astype(np.float32)
    ids, _ = idx.search(qs, 10, 64, use_tpu=True)
    assert idx._quant_sweep is not None
    gt = _gt_cosine(data, qs, 10)
    rec = np.mean([
        len(set(ids[b].tolist()) & set(gt[b].tolist())) / 10
        for b in range(32)
    ])
    assert rec > 0.97, rec
