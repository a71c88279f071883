"""int8 bulk-build mode (ops/bulk_build.py `_build_step_fn_i8`): past
the f32-in-HBM budget (COZO_TPU_F32_TABLE_MAX) the device build runs on
a quantized table.  Graph quality must match the f32 build and the
finished table must hand over to the quant serving path."""

import numpy as np
import pytest

from cozo_tpu.models.hnsw_index import HnswIndex
from cozo_tpu.ops.bulk_build import bulk_build_device

N, D, NQ, K = 24_000, 48, 64, 10  # N >= 20_000: search() takes the
# device path, so the quant-serving handover is actually exercised


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    return (
        rng.standard_normal((N, D)).astype(np.float32),
        rng.standard_normal((NQ, D)).astype(np.float32),
    )


def _graph_recall(idx, data, qs, metric):
    gt = np.zeros((NQ, K), dtype=np.int64)
    for i in range(NQ):
        if metric == "L2":
            dd = ((data - qs[i]) ** 2).sum(1)
        else:
            dn = np.linalg.norm(data, axis=1) * np.linalg.norm(qs[i])
            dd = 1 - (data @ qs[i]) / np.where(dn > 0, dn, 1.0)
        gt[i] = np.argsort(dd)[:K]
    hits = 0
    for i in range(NQ):
        got = idx._beam_search(qs[i].astype(idx.dtype), [idx.entry], 0, 64)
        got.sort()
        ids = {s for _, s in got[:K]}
        hits += len(ids & set(gt[i].tolist()))
    return hits / (NQ * K)


@pytest.mark.parametrize("metric", ["Cosine", "L2"])
def test_i8_build_quality_matches_f32(data, metric, monkeypatch):
    vecs, qs = data
    recalls = {}
    for mode, budget in (("f32", str(8 << 30)), ("i8", "1")):
        monkeypatch.setenv("COZO_TPU_F32_TABLE_MAX", budget)
        idx = HnswIndex(
            dim=D, m=16, ef_construction=100, distance=metric,
            dtype=np.float32,
        )
        bulk_build_device(idx, vecs, wave=4096)
        recalls[mode] = _graph_recall(idx, vecs, qs, metric)
    assert recalls["i8"] >= recalls["f32"] - 0.05, recalls


def test_i8_build_installs_quant_serving(data, monkeypatch):
    vecs, qs = data
    monkeypatch.setenv("COZO_TPU_F32_TABLE_MAX", "1")
    idx = HnswIndex(
        dim=D, m=16, ef_construction=100, distance="Cosine",
        dtype=np.float32,
    )
    bulk_build_device(idx, vecs, wave=4096)
    assert idx._quant_sweep is not None
    assert idx._quant_sweep_version == idx.version
    ids, d = idx.search(qs, K, 64)
    dn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    rec = 0.0
    for i in range(NQ):
        dd = 1 - dn @ (qs[i] / np.linalg.norm(qs[i]))
        gt = set(np.argsort(dd)[:K].tolist())
        rec += len(set(ids[i].tolist()) & gt) / K
    assert rec / NQ > 0.95, rec / NQ
