"""SweepTable (chunked device k-NN sweep) correctness vs host exact."""

import numpy as np
import pytest

from cozo_tpu.models.hnsw_index import HnswIndex
from cozo_tpu.ops.exact_knn import sweep_search


def _host_exact(index, qs, k):
    return index._bf_candidates_np(qs, k)


@pytest.mark.parametrize("distance", ["L2", "Cosine", "IP"])
def test_sweep_matches_exact(distance):
    rng = np.random.default_rng(3)
    n, d, B, k = 2000, 32, 128, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(dim=d, m=8, ef_construction=50, distance=distance)
    for v in data:
        idx.insert(v)
    qs = rng.standard_normal((B, d)).astype(np.float32)
    ids, dists = sweep_search(idx, qs, k, rt=1.0, compute_dtype="f32")
    gt_ids, gt_d = _host_exact(idx, qs, k)
    agree = np.mean([
        len(set(ids[b].tolist()) & set(gt_ids[b].tolist())) / k for b in range(B)
    ])
    # disagreements are f32-vs-f64 ties at the rank-k boundary (verified
    # <0.1% relative distance gap); the distance check below is the real bar
    assert agree > 0.98, f"sweep vs exact agreement {agree}"
    np.testing.assert_allclose(np.sort(dists, 1), np.sort(gt_d, 1), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("distance", ["L2", "Cosine", "IP"])
def test_sweep_i8_lane_matches_exact(distance):
    """int8 scoring + in-jit f32 rerank (r5 serving lane): the rerank
    restores exact top-k order; recall vs host exact must match the
    bf16 lane's bar."""
    rng = np.random.default_rng(6)
    n, d, B, k = 3000, 48, 128, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(dim=d, m=8, ef_construction=50, distance=distance)
    for v in data:
        idx.insert(v)
    qs = rng.standard_normal((B, d)).astype(np.float32)
    ids, dists = sweep_search(idx, qs, k, rt=0.99, compute_dtype="i8")
    gt_ids, gt_d = _host_exact(idx, qs, k)
    rec = np.mean([
        len(set(ids[b].tolist()) & set(gt_ids[b].tolist())) / k
        for b in range(B)
    ])
    assert rec > 0.97, f"i8 sweep recall {rec}"
    # reranked distances are exact f32 for the returned rows
    mask = ids == gt_ids  # rows where ranks agree exactly
    np.testing.assert_allclose(
        dists[mask], gt_d[mask], rtol=2e-3, atol=2e-3
    )

    # version bump invalidates the quantized lane
    idx.insert(qs[0])
    ids2, d2 = sweep_search(idx, qs[:8], k, rt=0.99, compute_dtype="i8")
    assert ids2[0, 0] == idx.n - 1 and d2[0, 0] < 1e-3


def test_sweep_incremental_mutations():
    rng = np.random.default_rng(4)
    n, d, k = 1000, 16, 5
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(dim=d, m=8, ef_construction=50, distance="L2")
    slots = [idx.insert(v) for v in data]
    qs = data[:32] + 0.001
    ids, _ = sweep_search(idx, qs, k, rt=1.0, compute_dtype="f32")
    # nearest neighbor of data[i]+eps is slot i
    assert (ids[:, 0] == np.arange(32)).mean() > 0.95

    # remove the true NNs; they must vanish from results
    for s in range(16):
        idx.remove(s)
    ids2, _ = sweep_search(idx, qs[:16], k, rt=1.0, compute_dtype="f32")
    assert not np.isin(ids2, np.arange(16)).any()

    # insert replacements right on the queries; they must appear
    new_slots = [idx.insert(qs[i]) for i in range(16)]
    ids3, d3 = sweep_search(idx, qs[:16], k, rt=1.0, compute_dtype="f32")
    assert all(ids3[i, 0] == new_slots[i] for i in range(16))
    assert np.allclose(d3[:, 0], 0.0, atol=1e-4)


def test_search_dispatches_to_sweep():
    rng = np.random.default_rng(5)
    n, d, B, k = 30_000, 24, 256, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(dim=d, m=8, ef_construction=50, distance="L2")
    idx.bulk_build(data, wave=2048)
    qs = rng.standard_normal((B, d)).astype(np.float32)
    ids, dists = idx.search(qs, k=k, ef=64, use_tpu=True)
    gt_ids, _ = _host_exact(idx, qs, k)
    rec = np.mean([
        len(set(ids[b].tolist()) & set(gt_ids[b].tolist())) / k for b in range(B)
    ])
    assert rec > 0.97, f"dispatched sweep recall {rec}"


def test_rerank_k_override_matches_default():
    """A wider exact-rerank overfetch (bench's i8 lane uses 64) must not
    change the returned top-k on an easy table, for every lane."""
    rng = np.random.default_rng(11)
    n, d, B, k = 5_000, 16, 64, 5
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(dim=d, m=8, ef_construction=50, distance="Cosine")
    idx.bulk_build(data, wave=2048)
    qs = data[:B] + 1e-3 * rng.standard_normal((B, d)).astype(np.float32)
    base, bd = sweep_search(idx, qs, k, rt=1.0, compute_dtype="f32")
    for cd in ("bf16", "i8"):
        wide, wd = sweep_search(idx, qs, k, rt=1.0, compute_dtype=cd,
                                rerank_k=64)
        agree = np.mean([
            len(set(wide[b].tolist()) & set(base[b].tolist())) / k
            for b in range(B)
        ])
        assert agree > 0.95, f"{cd} rerank_k=64 agreement {agree}"
        # rerank distances are exact f32: self-queries land near 0
        assert np.isfinite(wd[np.asarray(wide) >= 0]).all()
