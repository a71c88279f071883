"""Regression tests for round-4 review fixes: f16 query-upload overflow
(L2/IP sweep returning all -1 for |x| > 65504), OverflowError escaping the
numeric output-sort fast path on out-of-i64 ints, unbounded on-disk graph
image cache, and the memoized edge-weight fingerprint."""

import numpy as np
import pytest

from cozo_tpu.runtime.db import Db


def test_sweep_f16_overflow_falls_back_to_f32(monkeypatch):
    """Query vectors past float16 range must not turn into all-inf scores
    (the bad-filter then reports ids=-1 for every row)."""
    monkeypatch.setenv("COZO_TPU_Q_F16", "1")
    from cozo_tpu.models.hnsw_index import HnswIndex
    from cozo_tpu.ops.exact_knn import sweep_search

    rng = np.random.default_rng(0)
    data = (rng.standard_normal((256, 16)) * 1e5).astype(np.float32)
    idx = HnswIndex(dim=16, m=8, ef_construction=50, distance="L2")
    for v in data:
        idx.insert(v)
    ids, dists = sweep_search(idx, data[:4], 5)
    assert (ids[:, 0] == np.arange(4)).all()
    assert np.isfinite(dists[:, 0]).all()


def test_sort_fastpath_bigint_falls_back():
    """`b = $big` with 2**70 and >2048 rows: np.int64 conversion overflows;
    must fall back to cmp_key sorting, not raise OverflowError."""
    db = Db("mem")
    db.run_script(":create t {a: Int}")
    rows = [[i] for i in range(3000)]
    db.run_script("?[a] <- $rows :put t {a}", {"rows": rows})
    res = db.run_script(
        "?[a, b] := *t{a}, b = $big :order -a :limit 5", {"big": 2**70}
    )
    assert res.rows[0] == [2999, 2**70]


def test_graph_disk_cache_pruned(tmp_path, monkeypatch):
    from cozo_tpu.ops.graph_algos import _prune_graph_disk_cache

    monkeypatch.setenv("COZO_TPU_GRAPH_CACHE_MAX_GB", "0.000001")  # 1KB
    old = tmp_path / "sssp1_old_8_uni.npz"
    new = tmp_path / "sssp1_new_8_uni.npz"
    orphan = tmp_path / "sssp1_x_8_uni.npz.tmp.npz"
    old.write_bytes(b"x" * 2048)
    new.write_bytes(b"y" * 2048)
    orphan.write_bytes(b"z")
    import os
    import time

    past = time.time() - 7200
    os.utime(old, (past, past))
    os.utime(orphan, (past, past))
    _prune_graph_disk_cache(str(tmp_path))
    assert not old.exists()  # oldest evicted to fit the cap
    assert new.exists()  # newest kept (cap check runs before its turn)
    assert not orphan.exists()  # stale tmp swept


def test_w_fingerprint_memoized_and_guarded():
    from cozo_tpu.ops.graph_algos import _w_fingerprint

    w = np.arange(10, dtype=np.float64)
    f32a, da, ua = _w_fingerprint(w)
    f32b, db_, ub = _w_fingerprint(w)
    assert da == db_ and f32a is f32b and ua is None
    w2 = np.full(10, 3.0)
    _, d2, u2 = _w_fingerprint(w2)
    assert d2 != da and u2 == 3.0
    # a DIFFERENT array at a possibly-recycled id must re-fingerprint
    w3 = np.arange(10, dtype=np.float64) * 2
    _, d3, _ = _w_fingerprint(w3)
    assert d3 != da
