"""Fused Pallas sweep kernel (ops/pallas_sweep.py) — interpret-mode
numerics on the CPU backend, and the end-to-end `compute_dtype="fused"`
serving lane through SweepTable.search.

The segment-top2 reduce is compared against `fused_ref_numpy` (bit-level
packed values) and against the IDEAL f32 segment-top2 candidate recall —
at a 16K-row test table the truncation loss is dominated by the segment
count (64 here vs 5120 at 1M), so the bar is "kernel == ideal", not an
absolute recall number.  Reference parity: the serving surface matches
hnsw_knn (/root/reference/cozo-core/src/runtime/hnsw.rs:869-1012)."""

import numpy as np
import pytest

import cozo_tpu.ops.pallas_sweep as ps


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas_call in interpreter mode (CPU backend has no Mosaic)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    ps._FUSED_FNS.clear()
    ps._SERVE_FNS.clear()
    yield
    ps._FUSED_FNS.clear()
    ps._SERVE_FNS.clear()


def _mk(n_total=16384, B=512, seed=0, dead=100):
    rng = np.random.default_rng(seed)
    tbl = rng.normal(size=(n_total, 128)).astype(np.float32)
    bias = np.zeros(n_total, dtype=np.float32)
    if dead:
        bias[n_total - dead:] = ps.NEG_FILL
    qs = rng.normal(size=(B, 128)).astype(np.float32)
    return tbl, bias, qs


def test_fused_kernel_matches_reference_and_ideal():
    import jax.numpy as jnp

    tbl, bias, qs = _mk()
    n_total, B = tbl.shape[0], qs.shape[0]
    fn = ps._fused_fn(n_total, B)
    out = np.asarray(
        fn(
            jnp.asarray(tbl, dtype=jnp.bfloat16),
            jnp.asarray(bias.reshape(1, -1)),
            jnp.asarray(qs, dtype=jnp.bfloat16),
        )
    )
    # bit-level reference on bf16-rounded inputs (MXU accumulates f32;
    # tiny tie-order differences on equal-bits scores are acceptable)
    ref = ps.fused_ref_numpy(
        np.asarray(jnp.asarray(tbl, dtype=jnp.bfloat16).astype(jnp.float32)),
        bias,
        np.asarray(jnp.asarray(qs, dtype=jnp.bfloat16).astype(jnp.float32)),
    )
    assert out.shape == ref.shape == (B, 2 * n_total // ps.SEG)
    assert np.isclose(out, ref, rtol=1e-6, atol=1e-6).mean() > 0.99

    # candidate recall == the IDEAL f32 segment-top2 recall (the kernel
    # adds no loss beyond the by-construction truncation)
    exact = qs @ tbl.T + bias[None, :]
    gt10 = np.argsort(-exact, axis=1)[:, :10]
    segs = n_total // ps.SEG
    e3 = exact.reshape(B, segs, ps.SEG)
    ord2 = np.argsort(-e3, axis=2)[:, :, :2]
    ideal_ids = (ord2 + (np.arange(segs) * ps.SEG)[None, :, None]).reshape(
        B, segs * 2
    )
    ideal_hits = sum(
        len(set(ideal_ids[i]) & set(gt10[i])) for i in range(B)
    ) / (B * 10)

    col = out.view(np.int32) & (ps.SEG - 1)
    rows_id = ((np.arange(out.shape[1]) >> 1) * ps.SEG)[None, :] + col
    sel = np.argsort(-out, axis=1)[:, :26]
    cand = np.take_along_axis(rows_id, sel, axis=1)
    hits = sum(len(set(cand[i]) & set(gt10[i])) for i in range(B)) / (B * 10)
    assert hits >= ideal_hits - 0.002, (hits, ideal_hits)
    # dead slots never surface
    assert not any(
        (cand >= n_total - 100).flatten()
    ), "dead-bias rows leaked into candidates"


def test_serve_fn_end_to_end_unpadded_batch():
    """_serve_fn with B not a multiple of B_TILE (pads internally) against
    exact top-k; Cosine metric through normalized rows."""
    import jax.numpy as jnp

    tbl, bias, qs = _mk(B=700, dead=0)
    n_total, B = tbl.shape[0], qs.shape[0]
    B_pad = ((B + ps.B_TILE - 1) // ps.B_TILE) * ps.B_TILE
    k = 10
    fn = ps._serve_fn(n_total, B_pad, k, 26, "IP", 128, 1, n_total, 128)
    pfn = ps._prep_fn(1, n_total, 128)
    tf, bf = pfn(
        jnp.asarray(tbl.reshape(1, n_total, 128)),
        jnp.asarray(bias.reshape(1, n_total)),
    )
    packed = np.asarray(
        fn(tf, bf, jnp.asarray(tbl.reshape(1, n_total, 128)),
           jnp.asarray(qs))
    )
    assert packed.shape == (B, 2 * k)
    ids = packed[:, :k]
    exact = qs @ tbl.T
    gt = np.argsort(-exact, axis=1)[:, :k]
    hits = sum(len(set(ids[i]) & set(gt[i])) for i in range(B)) / (B * k)
    # 64-segment table: the bar is the ideal truncation recall (~0.997)
    assert hits > 0.99, hits
    # scores come back as exact f32 similarities (bitcast int32 halves)
    sc = packed[:, k:].copy().view(np.float32)
    best = np.take_along_axis(exact, ids.astype(np.int64), axis=1)
    assert np.allclose(sc, best, rtol=1e-5, atol=1e-5)


def test_fused_compile_failure_degrades_to_bf16(monkeypatch):
    """A Mosaic compile/launch failure inside the fused lane must degrade
    to the bf16 sweep with a loud fallback record, not kill the caller
    (the r5 bench died on a scoped-vmem compile OOM before this guard)."""
    from jax.experimental import pallas as pl

    from cozo_tpu.models.hnsw_index import HnswIndex
    from cozo_tpu.ops.exact_knn import sweep_search
    from cozo_tpu.utils import fallback

    def boom(*a, **kw):
        raise RuntimeError("synthetic Mosaic compile failure")

    monkeypatch.setattr(pl, "pallas_call", boom)
    ps._FUSED_FNS.clear()
    ps._SERVE_FNS.clear()

    rng = np.random.default_rng(2)
    data = rng.normal(size=(16_384, 100)).astype(np.float32)
    idx = HnswIndex(dim=100, m=8, ef_construction=50, distance="Cosine")
    idx.bulk_build(data, wave=4096)
    before = dict(fallback.counts())
    ids, d = sweep_search(idx, data[:64], 10, compute_dtype="fused")
    assert float(np.mean(ids[:, 0] == np.arange(64))) == 1.0
    after = fallback.counts()
    assert after.get("sweep.fused", 0) > before.get("sweep.fused", 0)


def test_sweep_table_fused_lane():
    """compute_dtype="fused" through the public sweep_search surface,
    including the unsupported-shape fallback to bf16."""
    from cozo_tpu.models.hnsw_index import HnswIndex
    from cozo_tpu.ops.exact_knn import sweep_search

    rng = np.random.default_rng(1)
    data = rng.normal(size=(20_000, 64)).astype(np.float32)
    idx = HnswIndex(dim=64, m=8, ef_construction=50, distance="Cosine")
    idx.bulk_build(data, wave=4096)
    qs = data[:256] + rng.normal(size=(256, 64)).astype(np.float32) * 0.01
    ids_f, d_f = sweep_search(idx, qs, 10, compute_dtype="fused")
    ids_b, d_b = sweep_search(idx, qs, 10, compute_dtype="bf16", rt=1.0)
    # self-row must be the top hit in both lanes
    self_hit_f = float(np.mean(ids_f[:, 0] == np.arange(256)))
    assert self_hit_f > 0.99, self_hit_f
    overlap = np.mean([
        len(set(ids_f[i].tolist()) & set(ids_b[i].tolist())) / 10
        for i in range(256)
    ])
    assert overlap > 0.98, overlap
    assert np.all(np.isfinite(d_f[ids_f >= 0]))
