"""Decompose the serving sweep's 194ms/4096q at 1.18M x 128 (VERDICT r4
next #2): how much is matmul, how much approx_max_k + merge, how much the
rerank gather?  Then measure the candidate redesign:

  group-max sweep: matmul -> per-G-column max (fused, no [B, N] f32
  materialization at full width) -> approx_max_k over the G-fold smaller
  array -> gather candidate GROUPS -> exact f32 rescore -> top-k,
  all in one jit.

Run ON TPU: python benches/profile_sweep_phases.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config

ensure_jax_config()
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N_real = 1_183_514
d = 100
d_pad = 128
CHUNK = 1 << 17
n_chunks = (N_real + CHUNK - 1) // CHUNK
N = n_chunks * CHUNK
k = 10
KF = 26  # current rerank width
B = 4096

print(f"N={N_real} padded {N} ({n_chunks}x{CHUNK}) B={B}", flush=True)
data = rng.standard_normal((N_real, d)).astype(np.float32)
table = np.zeros((N, d_pad), dtype=np.float32)
table[:N_real, :d] = data / np.linalg.norm(data, axis=1, keepdims=True)

tbl = jnp.asarray(table.reshape(n_chunks, CHUNK, d_pad))
tbl_bf = jnp.asarray(table.reshape(n_chunks, CHUNK, d_pad), dtype=jnp.bfloat16)
tbl_flat = jnp.asarray(table)  # [N, d_pad] f32 for gather/rescore

q = rng.standard_normal((B, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
qs = np.zeros((B, d_pad), dtype=np.float32)
qs[:, :d] = q
qs_d = jnp.asarray(qs)

sub = 256
scores_gt = q[:sub] @ table[:N_real, :d].T
gt_ids = np.argsort(-scores_gt, axis=1)[:, :k]


def timeit(fn, *args, reps=5, tag=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    el = (time.time() - t0) / reps
    print(f"{tag}: {el*1000:.1f} ms -> {B/el:,.0f} QPS", flush=True)
    return out, el


def recall(ids_np):
    hits = sum(
        len(set(gt_ids[i].tolist()) & set(ids_np[i].tolist()))
        for i in range(sub)
    )
    return hits / (sub * k)


# --- 1. matmul-only floor (global max per query) ------------------------
@jax.jit
def mm_only(tbl_b, qs):
    qb = qs.astype(jnp.bfloat16)

    def body(_, chunk):
        s = jax.lax.dot_general(
            qb, chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, s.max(axis=1)

    _, m = jax.lax.scan(body, None, tbl_b)
    return m.max(axis=0)


timeit(mm_only, tbl_bf, qs_d, tag="matmul+max only (bf16 tbl)")


# --- 2. current design: per-chunk approx_max_k + merge (no rerank) ------
def make_current(rerank: bool):
    @jax.jit
    def run(tbl_b, flat, qs):
        qb = qs.astype(jnp.bfloat16)

        def body(_, chunk):
            s = jax.lax.dot_general(
                qb, chunk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, jax.lax.approx_max_k(s, KF, recall_target=0.99)

        _, (nds, nis) = jax.lax.scan(body, None, tbl_b)
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(B, n_chunks * KF)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(B, n_chunks * KF)
        bs, sel = jax.lax.top_k(alld, KF)
        bi = jnp.take_along_axis(alli, sel, axis=1)
        if not rerank:
            return bi[:, :k], bs[:, :k]
        rows = flat[bi]  # [B, KF, d_pad] gather
        s_exact = jnp.einsum(
            "bkd,bd->bk", rows, qs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        ts, ti = jax.lax.top_k(s_exact, k)
        return jnp.take_along_axis(bi, ti, axis=1), ts

    return run


(ids, _), el = timeit(make_current(False), tbl_bf, tbl_flat, qs_d,
                      tag="current: chunked approx_max_k, no rerank")
print(f"  recall {recall(np.asarray(ids)):.4f}", flush=True)
(ids, _), el = timeit(make_current(True), tbl_bf, tbl_flat, qs_d,
                      tag="current: + f32 gather-rerank (KF=26)")
print(f"  recall {recall(np.asarray(ids)):.4f}", flush=True)


# --- 3. group-max design -------------------------------------------------
def make_groupmax(G: int, KG: int, rerank_f32: bool):
    NG = N // G

    @jax.jit
    def run(tbl_b, flat, qs):
        qb = qs.astype(jnp.bfloat16)

        def body(_, chunk):
            s = jax.lax.dot_general(
                qb, chunk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, s.reshape(B, CHUNK // G, G).max(axis=2)

        _, gm = jax.lax.scan(body, None, tbl_b)
        gm = jnp.moveaxis(gm, 0, 1).reshape(B, NG)
        _, gi = jax.lax.approx_max_k(gm, KG, recall_target=0.95)
        # expand KG groups -> KG*G candidate rows
        rows_i = (gi[:, :, None] * G
                  + jnp.arange(G, dtype=jnp.int32)[None, None, :]
                  ).reshape(B, KG * G)
        rows = flat[rows_i]  # [B, KG*G, d_pad]
        if rerank_f32:
            s_exact = jnp.einsum(
                "bkd,bd->bk", rows, qs, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            s_exact = jnp.einsum(
                "bkd,bd->bk", rows.astype(jnp.bfloat16),
                qs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        ts, ti = jax.lax.top_k(s_exact, k)
        return jnp.take_along_axis(rows_i, ti, axis=1), ts

    return run


for G, KG in ((8, 16), (8, 32), (16, 16), (16, 32), (32, 16)):
    try:
        (ids, _), el = timeit(
            make_groupmax(G, KG, True), tbl_bf, tbl_flat, qs_d,
            tag=f"groupmax G={G} KG={KG} f32-rerank")
        print(f"  recall {recall(np.asarray(ids)):.4f}", flush=True)
    except Exception as e:
        print(f"groupmax G={G} KG={KG}: {e!r}", flush=True)


# --- 4. raw gather cost --------------------------------------------------
@jax.jit
def gather_only(flat, idx):
    return flat[idx].sum(axis=2)


idx = jnp.asarray(
    rng.integers(0, N_real, (B, 64)).astype(np.int32))
timeit(gather_only, tbl_flat, idx, tag="gather 64 rows/query f32 + sum")
