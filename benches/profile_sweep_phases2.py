"""Round 2 of the sweep decomposition: shave the 82ms approx_max_k
overhead.  Variants: bf16 score materialization, aggregate_to_topk=False
(defer the exact top-k to one final pass), recall_target sweep, bigger
chunks.  All keep the exact f32 gather-rerank (KF=26) so recall stays
1.0000 given the candidate set contains the true top-10.

Run ON TPU: python benches/profile_sweep_phases2.py
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
k = 10
KF = 26
B = 4096

data = rng.standard_normal((N_real, d)).astype(np.float32)
q = rng.standard_normal((B, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
qs = np.zeros((B, d_pad), dtype=np.float32)
qs[:, :d] = q
qs_d = jnp.asarray(qs)

sub = 256
norm = data / np.linalg.norm(data, axis=1, keepdims=True)
scores_gt = q[:sub] @ norm.T
gt_ids = np.argsort(-scores_gt, axis=1)[:, :k]


def make_tbl(chunk):
    n_chunks = (N_real + chunk - 1) // chunk
    N = n_chunks * chunk
    table = np.zeros((N, d_pad), dtype=np.float32)
    table[:N_real, :d] = norm
    tb = jnp.asarray(table.reshape(n_chunks, chunk, d_pad), dtype=jnp.bfloat16)
    tf = jnp.asarray(table)
    return tb, tf, n_chunks, N


def timeit(fn, *args, reps=5, tag=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
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


def make_variant(chunk, n_chunks, score_bf16, agg, rt):
    @jax.jit
    def run(tbl_b, flat, qs):
        qb = qs.astype(jnp.bfloat16)

        def body(_, cv):
            s = jax.lax.dot_general(
                qb, cv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if score_bf16:
                s = s.astype(jnp.bfloat16)
            nd, ni = jax.lax.approx_max_k(
                s, KF, recall_target=rt, aggregate_to_topk=agg)
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, tbl_b)
        w = nds.shape[2]
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(B, n_chunks * w)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(B, n_chunks * w)
        bs, sel = jax.lax.top_k(alld.astype(jnp.float32), KF)
        bi = jnp.take_along_axis(alli, sel, axis=1)
        rows = flat[bi]
        s_exact = jnp.einsum(
            "bkd,bd->bk", rows, qs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        ts, ti = jax.lax.top_k(s_exact, k)
        return jnp.take_along_axis(bi, ti, axis=1), ts

    return run


for chunk in (1 << 17, 1 << 18):
    tb, tf, n_chunks, N = make_tbl(chunk)
    print(f"--- chunk {chunk} ({n_chunks} chunks, N={N})", flush=True)
    for score_bf16 in (False, True):
        for agg in (True, False):
            for rt in ((0.99,) if agg else (0.99, 0.95)):
                tag = (f"bf16s={int(score_bf16)} agg={int(agg)} rt={rt}")
                try:
                    (ids, _), el = timeit(
                        make_variant(chunk, n_chunks, score_bf16, agg, rt),
                        tb, tf, qs_d, tag=tag)
                    print(f"  recall {recall(np.asarray(ids)):.4f}",
                          flush=True)
                except Exception as e:
                    print(f"{tag}: {type(e).__name__}: {str(e)[:150]}",
                          flush=True)
    del tb, tf
