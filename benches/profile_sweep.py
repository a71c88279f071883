"""Chunked exact k-NN sweep at glove scale (1.18M x 100-d): measure
QPS and bf16-vs-f32 recall. The TPU-native alternative to graph
traversal: the MXU makes exact search compute-bound at large batch."""

import time

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config

ensure_jax_config()
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N_real = 1_183_514  # glove-100 size
d = 100
d_pad = 128
CHUNK = 1 << 17  # 131072
n_chunks = (N_real + CHUNK - 1) // CHUNK
N = n_chunks * CHUNK
k = 10

print(f"N={N_real} padded {N} ({n_chunks} chunks of {CHUNK})", flush=True)
data = rng.standard_normal((N_real, d)).astype(np.float32)
# cosine: pre-normalize rows; padded rows zero
table = np.zeros((N, d_pad), dtype=np.float32)
table[:N_real, :d] = data / np.linalg.norm(data, axis=1, keepdims=True)


def make_sweep(dt):
    @jax.jit
    def sweep(tbl, qs):
        # tbl [n_chunks, CHUNK, d_pad]; qs [B, d_pad] (normalized)
        def body(carry, chunk):
            best_d, best_i, ci = carry
            scores = jax.lax.dot_general(
                qs.astype(dt), chunk.astype(dt),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, CHUNK] cosine similarity
            nd, ni = jax.lax.top_k(scores, k)
            ni = ni + ci * CHUNK
            md = jnp.concatenate([best_d, nd], axis=1)
            mi = jnp.concatenate([best_i, ni], axis=1)
            td, ti = jax.lax.top_k(md, k)
            return (td, jnp.take_along_axis(mi, ti, axis=1), ci + 1), None

        B = qs.shape[0]
        init = (
            jnp.full((B, k), -jnp.inf, jnp.float32),
            jnp.full((B, k), -1, jnp.int32),
            jnp.int32(0),
        )
        (bd, bi, _), _ = jax.lax.scan(body, init, tbl)
        return bi, bd

    return sweep


tbl = jnp.asarray(table.reshape(n_chunks, CHUNK, d_pad))

B = 4096
q = rng.standard_normal((B, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
qs = np.zeros((B, d_pad), dtype=np.float32)
qs[:, :d] = q
qs = jnp.asarray(qs)

# f32 ground truth on a query subset (numpy, chunked)
gt_ids = None
sub = 256
scores = q[:sub] @ table[:N_real, :d].T  # [sub, N]
gt_ids = np.argsort(-scores, axis=1)[:, :k]

for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
    sweep = make_sweep(dt)
    t0 = time.time()
    ids, dists = sweep(tbl, qs)
    ids = np.asarray(ids)
    print(f"{dt_name}: first call {time.time()-t0:.1f}s", flush=True)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        ids, dists = sweep(tbl, qs)
        ids_np = np.asarray(ids)
    el = (time.time() - t0) / reps
    hits = sum(
        len(set(gt_ids[i].tolist()) & set(ids_np[i].tolist())) for i in range(sub)
    )
    rec = hits / (sub * k)
    flops = 2 * B * N * d_pad
    print(
        f"{dt_name}: {el*1000:.1f} ms/batch -> {B/el:,.0f} QPS exact, "
        f"recall@10 vs f32 = {rec:.4f} ({flops/el/1e12:.1f} TFLOP/s)",
        flush=True,
    )
