"""Isolate the row-gather cost at 1M scale: d=100 vs d=128 (lane-aligned),
f32 vs bf16, and compare with a contiguous block-sweep (the IVF-style
alternative access pattern)."""

import time

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config

ensure_jax_config()
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N = 1 << 20
B, E = 4096, 256


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    out = np.asarray(out[0] if isinstance(out, tuple) else out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        outm = np.asarray(out[0] if isinstance(out, tuple) else out)
    return (time.time() - t0) / reps


for d in (100, 128):
    for dt in (jnp.float32, jnp.bfloat16):
        V = jnp.asarray(rng.standard_normal((N, d)), dtype=dt)
        ids = jnp.asarray(rng.integers(0, N, (B, E)).astype(np.int32))
        qs = jnp.asarray(rng.standard_normal((B, d)), dtype=dt)

        @jax.jit
        def gather_dist(V, ids, qs):
            cv = V[ids]  # [B, E, d]
            dots = jnp.einsum(
                "bed,bd->be", cv, qs, preferred_element_type=jnp.float32
            )
            cn = jnp.sum(cv.astype(jnp.float32) * cv.astype(jnp.float32), axis=2)
            return cn - 2.0 * dots

        el = timeit(gather_dist, V, ids, qs)
        gb = B * E * d * V.dtype.itemsize / 1e9
        print(
            f"gather+dist d={d} {V.dtype.name}: {el*1000:.1f} ms "
            f"({gb/el:.1f} GB/s effective)",
            flush=True,
        )

# contiguous block sweep: score B queries against chunks of the table
d = 128
V = jnp.asarray(rng.standard_normal((N, d)), dtype=jnp.bfloat16)
qs = jnp.asarray(rng.standard_normal((B, d)), dtype=jnp.bfloat16)

@jax.jit
def sweep(V, qs):
    # one pass over the whole 1M-row table: [B, N] scores via matmul, top-k
    scores = jax.lax.dot_general(
        qs, V, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    neg, idx = jax.lax.top_k(-scores, 10)
    return idx

el = timeit(sweep, V, qs)
flops = 2 * B * N * d
print(
    f"full-table sweep bf16 [B=4096 x 1M x 128] + top10: {el*1000:.1f} ms "
    f"({flops/el/1e12:.1f} TFLOP/s) -> {B/el:,.0f} QPS exact",
    flush=True,
)
