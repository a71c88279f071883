"""Sweep tuning: batch scaling, bf16-stored table, recall_target cost."""

import time

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config

ensure_jax_config()
import jax
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
d_pad, CHUNK, n_chunks, k = 128, 1 << 17, 10, 10


def timeit(fn, *args, reps=3):
    out = np.asarray(fn(*args)[0])
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(fn(*args)[0])
    return (time.time() - t0) / reps


@partial(jax.jit, static_argnums=(2,))
def sweep(tbl, qs, rt):
    B = qs.shape[0]

    def body(carry, chunk):
        s = jax.lax.dot_general(
            qs.astype(jnp.bfloat16), chunk.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        nd, ni = jax.lax.approx_max_k(s, k, recall_target=rt)
        md = jnp.concatenate([carry[0], nd], 1)
        mi = jnp.concatenate([carry[1], ni], 1)
        td, ti = jax.lax.top_k(md, k)
        return (td, jnp.take_along_axis(mi, ti, 1)), None

    init = (jnp.full((B, k), -jnp.inf), jnp.full((B, k), -1, jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, tbl)
    return bd, bi


for dt in (jnp.float32, jnp.bfloat16):
    tbl = jnp.asarray(
        rng.standard_normal((n_chunks, CHUNK, d_pad)).astype(np.float32), dtype=dt
    )
    for B in (4096, 16384):
        qs = jnp.asarray(rng.standard_normal((B, d_pad)).astype(np.float32))
        for rt in (0.99, 0.999):
            el = timeit(sweep, tbl, qs, rt)
            print(
                f"tbl={dt.__name__} B={B} rt={rt}: {el*1000:.1f} ms "
                f"-> {B/el:,.0f} QPS",
                flush=True,
            )
