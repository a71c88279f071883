"""Where does the sweep time go: matmul vs top_k. Tests lax.top_k,
lax.approx_max_k, and a segmax+topk scheme per 131K chunk."""

import time

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config

ensure_jax_config()
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
d_pad, CHUNK, n_chunks, B, k = 128, 1 << 17, 10, 4096, 10
tbl = jnp.asarray(
    rng.standard_normal((n_chunks, CHUNK, d_pad)).astype(np.float32)
)
qs = jnp.asarray(rng.standard_normal((B, d_pad)).astype(np.float32))


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps


def scores_of(chunk, dt=jnp.bfloat16):
    return jax.lax.dot_general(
        qs.astype(dt), chunk.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def matmul_only(tbl, qs):
    def body(carry, chunk):
        s = scores_of(chunk)
        return carry + jnp.sum(s, axis=1), None

    out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), tbl)
    return out


@jax.jit
def with_topk(tbl, qs):
    def body(carry, chunk):
        s = scores_of(chunk)
        nd, ni = jax.lax.top_k(s, k)
        md = jnp.concatenate([carry[0], nd], 1)
        mi = jnp.concatenate([carry[1], ni], 1)
        td, ti = jax.lax.top_k(md, k)
        return (td, jnp.take_along_axis(mi, ti, 1)), None

    init = (jnp.full((B, k), -jnp.inf), jnp.full((B, k), -1, jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, tbl)
    return bd, bi


@jax.jit
def with_approx(tbl, qs):
    def body(carry, chunk):
        s = scores_of(chunk)
        nd, ni = jax.lax.approx_max_k(s, k, recall_target=0.99)
        md = jnp.concatenate([carry[0], nd], 1)
        mi = jnp.concatenate([carry[1], ni], 1)
        td, ti = jax.lax.top_k(md, k)
        return (td, jnp.take_along_axis(mi, ti, 1)), None

    init = (jnp.full((B, k), -jnp.inf), jnp.full((B, k), -1, jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, tbl)
    return bd, bi


@jax.jit
def with_segmax(tbl, qs):
    S = 128

    def body(carry, chunk):
        s = scores_of(chunk)  # [B, CHUNK]
        seg = jnp.max(s.reshape(B, CHUNK // S, S), axis=2)  # [B, C/S]
        sd, si = jax.lax.top_k(seg, k)  # k segments guaranteed superset
        segs = jnp.take_along_axis(
            s.reshape(B, CHUNK // S, S), si[:, :, None], axis=1
        )  # [B, k, S]
        nd, nio = jax.lax.top_k(segs.reshape(B, k * S), k)
        ni = si[:, :, None] * S + jnp.arange(S)[None, None, :]
        ni = ni.reshape(B, k * S)
        ni = jnp.take_along_axis(ni, nio, 1)
        md = jnp.concatenate([carry[0], nd], 1)
        mi = jnp.concatenate([carry[1], ni], 1)
        td, ti = jax.lax.top_k(md, k)
        return (td, jnp.take_along_axis(mi, ti, 1)), None

    init = (jnp.full((B, k), -jnp.inf), jnp.full((B, k), -1, jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, tbl)
    return bd, bi


for name, fn in (
    ("matmul_only", matmul_only),
    ("with_topk", with_topk),
    ("with_approx_max_k", with_approx),
    ("with_segmax", with_segmax),
):
    el = timeit(fn, tbl, qs)
    print(f"{name}: {el*1000:.1f} ms -> {B/el:,.0f} QPS", flush=True)

# correctness check segmax vs topk
bd1, bi1 = with_topk(tbl, qs)
bd2, bi2 = with_segmax(tbl, qs)
print("segmax exact match:", bool(jnp.all(bi1 == bi2)), flush=True)
