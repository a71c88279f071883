"""Phase profile of the PageRank spMV at pokec-large scale.

CAVEAT (measured): probes whose body is loop-invariant (gather of a
non-carried array) get hoisted by XLA (LICM) and report ~30ms/iter —
those numbers are bogus.  Only the loop-CARRIED variants measure real
per-iteration cost: ~340-400ms/iter at 32M edges, of which the per-edge
random gather is ~250ms (126M elem/s, latency-bound — flat across
dtype/table size).  Conclusion recorded in BENCH_NOTES: single-chip
10-iteration PageRank sits within ~10%% of the gather floor; the
scale-out lever is edge-sharding across chips (sharded_pagerank_step),
not further single-chip tuning."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config
ensure_jax_config()
import jax
import jax.numpy as jnp

NV, NE = 1_632_803, 32_000_000
CH = 8192
rng = np.random.default_rng(0)
src = (rng.pareto(1.3, NE) * 40).astype(np.int64) % NV
dst = rng.integers(0, NV, NE).astype(np.int64)
order = np.argsort(dst, kind="stable")
src_by_dst = src[order].astype(np.int32)

e_pad = ((NE + CH - 1) // CH) * CH
n_pad = 1 << 21
sbd = np.zeros(e_pad, np.int32)
sbd[:NE] = src_by_dst
counts = np.bincount(dst, minlength=n_pad).astype(np.int64)
in_ptr = np.zeros(n_pad + 1, np.int64)
in_ptr[1:] = np.cumsum(counts)
out_deg = np.bincount(src, minlength=n_pad).astype(np.float32)

d_sbd = jax.device_put(jnp.asarray(sbd))
d_inptr = jax.device_put(jnp.asarray(in_ptr.astype(np.int32)))
d_deg = jax.device_put(jnp.asarray(out_deg))
ranks = jax.device_put(jnp.full(n_pad, 1.0 / NV, jnp.float32))

ITERS = 10

def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)  # force through the relay
    t0 = time.time()
    out = fn(*args)
    np.asarray(out)
    el = time.time() - t0
    print(f"{name:28s} {el*1000/ITERS:8.1f} ms/iter  ({el:.2f}s / {ITERS})",
          flush=True)
    return el

@jax.jit
def gather_only(r, idx):
    def body(_, acc):
        return acc + r[idx].sum() * 1e-9  # full consume (no DCE)
    return jax.lax.fori_loop(0, ITERS, body, 0.0)

@jax.jit
def gather_cumsum(r, idx):
    def body(_, acc):
        vals = r[idx].reshape(-1, CH)
        local = jnp.cumsum(vals, axis=1)
        return acc + local.sum() * 1e-9
    return jax.lax.fori_loop(0, ITERS, body, 0.0)

@jax.jit
def full_body(r, idx, inptr, deg):
    def prefix_at(local, chunk_pref, q):
        c = q // CH
        rr = q % CH
        flat = local.reshape(-1)
        loc = jnp.where(rr > 0, flat[jnp.maximum(q - 1, 0)], 0.0)
        return chunk_pref[c] + loc
    def body(_, ranks):
        contrib = ranks / jnp.where(deg > 0, deg, 1.0)
        vals = contrib[idx].reshape(-1, CH)
        local = jnp.cumsum(vals, axis=1)
        chunk_pref = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(local[:, -1])])
        g = prefix_at(local, chunk_pref, inptr)
        incoming = g[1:] - g[:-1]
        return 0.15 / NV + 0.85 * incoming
    return jax.lax.fori_loop(0, ITERS, body, r)

@jax.jit
def gather_bf16(r, idx):
    def body(_, acc):
        rb = r.astype(jnp.bfloat16)
        return acc + rb[idx].astype(jnp.float32).sum() * 1e-9
    return jax.lax.fori_loop(0, ITERS, body, 0.0)

@jax.jit
def take_gather(r, idx):
    def body(_, acc):
        return acc + jnp.take(r, idx, indices_are_sorted=False).sum() * 1e-9
    return jax.lax.fori_loop(0, ITERS, body, 0.0)

@jax.jit
def take_sorted(r, idx):
    def body(_, acc):
        return acc + jnp.take(r, idx, indices_are_sorted=True).sum() * 1e-9
    return jax.lax.fori_loop(0, ITERS, body, 0.0)

@jax.jit
def onehot_seg(r, idx, inptr, deg):
    # segment-sum via jax.ops.segment_sum for comparison
    def body(_, ranks):
        contrib = ranks / jnp.where(deg > 0, deg, 1.0)
        vals = contrib[idx]
        seg = jnp.zeros(n_pad, jnp.float32)
        # diff-of-prefix without two-level: one flat cumsum
        flat = jnp.cumsum(vals)
        g = jnp.where(inptr > 0, flat[jnp.maximum(inptr - 1, 0)], 0.0)
        incoming = g[1:] - g[:-1]
        return 0.15 / NV + 0.85 * incoming + seg[:n_pad] * 0
    return jax.lax.fori_loop(0, ITERS, body, r)

print(f"E={NE/1e6:.0f}M, e_pad={e_pad/1e6:.1f}M, n_pad={n_pad/1e6:.2f}M", flush=True)
timeit("gather only", gather_only, ranks, d_sbd)
timeit("gather bf16", gather_bf16, ranks, d_sbd)
timeit("take sorted-hint", take_sorted, ranks, d_sbd)
timeit("gather + chunk cumsum", gather_cumsum, ranks, d_sbd)
timeit("full body (two-level)", full_body, ranks, d_sbd, d_inptr, d_deg)
timeit("full body (flat cumsum)", onehot_seg, ranks, d_sbd, d_inptr, d_deg)
