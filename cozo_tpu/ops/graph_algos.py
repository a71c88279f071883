"""TPU graph kernels: CSR spMV iterations in JAX.

The host stages graphs as numpy CSR (`fixed_payload.as_directed_graph`);
these kernels run the iteration loops on device.  Design notes
(tpu-first, per SURVEY.md §7.5):

- spMV is expressed as segment-sum gathers over the edge list — XLA lowers
  `segment_sum` onto the VPU with good HBM utilization; no dynamic shapes.
- iteration counts are static (`lax.fori_loop` / unrolled scan), keeping a
  single compiled executable per (n_nodes, n_edges) bucket; sizes are
  padded to the next power of two to bound recompiles.
- multi-chip: edges are shardable along the edge axis with a `psum` over
  partial rank contributions (see `cozo_tpu.parallel.mesh`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np

_JAX = None


def _jax():
    global _JAX
    if _JAX is None:
        import jax
        import jax.numpy as jnp

        _JAX = (jax, jnp)
    return _JAX


def _pad_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def pagerank_numpy(indptr, dst, theta=0.85, epsilon=1e-4, iterations=10):
    n = len(indptr) - 1
    out_deg = np.diff(indptr).astype(np.float64)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    ranks = np.full(n, 1.0 / n)
    safe_deg = np.where(out_deg > 0, out_deg, 1.0)
    for _ in range(iterations):
        contrib = ranks / safe_deg
        incoming = np.zeros(n)
        np.add.at(incoming, dst, contrib[src])
        dangling = ranks[out_deg == 0].sum()
        new_ranks = (1 - theta) / n + theta * (incoming + dangling / n)
        if np.abs(new_ranks - ranks).sum() < epsilon:
            ranks = new_ranks
            break
        ranks = new_ranks
    return ranks


def _pagerank_jax_compiled(n_pad: int, e_pad: int, iterations: int, theta: float):
    jax, jnp = _jax()

    @partial(jax.jit, static_argnums=())
    def run(src, dst, out_deg, n_real):
        n = n_pad
        inv_n = 1.0 / n_real
        ranks = jnp.where(
            jnp.arange(n) < n_real, jnp.full((n,), inv_n), 0.0
        ).astype(jnp.float32)
        safe_deg = jnp.where(out_deg > 0, out_deg, 1.0)
        is_dangling = (out_deg == 0) & (jnp.arange(n) < n_real)

        def body(_, ranks):
            contrib = ranks / safe_deg
            edge_vals = contrib[src]
            incoming = jax.ops.segment_sum(edge_vals, dst, num_segments=n)
            dangling = jnp.sum(jnp.where(is_dangling, ranks, 0.0))
            new_ranks = (1 - theta) * inv_n + theta * (incoming + dangling * inv_n)
            return jnp.where(jnp.arange(n) < n_real, new_ranks, 0.0)

        return jax.lax.fori_loop(0, iterations, body, ranks)

    return run


_PAGERANK_CACHE = {}


def pagerank_jax(indptr, dst, theta=0.85, iterations=10):
    jax, jnp = _jax()
    n = len(indptr) - 1
    e = len(dst)
    # always reserve a dummy slot (rank forced to 0) for padded edges
    n_pad, e_pad = _pad_pow2(n + 1), _pad_pow2(max(e, 1))
    dummy = n_pad - 1
    src = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
    src_p = np.full(e_pad, dummy, dtype=np.int32)
    dst_p = np.full(e_pad, dummy, dtype=np.int32)
    src_p[:e] = src
    dst_p[:e] = dst
    out_deg = np.ones(n_pad, dtype=np.float32)  # 1.0 on padding avoids 0/0
    out_deg[:n] = np.diff(indptr)
    key = (n_pad, e_pad, iterations, float(theta))
    fn = _PAGERANK_CACHE.get(key)
    if fn is None:
        fn = _pagerank_jax_compiled(n_pad, e_pad, iterations, float(theta))
        _PAGERANK_CACHE[key] = fn
    ranks = fn(
        jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(out_deg), np.float32(n)
    )
    return np.asarray(ranks)[:n].astype(np.float64)


def pagerank(indptr, dst, theta=0.85, epsilon=1e-4, iterations=10, use_tpu=False):
    if use_tpu:
        try:
            return pagerank_jax(indptr, dst, theta=theta, iterations=iterations)
        except Exception:  # pragma: no cover - device fallback
            pass
    return pagerank_numpy(
        indptr, dst, theta=theta, epsilon=epsilon, iterations=iterations
    )


# ---------------------------------------------------------------------------
# batched single-source shortest paths (device Bellman-Ford relaxation)


_SSSP_CACHE = {}


def _sssp_compiled(n_pad: int, e_pad: int, max_iters: int):
    jax, jnp = _jax()

    @jax.jit
    def run(src, dst, w, dist0):
        """src/dst [E]; w [E]; dist0 [S, n_pad] → (dist, parent [S, n_pad]).

        Edge-parallel relaxation: every iteration relaxes ALL edges for ALL
        sources at once (segment-min over the edge axis) — the spMV-style
        dual of Dijkstra that maps onto the VPU, converging in diameter
        iterations (SURVEY.md §7.5: delta-stepping/Bellman-Ford relaxations
        instead of a binary heap)."""

        S = dist0.shape[0]

        def cond(state):
            i, dist, parent, changed = state
            return jnp.logical_and(i < max_iters, changed)

        def body(state):
            i, dist, parent, _ = state
            cand = dist[:, src] + w[None, :]  # [S, E]
            # min over incoming edges per node
            new_dist = jax.vmap(
                lambda c: jax.ops.segment_min(c, dst, num_segments=n_pad)
            )(cand)
            new_dist = jnp.minimum(new_dist, dist)
            improved = new_dist < dist
            # pick a witness edge per improved node: max edge id among
            # edges achieving the new minimum
            achieves = cand <= new_dist[:, dst] + 0.0
            eids = jnp.arange(e_pad, dtype=jnp.int32)
            witness = jax.vmap(
                lambda a: jax.ops.segment_max(
                    jnp.where(a, eids, -1), dst, num_segments=n_pad
                )
            )(achieves)
            new_parent = jnp.where(
                improved & (witness >= 0), src[jnp.where(witness >= 0, witness, 0)],
                parent,
            )
            changed = jnp.any(improved)
            return i + 1, new_dist, new_parent, changed

        parent0 = jnp.full(dist0.shape, -1, dtype=jnp.int32)
        _, dist, parent, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), dist0, parent0, jnp.bool_(True))
        )
        return dist, parent

    return run


def sssp_device(indptr, dst, w, sources, max_iters: int = 512):
    """Batched SSSP over CSR; returns (dist [S, n], parent [S, n]) numpy."""
    jax, jnp = _jax()
    n = len(indptr) - 1
    e = len(dst)
    n_pad = _pad_pow2(n + 1)
    e_pad = _pad_pow2(max(e, 1))
    dummy = n_pad - 1
    src = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
    src_p = np.full(e_pad, dummy, dtype=np.int32)
    dst_p = np.full(e_pad, dummy, dtype=np.int32)
    w_p = np.full(e_pad, np.inf, dtype=np.float32)
    src_p[:e] = src
    dst_p[:e] = dst
    w_p[:e] = w
    S = len(sources)
    dist0 = np.full((S, n_pad), np.inf, dtype=np.float32)
    for i, s in enumerate(sources):
        dist0[i, s] = 0.0
    key = (n_pad, e_pad, max_iters)
    fn = _SSSP_CACHE.get(key)
    if fn is None:
        fn = _sssp_compiled(n_pad, e_pad, max_iters)
        _SSSP_CACHE[key] = fn
    dist, parent = fn(
        jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(w_p), jnp.asarray(dist0)
    )
    return (
        np.asarray(dist)[:, :n].astype(np.float64),
        np.asarray(parent)[:, :n].astype(np.int64),
    )
