"""TPU batched vector search kernels (JAX).

The device-side half of the HNSW redesign (BASELINE.json north star):
instead of the reference's per-candidate KV point-gets
(`runtime/hnsw.rs:869-1012`), a whole batch of queries descends the
hierarchy together:

- upper levels: vectorized greedy descent (`lax.while_loop`, one step
  moves every query to its best neighbor);
- level 0: masked beam search with a fixed-width beam — each iteration
  expands the best unexpanded candidate per query, computes all neighbor
  distances as one batched einsum (MXU), and re-selects the beam with
  `lax.top_k`.  Visited-set semantics are approximated by in-beam dedup +
  a static iteration cap (standard accelerator ANN practice; recall is
  validated against the exact host path in tests).

All shapes are static per (n_pad, beam, m) bucket; n pads to powers of
two so index growth causes O(log n) recompiles."""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np


def _jx():
    from ..utils.jax_setup import ensure_jax_config

    ensure_jax_config()
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _pad_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


# --------------------------------------------------------------- brute force


def brute_force_knn(
    vectors: np.ndarray,
    norms_sq: np.ndarray,
    queries: np.ndarray,
    k: int,
    distance: str,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN via one big matmul + top_k — the MXU sweet spot.
    Used for small indexes, re-ranking, and recall validation."""
    jax, jnp = _jx()
    v = jnp.asarray(vectors, dtype=jnp.float32)
    q = jnp.asarray(queries, dtype=jnp.float32)
    dots = q @ v.T  # [B, N] — MXU
    if distance == "L2":
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        d = qn + jnp.asarray(norms_sq, dtype=jnp.float32)[None, :] - 2.0 * dots
    elif distance == "IP":
        d = 1.0 - dots
    else:  # Cosine
        qn = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
        vn = jnp.sqrt(jnp.asarray(norms_sq, dtype=jnp.float32))[None, :]
        denom = jnp.where(qn * vn > 0, qn * vn, 1.0)
        d = 1.0 - dots / denom
    neg_d, idx = jax.lax.top_k(-d, k)
    return np.asarray(idx, dtype=np.int64), np.asarray(-neg_d, dtype=np.float64)


# ------------------------------------------------------------ device search


_SEARCH_CACHE = {}


def _compiled_search(
    n_pad: int,
    d: int,
    m0: int,
    beam: int,
    k: int,
    n_levels: int,
    m_up: int,
    dist_kind: int,  # 0 L2, 1 IP, 2 Cos
    max_iters: int,
    expand: int = 4,  # candidates expanded per iteration per query
):
    jax, jnp = _jx()

    def dist(qv, cv):  # qv [B, d]; cv [B, K, d] → [B, K]
        dots = jnp.einsum("bkd,bd->bk", cv, qv, preferred_element_type=jnp.float32)
        if dist_kind == 0:
            qn = jnp.sum(qv * qv, axis=1, keepdims=True)
            cn = jnp.sum(cv * cv, axis=2)
            return qn + cn - 2.0 * dots
        if dist_kind == 1:
            return 1.0 - dots
        qn = jnp.sqrt(jnp.sum(qv * qv, axis=1, keepdims=True))
        cn = jnp.sqrt(jnp.sum(cv * cv, axis=2))
        denom = jnp.where(qn * cn > 0, qn * cn, 1.0)
        return 1.0 - dots / denom

    @jax.jit
    def run(vectors, nb0, up_nb, up_down, up_n, entry, alive, qs):
        """vectors [n_pad, d]; nb0 [n_pad, m0]; up_nb [n_levels, n_pad, m_up]
        (global slots; level l row valid only for nodes of level >= l);
        entry scalar; qs [B, d]."""
        B = qs.shape[0]
        cur = jnp.full((B,), entry, dtype=jnp.int32)

        def level_step(l, cur):
            lvl = n_levels - 1 - l  # from top (n_levels) down to 1

            def greedy_cond(state):
                cur, curd, moved = state
                return jnp.any(moved)

            def greedy_body(state):
                cur, curd, moved = state
                nbr = up_nb[lvl, cur]  # [B, m_up]
                valid = nbr >= 0
                cv = vectors[jnp.where(valid, nbr, 0)]
                ds = jnp.where(valid, dist(qs, cv), jnp.inf)
                best = jnp.argmin(ds, axis=1)
                bestd = jnp.take_along_axis(ds, best[:, None], axis=1)[:, 0]
                better = bestd < curd
                new_cur = jnp.where(
                    better, jnp.take_along_axis(nbr, best[:, None], axis=1)[:, 0], cur
                )
                new_d = jnp.where(better, bestd, curd)
                return new_cur.astype(jnp.int32), new_d, better

            curd = dist(qs, vectors[cur][:, None, :])[:, 0]
            cur, _, _ = jax.lax.while_loop(
                greedy_cond, greedy_body, (cur, curd, jnp.ones((B,), bool))
            )
            return cur

        cur = jax.lax.fori_loop(0, n_levels, level_step, cur)

        # ---- level-0 beam search
        ids = jnp.full((B, beam), -1, dtype=jnp.int32)
        ids = ids.at[:, 0].set(cur)
        d0 = dist(qs, vectors[cur][:, None, :])[:, 0]
        dists = jnp.full((B, beam), jnp.inf, dtype=jnp.float32)
        dists = dists.at[:, 0].set(d0)
        expanded = jnp.ones((B, beam), bool).at[:, 0].set(False)

        def cond(state):
            i, ids, dists, expanded = state
            has_work = jnp.any(jnp.logical_not(expanded) & (ids >= 0), axis=1)
            return jnp.logical_and(i < max_iters, jnp.any(has_work))

        def body(state):
            # expand the `expand` best unexpanded candidates per query at
            # once — fewer while iterations, bigger fused gathers (MXU/VPU
            # utilization beats the tiny per-step ops of pointer chasing)
            i, ids, dists, expanded = state
            sel_d = jnp.where(expanded | (ids < 0), jnp.inf, dists)
            neg_sel, sel = jax.lax.top_k(-sel_d, expand)  # [B, E]
            sel_active = -neg_sel < jnp.inf
            sel_ids = jnp.take_along_axis(ids, sel, axis=1)  # [B, E]
            expanded = expanded.at[jnp.arange(B)[:, None], sel].set(True)
            nbr = nb0[jnp.where(sel_active, sel_ids, 0)]  # [B, E, m0]
            nbr = jnp.where(sel_active[:, :, None], nbr, -1)
            nbr = nbr.reshape(B, expand * m0)
            valid = nbr >= 0
            # dedup against current beam
            dup = jnp.any(nbr[:, :, None] == ids[:, None, :], axis=2)
            # dedup within the expansion (earlier occurrence wins)
            em = expand * m0
            tri = jnp.tril(jnp.ones((em, em), bool), k=-1)
            dup_new = jnp.any(
                (nbr[:, :, None] == nbr[:, None, :]) & tri[None, :, :], axis=2
            )
            valid = valid & ~dup & ~dup_new
            cv = vectors[jnp.where(nbr >= 0, nbr, 0)]
            nd = jnp.where(valid, dist(qs, cv), jnp.inf)
            all_ids = jnp.concatenate([ids, jnp.where(valid, nbr, -1)], axis=1)
            all_d = jnp.concatenate([dists, nd], axis=1)
            all_exp = jnp.concatenate([expanded, ~valid], axis=1)
            neg, top = jax.lax.top_k(-all_d, beam)
            new_ids = jnp.take_along_axis(all_ids, top, axis=1)
            new_d = -neg
            new_exp = jnp.take_along_axis(all_exp, top, axis=1)
            return i + 1, new_ids, new_d, new_exp

        _, ids, dists, expanded = jax.lax.while_loop(
            cond, body, (jnp.int32(0), ids, dists, expanded)
        )
        # drop dead nodes, then top-k
        dead = jnp.logical_not(alive[jnp.where(ids >= 0, ids, 0)]) | (ids < 0)
        final_d = jnp.where(dead, jnp.inf, dists)
        neg, top = jax.lax.top_k(-final_d, k)
        out_ids = jnp.take_along_axis(ids, top, axis=1)
        out_d = -neg
        out_ids = jnp.where(jnp.isinf(out_d), -1, out_ids)
        return out_ids, out_d

    return run


_UPDATE_FNS = {}


def _update_fn(n_pad, d, m0, n_levels, m_up, u_pad):
    """Jitted dirty-slot scatter into the resident device mirror."""
    jax, jnp = _jx()
    key = (n_pad, d, m0, n_levels, m_up, u_pad)
    fn = _UPDATE_FNS.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(vectors, nb0, up_nb, alive, idxs, new_vecs, new_nb0, new_up, new_alive):
        vectors = vectors.at[idxs].set(new_vecs)
        nb0 = nb0.at[idxs].set(new_nb0)
        up_nb = up_nb.at[:, idxs].set(jnp.swapaxes(new_up, 0, 1))
        alive = alive.at[idxs].set(new_alive)
        return vectors, nb0, up_nb, alive

    _UPDATE_FNS[key] = run
    return run


def _device_arrays(index):
    """Push the index arrays to device, cached by index.version; small
    mutation sets apply as dirty-slot scatters instead of a full re-push
    (the host↔device link is the bottleneck, see BENCH_NOTES)."""
    jax, jnp = _jx()
    cache = getattr(index, "_dev_cache", None)
    if cache is not None and cache["version"] == index.version:
        return cache
    if cache is not None:
        updated = _try_incremental_update(index, cache)
        if updated is not None:
            return updated
    n = max(index.n, 1)
    n_pad = _pad_pow2(n)
    d = index.dim
    vecs = np.zeros((n_pad, d), dtype=np.float32)
    vecs[: index.n] = index.vectors[: index.n].astype(np.float32)
    nb0 = np.full((n_pad, index.m_max0), -1, dtype=np.int32)
    nb0[: index.n] = index.neighbors[0][: index.n]
    n_levels = len(index.neighbors) - 1
    m_up = index.m_max
    up_nb = np.full((max(n_levels, 1), n_pad, m_up), -1, dtype=np.int32)
    for l in range(1, n_levels + 1):
        up_nb[l - 1, : index.n] = index.neighbors[l][: index.n, :m_up]
    alive = np.zeros(n_pad, dtype=bool)
    alive[: index.n] = index.alive[: index.n]
    cache = {
        "version": index.version,
        "n_pad": n_pad,
        "n_levels": n_levels,
        "m_up": m_up,
        "vectors": jnp.asarray(vecs),
        "nb0": jnp.asarray(nb0),
        "up_nb": jnp.asarray(up_nb),
        "alive": jnp.asarray(alive),
        "entry": int(index.entry),
    }
    index._dev_cache = cache
    index.dev_pending.clear()
    return cache


def _try_incremental_update(index, cache):
    jax, jnp = _jx()
    n_pad = cache["n_pad"]
    n_levels_now = len(index.neighbors) - 1
    pending = index.dev_pending
    if (
        index.n > n_pad
        or n_levels_now != cache["n_levels"]
        or not pending
        or len(pending) > max(1024, n_pad // 16)
    ):
        return None
    idxs = np.fromiter(sorted(pending), dtype=np.int32)
    u = len(idxs)
    u_pad = _pad_pow2(u)
    # pad by repeating the first slot (idempotent double-writes)
    idxs_p = np.full(u_pad, idxs[0], dtype=np.int32)
    idxs_p[:u] = idxs
    d = index.dim
    m0 = index.m_max0
    m_up = cache["m_up"]
    n_levels = cache["n_levels"]
    new_vecs = index.vectors[idxs_p].astype(np.float32)
    new_nb0 = index.neighbors[0][idxs_p]
    new_up = np.full((u_pad, max(n_levels, 1), m_up), -1, dtype=np.int32)
    for l in range(1, n_levels + 1):
        new_up[:, l - 1, :] = index.neighbors[l][idxs_p, :m_up]
    new_alive = index.alive[idxs_p]
    fn = _update_fn(n_pad, d, m0, max(n_levels, 1), m_up, u_pad)
    vectors, nb0, up_nb, alive = fn(
        cache["vectors"],
        cache["nb0"],
        cache["up_nb"],
        cache["alive"],
        jnp.asarray(idxs_p),
        jnp.asarray(new_vecs),
        jnp.asarray(new_nb0),
        jnp.asarray(new_up),
        jnp.asarray(new_alive),
    )
    cache.update(
        version=index.version,
        vectors=vectors,
        nb0=nb0,
        up_nb=up_nb,
        alive=alive,
        entry=int(index.entry),
    )
    pending.clear()
    return cache


def hnsw_search_device(index, qs: np.ndarray, k: int, ef: int, expand: int = None):
    jax, jnp = _jx()
    dev = _device_arrays(index)
    dist_kind = {"L2": 0, "IP": 1, "Cosine": 2}[index.distance]
    beam = max(ef, k)
    beam = int(math.ceil(beam / 8) * 8)
    if expand is None:
        expand = int(__import__("os").environ.get("COZO_TPU_HNSW_EXPAND", "8"))
    max_iters = (beam + expand - 1) // expand + 8
    key = (
        dev["n_pad"],
        index.dim,
        index.m_max0,
        beam,
        k,
        dev["n_levels"],
        dev["m_up"],
        dist_kind,
        max_iters,
        expand,
    )
    fn = _SEARCH_CACHE.get(key)
    if fn is None:
        fn = _compiled_search(*key)
        _SEARCH_CACHE[key] = fn
    out_ids, out_d = fn(
        dev["vectors"],
        dev["nb0"],
        dev["up_nb"],
        None,
        None,
        jnp.int32(dev["entry"]),
        dev["alive"],
        jnp.asarray(qs, dtype=jnp.float32),
    )
    return np.asarray(out_ids, dtype=np.int64), np.asarray(out_d, dtype=np.float64)
