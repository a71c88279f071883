"""Pallas TPU kernels for the vector-search hot path.

`knn_pallas`: fused exact k-NN — streams the vector table through VMEM in
tiles, computes the distance block on the MXU, and maintains the running
top-k per query in the output refs, so the full [B, N] distance matrix
never touches HBM (the XLA fallback in `vector_search.brute_force_knn`
materializes it).  Used for wave-build candidate generation and
re-ranking.

Grid: one step per vector tile; outputs are revisited every step
(sequential TPU grid), acting as on-chip accumulators."""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


def _pad_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=64)
def _build_knn(B: int, d: int, N: int, T: int, K: int, dist_kind: int, interpret: bool):
    from ..utils.jax_setup import ensure_jax_config

    ensure_jax_config()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = N // T

    def kernel(n_ref, q_ref, vt_ref, outd_ref, outi_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            outd_ref[:] = jnp.full((B, K), jnp.inf, dtype=jnp.float32)
            outi_ref[:] = jnp.full((B, K), -1, dtype=jnp.int32)

        q = q_ref[:]  # [B, d]
        vt = vt_ref[:]  # [T, d]
        dots = jnp.dot(q, vt.T, preferred_element_type=jnp.float32)  # MXU
        qn = jnp.sum(q * q, axis=1, keepdims=True)  # [B, 1]
        vn = jnp.sum(vt * vt, axis=1)[None, :]  # [1, T]
        if dist_kind == 0:  # L2 (squared)
            dist = qn + vn - 2.0 * dots
        elif dist_kind == 1:  # IP
            dist = 1.0 - dots
        else:  # Cosine
            denom = jnp.sqrt(qn) * jnp.sqrt(vn)
            denom = jnp.where(denom > 0, denom, 1.0)
            dist = 1.0 - dots / denom
        col = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        gid = col + t * T
        dist = jnp.where(gid < n_ref[0, 0], dist, jnp.inf)

        cd = jnp.concatenate([outd_ref[:], dist], axis=1)  # [B, K+T]
        ci = jnp.concatenate([outi_ref[:], gid], axis=1)
        ncols = K + T
        colids = jax.lax.broadcasted_iota(jnp.int32, (B, ncols), 1)
        new_d = []
        new_i = []
        for _ in range(K):
            sel = jnp.argmin(cd, axis=1)  # [B]
            selmask = colids == sel[:, None]
            new_d.append(jnp.min(cd, axis=1))
            new_i.append(jnp.sum(jnp.where(selmask, ci, 0), axis=1))
            cd = jnp.where(selmask, jnp.inf, cd)
        outd_ref[:] = jnp.stack(new_d, axis=1)
        outi_ref[:] = jnp.stack(new_i, axis=1).astype(jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
        ],
        interpret=interpret,
    )
    return jax.jit(lambda nr, q, v: fn(nr, q, v))


def knn_pallas(
    vectors: np.ndarray,
    norms_sq: np.ndarray,
    queries: np.ndarray,
    k: int,
    distance: str = "L2",
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN with a fused tiled kernel; returns (ids, dists)."""
    import jax.numpy as jnp

    n, d = vectors.shape
    B = queries.shape[0]
    N = max(_pad_pow2(n), tile)
    T = min(tile, N)
    K = k
    v = np.zeros((N, d), dtype=np.float32)
    v[:n] = vectors.astype(np.float32)
    q = queries.astype(np.float32)
    dist_kind = {"L2": 0, "IP": 1, "Cosine": 2}[distance]
    fn = _build_knn(B, d, N, T, K, dist_kind, interpret)
    n_real = np.array([[n]], dtype=np.int32)
    outd, outi = fn(jnp.asarray(n_real), jnp.asarray(q), jnp.asarray(v))
    ids = np.asarray(outi, dtype=np.int64)
    dists = np.asarray(outd, dtype=np.float64)
    ids = np.where(ids < n, ids, -1)
    return ids, np.where(ids >= 0, dists, np.inf)
