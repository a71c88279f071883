"""Vectorized MinHash (reference `runtime/minhash_lsh.rs:291-341`,
redesigned as hash matmuls per SURVEY.md §7.6).

The reference takes min over per-seed xxhash32 values; here each element
hashes through a seeded 32-bit integer mixer, vectorized as an
`[n_elements, n_perm]` numpy/JAX broadcast followed by a min-reduce —
one fused elementwise pass on the VPU for large batches."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

_U32 = 0xFFFFFFFF


def _mix32_np(x: np.ndarray) -> np.ndarray:
    # murmur3 fmix32 — a well-mixed 32-bit permutation
    x = x.astype(np.uint32)
    x ^= x >> np.uint32(16)
    x = (x * np.uint32(0x85EBCA6B)) & np.uint32(_U32)
    x ^= x >> np.uint32(13)
    x = (x * np.uint32(0xC2B2AE35)) & np.uint32(_U32)
    x ^= x >> np.uint32(16)
    return x


def hash_tokens(tokens: List[str]) -> np.ndarray:
    """Stable 32-bit hashes of strings (FNV-1a)."""
    out = np.empty(len(tokens), dtype=np.uint32)
    for i, t in enumerate(tokens):
        h = np.uint32(2166136261)
        for b in t.encode("utf-8"):
            h = np.uint32((int(h) ^ b) * 16777619 & _U32)
        out[i] = h
    return out


_SEEDS_CACHE = {}


def perm_seeds(n_perm: int) -> np.ndarray:
    s = _SEEDS_CACHE.get(n_perm)
    if s is None:
        rng = np.random.RandomState(0x5EED)
        s = rng.randint(0, 1 << 32, size=n_perm, dtype=np.uint64).astype(np.uint32)
        _SEEDS_CACHE[n_perm] = s
    return s


def minhash(element_hashes: np.ndarray, n_perm: int) -> np.ndarray:
    """[E] element hashes → [n_perm] minhash signature (uint32)."""
    if len(element_hashes) == 0:
        return np.full(n_perm, _U32, dtype=np.uint32)
    seeds = perm_seeds(n_perm)
    h = _mix32_np(element_hashes[:, None] ^ seeds[None, :])
    return h.min(axis=0)


def minhash_batch_jax(element_hash_mat: np.ndarray, mask: np.ndarray, n_perm: int):
    """Batched device minhash: [B, E_pad] hashes + validity mask →
    [B, n_perm] signatures.  Used for bulk LSH builds."""
    import jax
    import jax.numpy as jnp

    seeds = jnp.asarray(perm_seeds(n_perm))

    @jax.jit
    def run(hm, mk):
        x = hm[:, :, None] ^ seeds[None, None, :]
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        x = jnp.where(mk[:, :, None], x, jnp.uint32(_U32))
        return x.min(axis=1)

    return np.asarray(run(jnp.asarray(element_hash_mat), jnp.asarray(mask)))


def find_optimal_params(
    threshold: float, n_perm: int, fp_weight: float, fn_weight: float
) -> Tuple[int, int]:
    """Choose (n_bands, rows_per_band) minimizing weighted FP+FN probability
    mass (reference `minhash_lsh.rs:259-289`, quadrature over the S-curve)."""
    s = np.linspace(0.0, 1.0, 201)
    ds = s[1] - s[0]
    best = (1, n_perm)
    best_err = math.inf
    for r in range(1, n_perm + 1):
        b = n_perm // r
        if b < 1:
            break
        p = 1.0 - (1.0 - s**r) ** b  # P(candidate | similarity s)
        fp = float(np.trapezoid(p[s <= threshold], dx=ds))
        fn = float(np.trapezoid(1.0 - p[s >= threshold], dx=ds))
        err = fp_weight * fp + fn_weight * fn
        if err < best_err:
            best_err = err
            best = (b, r)
    return best


def band_keys(signature: np.ndarray, n_bands: int, rows_per_band: int) -> List[bytes]:
    out = []
    for i in range(n_bands):
        chunk = signature[i * rows_per_band : (i + 1) * rows_per_band]
        out.append(chunk.tobytes())
    return out


def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))
