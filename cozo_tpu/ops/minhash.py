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


def _mix32_inplace(x: np.ndarray) -> None:
    # murmur3 fmix32 — a well-mixed 32-bit permutation.  In-place ufuncs:
    # the bulk-backfill path runs this over [tokens, n_perm] blocks where
    # one temporary per op costs more than the arithmetic.
    t = np.empty_like(x)
    np.right_shift(x, 16, out=t)
    np.bitwise_xor(x, t, out=x)
    np.multiply(x, np.uint32(0x85EBCA6B), out=x)
    np.right_shift(x, 13, out=t)
    np.bitwise_xor(x, t, out=x)
    np.multiply(x, np.uint32(0xC2B2AE35), out=x)
    np.right_shift(x, 16, out=t)
    np.bitwise_xor(x, t, out=x)


def _mix32_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32, copy=True)
    _mix32_inplace(x)
    return x


def hash_tokens(tokens: List[str]) -> np.ndarray:
    """Stable 32-bit hashes of strings (FNV-1a), vectorized over tokens:
    byte columns of a padded [T, L] matrix are folded in L rounds, with a
    mask freezing each hash once its token ends.  Bit-identical to the
    per-byte reference loop (verified in tests/test_lsh.py)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    bs = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    lmax = int(lens.max()) if n else 0
    mat = np.zeros((n, lmax), dtype=np.uint8)
    for i, b in enumerate(bs):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, 2166136261, dtype=np.uint32)
    prime = np.uint32(16777619)
    for j in range(lmax):
        hj = (h ^ mat[:, j]) * prime
        h = np.where(lens > j, hj, h)
    return h


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


def minhash_segments(
    flat_hashes: np.ndarray, offsets: np.ndarray, n_perm: int
) -> np.ndarray:
    """Minhash signatures for a batch of variable-length docs in one shot.

    `flat_hashes` is the concatenation of every doc's element hashes;
    `offsets[d]` is doc d's start (offsets[-1] == len(flat_hashes) is NOT
    included).  Empty docs get the all-0xFFFFFFFF signature, matching
    `minhash([])`.  Host-vectorized: one [T, n_perm] mix + a reduceat —
    this is the bulk LSH backfill path (per-doc `minhash` costs ~50µs of
    numpy dispatch; a 4096-doc chunk through here costs ~6µs/doc)."""
    n_docs = len(offsets)
    if n_docs == 0:
        return np.empty((0, n_perm), dtype=np.uint32)
    seeds = perm_seeds(n_perm)
    total = len(flat_hashes)
    if total == 0:
        return np.full((n_docs, n_perm), _U32, dtype=np.uint32)
    # a trailing all-max row keeps every offset a valid index (offsets[d]
    # may equal `total` for trailing empty docs) and is neutral under min
    # for the final segment, which reduceat extends to the end of the array
    mixed = np.empty((total + 1, n_perm), dtype=np.uint32)
    np.bitwise_xor(
        flat_hashes.astype(np.uint32)[:, None], seeds[None, :],
        out=mixed[:total],
    )
    _mix32_inplace(mixed[:total])
    mixed[total] = _U32
    offsets = np.asarray(offsets, dtype=np.int64)
    sigs = np.minimum.reduceat(mixed, offsets, axis=0)
    # reduceat returns the element AT the offset for an interior empty
    # segment (offsets[d] == offsets[d+1] < total) — overwrite those
    ends = np.append(offsets[1:], total)
    empty = ends <= offsets
    if empty.any():
        sigs[empty] = _U32
    return sigs.astype(np.uint32)


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
