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
    total = int(lens.sum())
    if lmax == 0:
        return np.full(n, 2166136261, dtype=np.uint32)
    # one joined buffer + a [n, lmax] gather (the per-token fill loop cost
    # 2s per 100K-doc backfill chunk batch)
    arr = np.frombuffer(b"".join(bs), dtype=np.uint8)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    np.cumsum(lens[:-1], out=starts[1:])
    cols = np.arange(lmax, dtype=np.int64)
    idx = np.minimum(starts[:, None] + cols[None, :], total - 1)
    valid = cols[None, :] < lens[:, None]
    mat = np.where(valid, arr[idx], np.uint8(0))
    h = np.full(n, 2166136261, dtype=np.uint32)
    prime = np.uint32(16777619)
    for j in range(lmax):
        hj = (h ^ mat[:, j]) * prime
        h = np.where(lens > j, hj, h)
    return h


def hash_tokens_dedup(tokens: List[str]) -> np.ndarray:
    """hash_tokens with duplicate folding: backfill chunks repeat the
    same vocabulary heavily, and FNV folding cost scales with rows."""
    uniq: dict = {}
    inv = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        j = uniq.get(t)
        if j is None:
            j = len(uniq)
            uniq[t] = j
        inv[i] = j
    hu = hash_tokens(list(uniq))
    return hu[inv]


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


_HOST_BLOCK_TOKENS = 32_768


def minhash_segments(
    flat_hashes: np.ndarray, offsets: np.ndarray, n_perm: int
) -> np.ndarray:
    """Tiled driver for `_minhash_segments_block`: the [T, n_perm] mixed
    matrix at T=425K (a 32K-doc backfill chunk) is 218MB — the six fmix
    passes thrash LLC (measured 30s/100K docs).  Tiling doc ranges to
    ~32K tokens keeps each tile cache-resident (~16MB)."""
    n_docs = len(offsets)
    total = len(flat_hashes)
    if total <= _HOST_BLOCK_TOKENS or n_docs <= 1:
        return _minhash_segments_block(flat_hashes, offsets, n_perm)
    offsets = np.asarray(offsets, dtype=np.int64)
    out = np.empty((n_docs, n_perm), dtype=np.uint32)
    d0 = 0
    while d0 < n_docs:
        # widest doc range whose token span fits in a block (>=1 doc)
        d1 = int(
            np.searchsorted(offsets, offsets[d0] + _HOST_BLOCK_TOKENS, "right")
        )
        d1 = max(d1 - 1, d0 + 1)
        end = offsets[d1] if d1 < n_docs else total
        out[d0:d1] = _minhash_segments_block(
            flat_hashes[offsets[d0]:end], offsets[d0:d1] - offsets[d0], n_perm
        )
        d0 = d1
    return out


def _minhash_segments_block(
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


_DEVICE_FNS = {}
_DEVICE_OK: Optional[bool] = None


def _device_available() -> bool:
    global _DEVICE_OK
    if _DEVICE_OK is None:
        import os

        if os.environ.get("COZO_TPU_LSH_DEVICE", "1") == "0":
            _DEVICE_OK = False
        else:
            try:
                from ..utils.jax_setup import ensure_jax_config

                ensure_jax_config()
                import jax  # noqa: F401

                _DEVICE_OK = True
            except Exception:
                _DEVICE_OK = False
    return _DEVICE_OK


def _pow2_bucket(n: int, lo: int = 4096) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _device_segment_min(t_pad: int, d_pad: int, n_perm: int):
    """jit'd [T_pad] hashes + [T_pad] segment ids → [D_pad, n_perm] sigs
    (murmur fmix32 of hash^seed, segment-min; empty segments get the
    dtype max = the empty-doc signature).  Shapes pow2-bucketed to bound
    axon recompiles (repo convention)."""
    key = (t_pad, d_pad, n_perm)
    fn = _DEVICE_FNS.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        seeds = jnp.asarray(perm_seeds(n_perm))

        @jax.jit
        def run(h, seg):
            x = h[:, None] ^ seeds[None, :]
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
            return jax.ops.segment_min(
                x, seg, num_segments=d_pad, indices_are_sorted=True
            )

        fn = run
        _DEVICE_FNS[key] = fn
    return fn


# flip to device only when the mix+min work dwarfs relay/transfer latency
DEVICE_MIN_TOKENS = 16_384


def minhash_segments_device(
    flat_hashes: np.ndarray, offsets: np.ndarray, n_perm: int
) -> np.ndarray:
    """Device variant of `minhash_segments` (bit-identical output,
    asserted in tests/test_fts_lsh.py): the [T, n_perm] mix + per-doc min
    runs as one fused segment_min on the TPU.  This is the bulk-backfill
    compute path (SURVEY §2.8: MinHash-LSH as vectorized hash matmuls)."""
    import jax.numpy as jnp

    n_docs = len(offsets)
    total = len(flat_hashes)
    if n_docs == 0:
        return np.empty((0, n_perm), dtype=np.uint32)
    if total == 0:
        return np.full((n_docs, n_perm), _U32, dtype=np.uint32)
    offsets = np.asarray(offsets, dtype=np.int64)
    seg = np.zeros(total, dtype=np.int32)
    np.add.at(seg, offsets[1:][offsets[1:] < total], 1)
    np.cumsum(seg, out=seg)
    t_pad = _pow2_bucket(total)
    d_pad = _pow2_bucket(n_docs, lo=1024)
    h = np.zeros(t_pad, dtype=np.uint32)
    h[:total] = flat_hashes
    segp = np.full(t_pad, d_pad - 1, dtype=np.int32)
    segp[:total] = seg
    fn = _device_segment_min(t_pad, d_pad, n_perm)
    sigs = np.array(fn(jnp.asarray(h), jnp.asarray(segp)))[:n_docs]
    # padded rows land in segment d_pad-1 with mixed values of hash 0 —
    # recompute that one doc's signature on host if it is real; interior
    # empty docs already read as dtype-max from segment_min's identity
    if n_docs == d_pad:
        s, e = int(offsets[-1]), total
        sigs[-1] = (
            minhash(flat_hashes[s:e], n_perm) if e > s
            else np.full(n_perm, _U32, dtype=np.uint32)
        )
    return sigs.astype(np.uint32)


def minhash_segments_auto(
    flat_hashes: np.ndarray, offsets: np.ndarray, n_perm: int
) -> np.ndarray:
    """Pick device (TPU segment-min) or host (numpy reduceat) by size."""
    if len(flat_hashes) >= DEVICE_MIN_TOKENS and _device_available():
        try:
            return minhash_segments_device(flat_hashes, offsets, n_perm)
        except Exception:  # pragma: no cover — device init/compile issues
            pass
    return minhash_segments(flat_hashes, offsets, n_perm)


class _SigFuture:
    """Async minhash result: `get()` materializes.  Device results stay
    un-fetched until then, so the caller can overlap its host work (KV
    put loops) with TPU compute + relay transfer."""

    def __init__(self, value, n_docs: int, tail_fix=None) -> None:
        self._v = value
        self._n = n_docs
        self._tail_fix = tail_fix  # host-recomputed last-doc signature

    def get(self) -> np.ndarray:
        if not isinstance(self._v, np.ndarray):
            v = np.array(self._v)[: self._n]
            if self._tail_fix is not None:
                v[-1] = self._tail_fix
            self._v = v.astype(np.uint32)
        return self._v


def minhash_segments_dispatch(
    flat_hashes: np.ndarray, offsets: np.ndarray, n_perm: int
) -> _SigFuture:
    """Async variant of `minhash_segments_auto`: returns immediately with
    a future; on the device path the segment-min kernel is dispatched but
    NOT fetched (jax async dispatch), letting backfill pipeline chunk
    K's host writes against chunk K+1's device compute."""
    n_docs = len(offsets)
    total = len(flat_hashes)
    if (
        total < DEVICE_MIN_TOKENS
        or n_docs == 0
        or total == 0
        or not _device_available()
    ):
        return _SigFuture(
            minhash_segments(flat_hashes, offsets, n_perm), n_docs
        )
    try:
        import jax.numpy as jnp

        offsets = np.asarray(offsets, dtype=np.int64)
        seg = np.zeros(total, dtype=np.int32)
        np.add.at(seg, offsets[1:][offsets[1:] < total], 1)
        np.cumsum(seg, out=seg)
        t_pad = _pow2_bucket(total)
        d_pad = _pow2_bucket(n_docs, lo=1024)
        h = np.zeros(t_pad, dtype=np.uint32)
        h[:total] = flat_hashes
        segp = np.full(t_pad, d_pad - 1, dtype=np.int32)
        segp[:total] = seg
        fn = _device_segment_min(t_pad, d_pad, n_perm)
        out = fn(jnp.asarray(h), jnp.asarray(segp))
        tail_fix = None
        if n_docs == d_pad:
            s, e = int(offsets[-1]), total
            tail_fix = (
                minhash(flat_hashes[s:e], n_perm) if e > s
                else np.full(n_perm, _U32, dtype=np.uint32)
            )
        return _SigFuture(out, n_docs, tail_fix)
    except Exception:  # pragma: no cover — device init/compile issues
        return _SigFuture(
            minhash_segments(flat_hashes, offsets, n_perm), n_docs
        )


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
