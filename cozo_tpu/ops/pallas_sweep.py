"""Fused Pallas scoring + segment-top-2 kernel for the serving sweep.

Why this exists (measured on TPU v5e, BENCH_NOTES round 4/5): the XLA
sweep (`ops/exact_knn._sweep_fn`) materializes the [B, chunk] score slab
to HBM between the matmul and `approx_max_k` — at 1.18M x 128, B=4096
that is ~20 GB of HBM round-trip ≈ 24 ms of the 33.6 ms "matmul-only
floor", while the true MXU cost is ~6 ms.  This kernel keeps each score
tile in VMEM and reduces it to top-2-per-256-column-segment before
anything touches HBM, so the slab never exists.

Output encoding: ONE f32 array [B, 2 * N / SEG].  Each segment of SEG
consecutive table columns contributes its two best scores, with the
column-within-segment id packed into the low 8 mantissa bits
(`bits & ~0xFF | col`).  Packing perturbs the score by < 2^-15 relative
— far below the bf16 scoring noise — and float ordering is unaffected
for gaps larger than that, so a plain `lax.top_k` over the packed array
selects candidates AND carries their ids; the exact f32 re-rank
(`exact_knn` tail) restores true scores/order.  Dead slots use a finite
-3e38 bias (a -inf bias would turn into a NaN when the id bits are OR'd
into its mantissa).

Recall: the segment reduce is exhaustive (not sampled), so the only
candidate-selection loss is a true neighbor shadowed by >= 2 better rows
in its own 256-column segment — at k=10 over 1M+ random-order rows this
is < 1e-4, measured recall@10 = 1.0 at the serving operating point.

Reference parity anchor: this replaces the CPU-side greedy graph search
of `/root/reference/cozo-core/src/runtime/hnsw.rs:869-1012` as the
batched serving path (SURVEY §7.4).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _jx():
    from ..utils.jax_setup import ensure_jax_config

    ensure_jax_config()
    import jax
    import jax.numpy as jnp

    return jax, jnp


SEG = 256          # table columns per segment (top-2 kept per segment)
B_TILE = 512       # query rows per grid step
N_TILE = 16384     # table rows per grid step -> 16384/256*2 = 128 output lanes
_SUB = 1024        # in-kernel sub-tile (MXU matmul width)
NEG_FILL = -3.0e38  # finite "minus infinity" (see module docstring)

_FUSED_FNS = {}


def supported(n_total: int, d_pad: int, B: int) -> bool:
    """Shapes the fused kernel handles (everything else stays on the XLA
    sweep): d fits one MXU contraction, table a multiple of the N tile."""
    return d_pad == 128 and n_total % N_TILE == 0 and n_total >= N_TILE \
        and B >= 1


def _kernel(q_ref, v_ref, b_ref, out_ref, scr):
    """One (B_TILE, N_TILE) grid step.

    q_ref   [B_TILE, 128]  bf16 queries
    v_ref   [N_TILE, 128]  bf16 table rows
    b_ref   [1, N_TILE]    f32 additive bias (0 alive / NEG_FILL dead)
    out_ref [B_TILE, 2*N_TILE/SEG] f32 packed (score | col-in-segment)
    scr     [2*N_TILE/SEG, B_TILE] f32 scratch (row-major writes, one
            transpose at the end instead of 128 single-lane column writes)
    """
    import jax
    import jax.numpy as jnp

    q = q_ref[:]
    segs_per_sub = _SUB // SEG
    for s in range(N_TILE // _SUB):
        v = v_ref[s * _SUB:(s + 1) * _SUB, :]
        scores = jax.lax.dot_general(
            q, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores + b_ref[0, s * _SUB:(s + 1) * _SUB][None, :]
        # pack col-in-segment into the low 8 mantissa bits
        bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
        col8 = jax.lax.broadcasted_iota(
            jnp.int32, (B_TILE, _SUB), dimension=1
        ) & (SEG - 1)
        packed = jax.lax.bitcast_convert_type(
            (bits & ~(SEG - 1)) | col8, jnp.float32
        )
        for g in range(segs_per_sub):
            seg = packed[:, g * SEG:(g + 1) * SEG]
            m1 = jnp.max(seg, axis=1)
            # packed values are unique within a segment (id bits differ),
            # so the mask removes exactly the argmax
            seg2 = jnp.where(seg == m1[:, None], NEG_FILL, seg)
            m2 = jnp.max(seg2, axis=1)
            r = (s * segs_per_sub + g) * 2
            scr[r, :] = m1
            scr[r + 1, :] = m2
    out_ref[:] = scr[:].T


def _fused_fn(n_total: int, B_pad: int):
    """jitted (tbl_flat_bf16, bias_flat, qs_bf16 [B_pad,128]) ->
    packed [B_pad, 2*n_total/SEG] f32."""
    jax, jnp = _jx()
    key = (n_total, B_pad)
    fn = _FUSED_FNS.get(key)
    if fn is not None:
        return fn
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_j = n_total // N_TILE
    n_i = B_pad // B_TILE
    out_w = 2 * (n_total // SEG)
    lanes = 2 * (N_TILE // SEG)  # 128

    @jax.jit
    def run(tbl_flat, bias_flat, qs):
        return pl.pallas_call(
            _kernel,
            grid=(n_i, n_j),
            # the unrolled 16-subtile inner loop keeps several [B_TILE,
            # _SUB] f32 temporaries live at once — the default 16M scoped
            # vmem budget rejects the kernel at B_pad=4096 (measured:
            # 40.7M requested).  v5e has 128M VMEM; grant what it needs.
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec((B_TILE, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_TILE, 128), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_TILE), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B_TILE, lanes), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B_pad, out_w), jnp.float32),
            scratch_shapes=[pltpu.VMEM((lanes, B_TILE), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * B_pad * n_total * 128,
                bytes_accessed=(
                    n_j * B_pad * 128 * 2  # q re-reads
                    + n_i * n_total * 128 * 2  # table re-reads
                    + B_pad * out_w * 4
                ),
                transcendentals=0,
            ),
        )(qs, tbl_flat, bias_flat)

    _FUSED_FNS[key] = run
    return run


_SERVE_FNS = {}


def _serve_fn(n_total: int, B_pad: int, k: int, kf: int, metric: str,
              d_in: int, n_chunks: int, chunk: int, d_pad: int):
    """End-to-end fused serving: pallas segment-top2 -> top_k over packed
    -> exact f32 re-rank — one jit, one relay round-trip, same packed
    int32 (ids | score bits) wire format as `exact_knn._sweep_fn`."""
    import os as _os

    jax, jnp = _jx()
    # selection over the [B, 2*segs] packed array: exact top_k for narrow
    # packed widths, approx_max_k (PartialReduce) once it is wide — the
    # XLA exact-sort lowering goes compile-pathological on wide arrays
    # (measured: 939s at 78,848 cols in the int8 sweep, and the fused
    # lane's first bench compile at 10,240 cols blew the 10-min budget),
    # while the exact f32 re-rank downstream absorbs the selection slack.
    # COZO_TPU_FUSED_TOPK=exact|approx overrides.
    out_w = 2 * (n_total // SEG)
    default = "approx" if out_w > 4096 else "exact"
    approx_sel = _os.environ.get("COZO_TPU_FUSED_TOPK", default) == "approx"
    key = (n_total, B_pad, k, kf, metric, d_in, approx_sel)
    fn = _SERVE_FNS.get(key)
    if fn is not None:
        return fn
    fused = _fused_fn(n_total, B_pad)

    @jax.jit
    def run(tbl_flat, bias_flat, tbl_f32, qs_in):
        B = qs_in.shape[0]
        qs = qs_in.astype(jnp.float32)
        if d_in and d_in < d_pad:
            qs = jnp.pad(qs, ((0, 0), (0, d_pad - d_in)))
        if B < B_pad:
            qs = jnp.pad(qs, ((0, B_pad - B), (0, 0)))
        packed = fused(tbl_flat, bias_flat, qs.astype(jnp.bfloat16))
        if approx_sel:
            vals, pos = jax.lax.approx_max_k(packed, kf, recall_target=0.99)
        else:
            vals, pos = jax.lax.top_k(packed, kf)
        col = jax.lax.bitcast_convert_type(vals, jnp.int32) & (SEG - 1)
        rows_id = (pos >> 1) * SEG + col
        valid = vals > (NEG_FILL * 0.5)
        # exact f32 rescore (same tail as exact_knn._sweep_fn)
        flat = tbl_f32.reshape(-1, d_pad)
        safe = jnp.where(valid, rows_id, 0)
        rows = flat[safe]  # [B_pad, kf, d_pad]
        if metric == "L2":
            v = rows * 0.5  # storage form is 2v
            diff = qs[:, None, :] - v
            s_exact = -jnp.sum(diff * diff, axis=2)
        else:
            s_exact = jnp.einsum(
                "bkd,bd->bk", rows, qs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        s_exact = jnp.where(valid, s_exact, -jnp.inf)
        ts, ti = jax.lax.top_k(s_exact, k)
        out_i = jnp.take_along_axis(rows_id, ti, axis=1)
        out_i = jnp.where(jnp.isfinite(ts), out_i, -1)
        res = jnp.concatenate(
            [out_i.astype(jnp.int32),
             jax.lax.bitcast_convert_type(ts, jnp.int32)], axis=1)
        return res[:B] if B < B_pad else res

    _SERVE_FNS[key] = run
    return run


_PREP_FNS = {}


def _prep_fn(n_chunks: int, chunk: int, d_pad: int):
    """Derive the kernel's flat bf16 table + finite-min bias from the
    resident chunked f32 table, on device (re-run per index version)."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad)
    fn = _PREP_FNS.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(tbl, bias):
        flat = tbl.reshape(-1, d_pad).astype(jnp.bfloat16)
        b = jnp.where(jnp.isfinite(bias), bias, NEG_FILL)
        return flat, b.reshape(1, -1)

    _PREP_FNS[key] = run
    return run


def fused_ref_numpy(tbl: np.ndarray, bias: np.ndarray, qs: np.ndarray):
    """Pure-numpy reference of the packed segment-top2 (tests)."""
    scores = (
        qs.astype(np.float32) @ tbl.astype(np.float32).T
        + bias.reshape(1, -1)
    )
    bits = scores.view(np.int32) if scores.flags.c_contiguous else \
        np.ascontiguousarray(scores).view(np.int32)
    col8 = (np.arange(scores.shape[1], dtype=np.int32) % SEG)[None, :]
    packed = ((bits & ~(SEG - 1)) | col8).view(np.float32)
    B, N = packed.shape
    segs = N // SEG
    p3 = packed.reshape(B, segs, SEG)
    order = np.argsort(-p3, axis=2)[:, :, :2]
    top2 = np.take_along_axis(p3, order, axis=2)
    return top2.reshape(B, segs * 2)
