"""Device-side bulk HNSW construction.

Replaces the host wave-insert (VERDICT r1 #3: 21s/10K, hours at 1M) with
a build driven by the chunked MXU sweep (`ops/exact_knn.py`):

  per wave of W vectors:
    1. scatter the wave into the device sweep table (capacity reserved
       up-front so the sweep shape compiles once per build);
    2. one sweep pass = exact top-P candidates for all W vectors at once
       (better candidates than the reference's ef_construction beam,
       `runtime/hnsw.rs:470-537` — this is the kNN-graph + RNG-prune
       construction family, the MXU-friendly formulation);
    3. the neighbor-selection heuristic runs as a device kernel batched
       over the wave (pairwise candidate distances come from one MXU
       einsum on the sweep-table rows);
    4. reverse links + overflow shrink are vectorized numpy using link
       distances carried from the sweep (no per-edge Python).

  Upper levels (6%/0.4%/... of nodes at m=16) keep the per-node host
  heuristic — they are too few to matter.
"""

from __future__ import annotations

import math
import os
import sys
import time
from typing import Optional

import numpy as np

from .exact_knn import SweepTable, _pad_pow2


def _jx():
    from ..utils.jax_setup import ensure_jax_config

    ensure_jax_config()
    import jax
    import jax.numpy as jnp

    return jax, jnp


_SELECT_FNS = {}


def _select_fn(n_chunks: int, chunk: int, d_pad: int, P: int, mmax: int,
               metric: str):
    """Batched neighbor-selection heuristic on device.

    Inputs: sweep table (transformed rows + bias), pool_ids [W, P] (-1 =
    invalid, sorted by pool_d ascending), pool_d [W, P].
    Output: sel mask [W, P] — reference semantics: scan candidates in
    distance order; candidate r is dominated if it lies closer to an
    already-selected s than to the query (pair(r, s) < pool_d[r])."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, P, mmax, metric)
    fn = _SELECT_FNS.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(tbl, bias, pool_ids, pool_d):
        W = pool_ids.shape[0]
        flat = tbl.reshape(-1, d_pad)
        bflat = bias.reshape(-1)
        safe = jnp.where(pool_ids >= 0, pool_ids, 0)
        rows = flat[safe]  # [W, P, d_pad]
        b = bflat[safe]  # [W, P]
        dots = jnp.einsum(
            "wpd,wqd->wpq", rows, rows, preferred_element_type=jnp.float32
        )
        if metric == "L2":
            pair = -b[:, :, None] - b[:, None, :] - dots * 0.5
        else:
            pair = 1.0 - dots
        valid = (pool_ids >= 0) & jnp.isfinite(pool_d)

        def body(i, state):
            dominated, count, sel = state
            can = (~dominated[:, i]) & (count < mmax) & valid[:, i]
            sel = sel.at[:, i].set(can)
            count = count + can.astype(jnp.int32)
            dominated = dominated | (can[:, None] & (pair[:, i, :] < pool_d))
            return dominated, count, sel

        dominated = jnp.zeros((W, P), bool)
        count = jnp.zeros((W,), jnp.int32)
        sel = jnp.zeros((W, P), bool)
        _, _, sel = jax.lax.fori_loop(0, P, body, (dominated, count, sel))
        return sel

    _SELECT_FNS[key] = fn = run
    return fn


_STEP_FNS = {}


def _build_step_fn(n_chunks: int, chunk: int, d_pad: int, W: int, P: int,
                   mmax: int, metric: str, rt: float):
    """One fused device call per wave: scatter the wave's rows into the
    resident table (donated buffers — no copy), sweep-search the whole
    table for each wave vector's top-P candidates (self-match masked),
    and run the batched selection heuristic.  One relay round-trip per
    wave instead of three (the axon link has ~0.5s/call fixed cost)."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, W, P, mmax, metric, rt)
    fn = _STEP_FNS.get(key)
    if fn is not None:
        return fn

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(0, 1))
    def run(tbl, bias, new_rows, new_bias, cs, rs, slots):
        tbl = tbl.at[cs, rs].set(new_rows)
        bias = bias.at[cs, rs].set(new_bias)
        # query form from storage form: L2 rows are 2v (q·row = 2 q·v);
        # cosine/IP rows are the (normalized) vectors themselves
        if metric == "L2":
            qs = new_rows * 0.5
        else:
            qs = new_rows

        # per-chunk raw PartialReduce bins + one exact end top_k for few
        # chunks; per-chunk aggregation past _AGG_CHUNKS — at 77 chunks
        # the deferred end-merge runs top_k over n_chunks*bins ~ 150K
        # columns (measured 2x slower + pathological compile;
        # benches/profile_quant_10m.py / ops/quant_knn._AGG_CHUNKS)
        from .quant_knn import _AGG_CHUNKS

        agg = n_chunks > _AGG_CHUNKS

        def body(_, xs):
            chunk_v, chunk_b = xs
            s = jax.lax.dot_general(
                qs.astype(jnp.bfloat16), chunk_v.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + chunk_b[None, :]
            nd, ni = jax.lax.approx_max_k(
                s, P + 1, recall_target=rt, aggregate_to_topk=agg
            )
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, (tbl, bias))
        wbin = nds.shape[2]
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(W, n_chunks * wbin)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(W, n_chunks * wbin)
        if n_chunks * wbin == P + 1:
            scores, ids = alld, alli
        else:
            scores, sel = jax.lax.top_k(alld, P + 1)
            ids = jnp.take_along_axis(alli, sel, axis=1)
        # mask self-matches, keep top P
        scores = jnp.where(ids == slots[:, None], -jnp.inf, scores)
        scores, ti = jax.lax.top_k(scores, P)
        pool_ids = jnp.take_along_axis(ids, ti, axis=1)
        if metric == "L2":
            qn = jnp.sum(qs * qs, axis=1, keepdims=True)
            pool_d = qn - scores
        else:
            pool_d = 1.0 - scores
        pool_d = jnp.where(jnp.isfinite(scores), pool_d, jnp.inf)

        # batched selection heuristic (pairwise dists from table rows)
        flat = tbl.reshape(-1, d_pad)
        bflat = bias.reshape(-1)
        safe = jnp.where(pool_ids >= 0, pool_ids, 0)
        rows = flat[safe]
        b = bflat[safe]
        dots = jnp.einsum(
            "wpd,wqd->wpq", rows, rows, preferred_element_type=jnp.float32
        )
        if metric == "L2":
            pair = -b[:, :, None] - b[:, None, :] - dots * 0.5
        else:
            pair = 1.0 - dots
        valid = (pool_ids >= 0) & jnp.isfinite(pool_d)

        def sel_body(i, state):
            dominated, count, sel = state
            can = (~dominated[:, i]) & (count < mmax) & valid[:, i]
            sel = sel.at[:, i].set(can)
            count = count + can.astype(jnp.int32)
            dominated = dominated | (can[:, None] & (pair[:, i, :] < pool_d))
            return dominated, count, sel

        dominated = jnp.zeros((W, P), bool)
        count = jnp.zeros((W,), jnp.int32)
        sel = jnp.zeros((W, P), bool)
        _, _, sel = jax.lax.fori_loop(0, P, sel_body, (dominated, count, sel))
        # pack (ids, dists-as-bits, sel) into ONE array: each np.asarray
        # of a device output pays the relay's fixed per-pull latency
        # (measured 1-5s), so three pulls per wave dominated build time
        packed = jnp.concatenate(
            [
                pool_ids.astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    pool_d.astype(jnp.float32), jnp.int32
                ),
                sel.astype(jnp.int32),
            ],
            axis=1,
        )
        return tbl, bias, packed

    _STEP_FNS[key] = run
    return run


_STEP_FNS_I8 = {}


def _build_step_fn_i8(n_chunks: int, chunk: int, d_pad: int, W: int, P: int,
                      mmax: int, metric: str, rt: float):
    """int8 variant of `_build_step_fn` for tables past the f32-in-HBM
    budget (10M x 768 = 30 GB f32 vs 7.7 GB int8; COZO_TPU_F32_TABLE_MAX).

    Rows are quantized ON DEVICE per wave (max-abs per-row scale, the
    `ops/quant_knn.py` scheme); queries stay exact — asymmetric scoring:
        score = (q_bf16 . row_i8) * scale_row + bias_row
    The candidate-pool distances and the selection heuristic's pairwise
    distances carry ~0.4% quantization noise, which neighbor selection
    tolerates (serving corrects final ranks by exact re-rank anyway)."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, W, P, mmax, metric, rt)
    fn = _STEP_FNS_I8.get(key)
    if fn is not None:
        return fn

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(tbl_i8, scale, bias, new_rows, new_bias, cs, rs, slots):
        mx = jnp.max(jnp.abs(new_rows), axis=1)
        sc = jnp.where(mx > 0, mx / 127.0, 1.0).astype(jnp.float32)
        q_i8 = jnp.clip(
            jnp.round(new_rows / sc[:, None]), -127, 127
        ).astype(jnp.int8)
        tbl_i8 = tbl_i8.at[cs, rs].set(q_i8)
        scale = scale.at[cs, rs].set(
            jnp.where(jnp.isfinite(new_bias), sc, 0.0)
        )
        bias = bias.at[cs, rs].set(new_bias)
        if metric == "L2":
            qs = (new_rows * 0.5).astype(jnp.bfloat16)
        else:
            qs = new_rows.astype(jnp.bfloat16)

        from .quant_knn import _AGG_CHUNKS

        agg = n_chunks > _AGG_CHUNKS  # see _build_step_fn

        def body(_, xs):
            cv, csc, cb = xs
            s = jax.lax.dot_general(
                qs, cv.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * csc[None, :] + cb[None, :]
            nd, ni = jax.lax.approx_max_k(
                s, P + 1, recall_target=rt, aggregate_to_topk=agg
            )
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, (tbl_i8, scale, bias))
        wbin = nds.shape[2]
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(W, n_chunks * wbin)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(W, n_chunks * wbin)
        if n_chunks * wbin == P + 1:
            scores, ids = alld, alli
        else:
            scores, sel_t = jax.lax.top_k(alld, P + 1)
            ids = jnp.take_along_axis(alli, sel_t, axis=1)
        scores = jnp.where(ids == slots[:, None], -jnp.inf, scores)
        scores, ti = jax.lax.top_k(scores, P)
        pool_ids = jnp.take_along_axis(ids, ti, axis=1)
        if metric == "L2":
            qn = jnp.sum(
                new_rows.astype(jnp.float32) ** 2, axis=1, keepdims=True
            ) * 0.25
            pool_d = qn - scores
        else:
            pool_d = 1.0 - scores
        pool_d = jnp.where(jnp.isfinite(scores), pool_d, jnp.inf)

        # pairwise candidate distances from dequantized rows
        flat = tbl_i8.reshape(-1, d_pad)
        sflat = scale.reshape(-1)
        bflat = bias.reshape(-1)
        safe = jnp.where(pool_ids >= 0, pool_ids, 0)
        rows = flat[safe].astype(jnp.bfloat16) * sflat[safe][
            ..., None
        ].astype(jnp.bfloat16)
        b = bflat[safe]
        dots = jnp.einsum(
            "wpd,wqd->wpq", rows, rows, preferred_element_type=jnp.float32
        )
        if metric == "L2":
            pair = -b[:, :, None] - b[:, None, :] - dots * 0.5
        else:
            pair = 1.0 - dots
        valid = (pool_ids >= 0) & jnp.isfinite(pool_d)

        def sel_body(i, state):
            dominated, count, sel = state
            can = (~dominated[:, i]) & (count < mmax) & valid[:, i]
            sel = sel.at[:, i].set(can)
            count = count + can.astype(jnp.int32)
            dominated = dominated | (can[:, None] & (pair[:, i, :] < pool_d))
            return dominated, count, sel

        dominated = jnp.zeros((W, P), bool)
        count = jnp.zeros((W,), jnp.int32)
        sel = jnp.zeros((W, P), bool)
        _, _, sel = jax.lax.fori_loop(0, P, sel_body, (dominated, count, sel))
        packed = jnp.concatenate(
            [
                pool_ids.astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    pool_d.astype(jnp.float32), jnp.int32
                ),
                sel.astype(jnp.int32),
            ],
            axis=1,
        )
        return tbl_i8, scale, bias, packed

    _STEP_FNS_I8[key] = run
    return run


def bulk_build_device(index, data: np.ndarray, wave: int = 4096,
                      pool_size: Optional[int] = None) -> list:
    """Fresh build of `index` (must be empty) from `data`. Returns slots."""
    assert index.n == 0 and not index._free
    n_new = data.shape[0]
    dt = index.dtype
    data = np.asarray(data, dtype=dt)
    jax, jnp = _jx()

    m0 = index.m_max0
    efc = index.ef_construction
    P = pool_size or min(max(efc, 2 * m0), 96)
    # reserve capacity so the sweep table compiles once for this build;
    # the device table starts as zeros ON DEVICE (dead bias) — vectors
    # cross the host→device link exactly once, wave by wave
    index._grow(n_new)
    from .exact_knn import _chunking

    chunk, n_chunks = _chunking(n_new)
    d_pad = max(128, int(math.ceil(index.dim / 128) * 128))
    # past the f32-in-HBM budget the build runs on an int8 table
    # (quantize-on-device, asymmetric scoring — see _build_step_fn_i8)
    budget = int(os.environ.get("COZO_TPU_F32_TABLE_MAX", 8 << 30))
    use_i8 = n_chunks * chunk * d_pad * 4 > budget
    st = None
    if use_i8:
        tbl_i8 = jnp.zeros((n_chunks, chunk, d_pad), jnp.int8)
        tbl_scale = jnp.zeros((n_chunks, chunk), jnp.float32)
        tbl_bias = jnp.full((n_chunks, chunk), -jnp.inf, jnp.float32)
    else:
        st = SweepTable()
        st.reserve = n_new
        index._sweep_table = st
        st.chunk, st.n_chunks, st.d_pad = chunk, n_chunks, d_pad
        st.tbl = jnp.zeros((n_chunks, chunk, d_pad), jnp.float32)
        st.bias = jnp.full((n_chunks, chunk), -jnp.inf, jnp.float32)

    # level 0 link bookkeeping (vectorized reverse links need distances)
    cap = index.vectors.shape[0]
    nb0_count = np.zeros(cap, dtype=np.int32)
    link_d0 = np.full((cap, m0), np.inf, dtype=np.float32)

    # vectorized level sampling (reference hnsw.rs:46-52 distribution)
    rng = np.random.default_rng(index.rng.randrange(1 << 63))
    u = rng.random(n_new)
    u = np.where(u <= 0.0, 0.5, u)
    levels = (-np.log(u) * index.level_mult).astype(np.int32)

    log = os.environ.get("COZO_TPU_BUILD_LOG") == "1"
    slots_all = np.arange(n_new, dtype=np.int64)
    pos = 0
    tstate = [time.time()]
    pending = None

    def _process_wave(*args):
        _bulk_process_wave(
            index, data, levels, nb0_count, link_d0, P, m0, cap, n_new,
            wave, log, tstate, *args,
        )

    while pos < n_new:
        end = min(pos + wave, n_new)
        W = end - pos
        slots = slots_all[pos:end]
        batch = data[pos:end]

        # -- 1. register the wave in the host index (vectorized)
        index.vectors[pos:end] = batch
        b64 = batch.astype(np.float64)
        index.norms[pos:end] = np.einsum("id,id->i", b64, b64)
        index.levels[pos:end] = levels[pos:end]
        index.alive[pos:end] = True
        index.n = end
        max_l = int(levels[pos:end].max(initial=0))
        index._ensure_level(max_l)
        index.version += 1

        # -- 2+3. ONE fused device call: scatter wave rows into the
        # resident table, sweep-search candidates (self-masked), run the
        # batched selection heuristic
        t_ph = time.time()
        rows_w, bias_w = SweepTable._prep_rows(index, slots)
        w_pad = wave
        if W < w_pad:
            rows_w = np.concatenate(
                [rows_w, np.repeat(rows_w[:1], w_pad - W, axis=0)]
            )
            bias_w = np.concatenate([bias_w, np.repeat(bias_w[:1], w_pad - W)])
        slots_p = np.full(w_pad, slots[0], dtype=np.int64)
        slots_p[:W] = slots
        cs = (slots_p // chunk).astype(np.int32)
        rs = (slots_p % chunk).astype(np.int32)
        # rt=0.9: candidate pools tolerate approximate per-chunk top-k
        # (measured recall parity at 50K: 0.991 vs 0.981 at rt=0.99 —
        # reverse links repair the tail) and approx_max_k at 0.9 costs
        # ~2.4x less than at 0.99 (BENCH_NOTES second pass)
        if use_i8:
            step = _build_step_fn_i8(
                n_chunks, chunk, d_pad, w_pad, P, m0, index.distance, 0.9
            )
            tbl_i8, tbl_scale, tbl_bias, packed_d = step(
                tbl_i8, tbl_scale, tbl_bias,
                jnp.asarray(rows_w), jnp.asarray(bias_w),
                jnp.asarray(cs), jnp.asarray(rs),
                jnp.asarray(slots_p.astype(np.int32)),
            )
        else:
            step = _build_step_fn(
                n_chunks, chunk, d_pad, w_pad, P, m0, index.distance, 0.9
            )
            st.tbl, st.bias, packed_d = step(
                st.tbl, st.bias, jnp.asarray(rows_w), jnp.asarray(bias_w),
                jnp.asarray(cs), jnp.asarray(rs),
                jnp.asarray(slots_p.astype(np.int32)),
            )
            st.version = index.version
            st.n_slots = index.n
        index.sweep_pending.clear()
        ph_dispatch = time.time() - t_ph
        # -- pipeline: process the PREVIOUS wave's results while this
        # wave computes on device (the packed pull pays the relay's
        # 1-5s fixed readback latency; overlapping it with the next
        # wave's sweep removes it from the critical path)
        if pending is not None:
            _process_wave(*pending)
        pending = (slots, pos, end, W, packed_d, ph_dispatch)
        pos = end

    if pending is not None:
        _process_wave(*pending)

    if use_i8:
        # hand the finished int8 table to the serving path: the build's
        # storage form (cosine rows pre-normalized, L2 rows as 2v with
        # bias -||v||^2, max-abs row scales) is exactly
        # `QuantSweepTable.quantize_rows` scoring form, so serving starts
        # without re-quantizing 10M rows through the host
        from .quant_knn import QuantSweepTable

        qt = QuantSweepTable()
        qt.tbl, qt.scales, qt.bias = tbl_i8, tbl_scale, tbl_bias
        qt.chunk, qt.n_chunks, qt.d_pad = chunk, n_chunks, d_pad
        qt.n = n_new
        qt.distance = index.distance
        qt.version = index.version
        index._quant_sweep = qt
        index._quant_sweep_version = index.version

    return slots_all.tolist()


def _bulk_process_wave(index, data, levels, nb0_count, link_d0, P, m0,
                       cap, n_new, wave, log, tstate,
                       slots, pos, end, W, packed_d, ph_dispatch):
    """Host half of one build wave: pull the packed device results and
    apply out-links, vectorized reverse links, overflow shrink, and the
    upper-level heuristic.  Runs while the NEXT wave's device step is in
    flight (see the pipeline note in `bulk_build_device`)."""
    t_ph = time.time()
    batch = data[pos:end]
    packed = np.asarray(packed_d)[:W]  # single device pull per wave
    pool_ids = packed[:, :P].astype(np.int64)
    pool_d = np.ascontiguousarray(packed[:, P : 2 * P]).view(np.float32)
    sel = packed[:, 2 * P :] != 0
    ph_pull = time.time() - t_ph
    t_ph = time.time()

    # -- 4. out-links + vectorized reverse links at level 0
    nb0 = index.neighbors[0]
    w_idx, p_idx = np.nonzero(sel)
    sel_frm = pool_ids[w_idx, p_idx].astype(np.int64)  # link target
    sel_d = pool_d[w_idx, p_idx]
    sel_to = slots[w_idx]

    # out-links: group by wave row (w_idx is sorted; positions within
    # each row are in distance order already)
    row_start = np.searchsorted(w_idx, np.arange(W))
    row_end = np.searchsorted(w_idx, np.arange(W) + 1)
    counts_out = (row_end - row_start).astype(np.int32)
    col = np.arange(len(w_idx)) - row_start[w_idx]
    keep = col < m0
    nb0[slots[w_idx[keep]], col[keep]] = sel_frm[keep]
    link_d0[slots[w_idx[keep]], col[keep]] = sel_d[keep]
    nb0_count[slots] = np.minimum(counts_out, m0)

    # reverse links: for each selected neighbor frm, append `to`.
    # Drop duplicate edges first (frm may be a wave peer whose
    # out-links already include `to`) so in-group positions are dense.
    in_wave = sel_frm >= pos
    dup = np.zeros(len(sel_frm), bool)
    if in_wave.any():
        iw = np.nonzero(in_wave)[0]
        dup[iw] = (nb0[sel_frm[iw]] == sel_to[iw, None]).any(axis=1)
    keep_rl = ~dup
    frm_order = np.argsort(sel_frm[keep_rl], kind="stable")
    r_frm = sel_frm[keep_rl][frm_order]
    r_to = sel_to[keep_rl][frm_order]
    r_d = sel_d[keep_rl][frm_order]
    uniq, grp_start, grp_counts = np.unique(
        r_frm, return_index=True, return_counts=True
    )
    cum = np.arange(len(r_frm)) - grp_start[
        np.searchsorted(uniq, r_frm)
    ]  # position within group
    base = nb0_count[r_frm]
    tgt = base + cum
    fits = tgt < m0
    overflow_mask = tgt >= m0
    nb0[r_frm[fits], tgt[fits]] = r_to[fits]
    link_d0[r_frm[fits], tgt[fits]] = r_d[fits]
    # counts reflect only appended-in-place entries:
    filled = np.zeros(cap, dtype=np.int32)
    np.add.at(filled, r_frm[fits], 1)
    nb0_count[uniq] = nb0_count[uniq] + filled[uniq]

    # overflow rows: shrink to the m0 closest using stored distances
    over = np.unique(r_frm[overflow_mask])
    if len(over) > 0:
        max_add = int(grp_counts.max())
        K = m0 + max_add
        cand_ids = np.full((len(over), K), -1, dtype=np.int64)
        cand_d = np.full((len(over), K), np.inf, dtype=np.float32)
        cand_ids[:, :m0] = nb0[over]
        cand_d[:, :m0] = link_d0[over]
        # gather this wave's additions per overflow row
        pos_of = {f: i for i, f in enumerate(over)}
        fill = np.zeros(len(over), dtype=np.int32)
        om = overflow_mask
        for f, t, dd in zip(r_frm[om], r_to[om], r_d[om]):
            i = pos_of[f]
            j = m0 + fill[i]
            if j < K:
                cand_ids[i, j] = t
                cand_d[i, j] = dd
                fill[i] += 1
        part = np.argpartition(cand_d, m0 - 1, axis=1)[:, :m0]
        sort_in = np.take_along_axis(cand_d, part, axis=1)
        srt = np.argsort(sort_in, axis=1, kind="stable")
        part = np.take_along_axis(part, srt, axis=1)
        nb0[over] = np.take_along_axis(cand_ids, part, axis=1)
        link_d0[over] = np.take_along_axis(cand_d, part, axis=1)
        nb0_count[over] = (nb0[over] >= 0).sum(axis=1).astype(np.int32)

    index.dirty.update(slots.tolist())
    index.dirty.update(np.unique(sel_frm).tolist())
    index.dev_pending.update(slots.tolist())
    index.dev_pending.update(np.unique(sel_frm).tolist())

    ph_links = time.time() - t_ph
    t_ph = time.time()

    # -- 5. upper levels: per-node host heuristic (few nodes)
    hi = np.nonzero(levels[pos:end] >= 1)[0]
    for j in hi.tolist():
        slot = int(slots[j])
        lvl = int(levels[pos + j])
        pool_l = [
            (float(d), int(c))
            for d, c in zip(pool_d[j], pool_ids[j])
            if c >= 0 and np.isfinite(d) and index.levels[c] >= 1
        ]
        for l in range(1, lvl + 1):
            cands_l = [(d, c) for d, c in pool_l if index.levels[c] >= l]
            if not cands_l:
                continue
            selected = index._select_neighbors(batch[j], cands_l, l)
            index._set_neighbors(l, slot, selected[: index.m_max])
            for nb_ in selected[: index.m_max]:
                index._add_link(l, nb_, slot)

    # entry point: highest level so far
    if index.entry < 0 or levels[pos:end].max(initial=-1) > int(
        index.levels[index.entry]
    ):
        index.entry = pos + int(np.argmax(levels[pos:end]))

    if log and (end // wave) % 16 == 0:
        el = time.time() - tstate[0]
        tstate[0] = time.time()
        ph_upper = time.time() - t_ph
        print(
            f"# bulk_build: {end}/{n_new} ({el/16:.2f}s/wave; last: "
            f"dispatch {ph_dispatch:.2f} pull {ph_pull:.2f} "
            f"links {ph_links:.2f} upper {ph_upper:.2f})",
            file=sys.stderr,
            flush=True,
        )
