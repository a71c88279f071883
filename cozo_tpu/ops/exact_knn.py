"""Device-resident chunked k-NN sweep — the TPU-native serving path for
large-batch vector search.

Rationale (measured on TPU v5e, see BENCH_NOTES.md round 2): XLA row
gathers run at ~1.6 GB/s effective, so graph-traversal ANN (the CPU-native
design the reference uses, `runtime/hnsw.rs:869-1012`) is memory-system-
hostile on TPU.  The MXU inverts the trade-off: scoring a whole 1.18M-row
table against a 4–16K query batch is one big matmul chain (~1 TFLOP) that
runs in ~100 ms — *exact* search beats approximate pointer chasing.

Layout: the table lives on device as [n_chunks, CHUNK, d_pad] f32 with a
score bias [n_chunks, CHUNK] (0 alive, -inf dead/padding).  A lax.scan
over chunks computes bf16 MXU scores (f32 accumulation) and per-chunk
`lax.approx_max_k` with aggregate_to_topk=False (raw TPU PartialReduce
bins); ONE exact top_k runs over the concatenated bins, then an exact
f32 re-rank of the over-fetched candidates — all in a single jit call.
Queries cross the relay as unpadded f16 and results come back as one
packed int32 pull (ids + score bits): the axon link's per-transfer cost
(~30ms fixed + ~30MB/s) otherwise dominates at B=4096.

Distance handling reduces every metric to a max-similarity problem:
  L2:     s = 2 q·v - ||v||^2          (d = ||q||^2 - s)
  IP:     s = q·v                      (d = 1 - s)
  Cosine: s = q̂·v̂ (rows pre-normalized; d = 1 - s)
"""

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


MAX_CHUNK = 1 << 17


def _pad_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def _chunking(n: int) -> Tuple[int, int]:
    """(chunk_size, n_chunks): one pow2 chunk for small tables, fixed
    MAX_CHUNK chunks beyond (bounds recompiles to O(1) per growth epoch)."""
    if n <= MAX_CHUNK:
        c = max(_pad_pow2(n), 512)
        return c, 1
    return MAX_CHUNK, (n + MAX_CHUNK - 1) // MAX_CHUNK


_SWEEP_FNS = {}


def _sweep_fn(n_chunks: int, chunk: int, d_pad: int, k: int, rt: float,
              compute_dtype: str, rerank_k: int = 0, metric: str = "IP",
              d_in: int = 0):
    """rerank_k > 0: over-fetch rerank_k candidates in the bf16 scan, then
    re-score them on device in true f32 (HIGHEST precision; L2 uses the
    cancellation-free diff form) and return the exact top-k — all inside
    one jit, so serving is a single relay round-trip."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, k, rt, compute_dtype, rerank_k, metric,
           d_in)
    fn = _SWEEP_FNS.get(key)
    if fn is not None:
        return fn
    cdt = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    kf = max(k, rerank_k)

    @jax.jit
    def run(tbl, bias, qs_in):
        # queries arrive f16 (half the bytes over the ~30-66ms/2MB axon
        # relay link; f16's 11-bit mantissa out-resolves the bf16 scoring
        # lane) and UNPADDED (d_in real dims) unless the caller opted
        # out — widen + zero-pad once on device
        qs = qs_in.astype(jnp.float32)
        if d_in and d_in < d_pad:
            qs = jnp.pad(qs, ((0, 0), (0, d_pad - d_in)))
        B = qs.shape[0]

        # per-chunk approx_max_k with aggregate_to_topk=False: the raw
        # PartialReduce bins come back un-aggregated and ONE exact top_k
        # runs over the concatenated bins at the end.  Measured on v5e at
        # 1.18M x 128 B=4096: the per-chunk exact aggregation pass cost
        # 82ms of a 122ms sweep; deferring it gives 58.6K QPS at
        # recall@10 = 1.0000 (benches/profile_sweep_phases2.py).
        def body(_, xs):
            chunk_v, chunk_b = xs
            s = jax.lax.dot_general(
                qs.astype(cdt),
                chunk_v.astype(cdt),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # TPU f32 matmuls default to bf16-pass precision; the f32
                # path is the "exact" mode so force true f32 MACs
                precision=(
                    jax.lax.Precision.HIGHEST
                    if compute_dtype == "f32"
                    else jax.lax.Precision.DEFAULT
                ),
            ) + chunk_b[None, :]
            if rt >= 1.0:
                nd, ni = jax.lax.top_k(s, kf)
            else:
                nd, ni = jax.lax.approx_max_k(
                    s, kf, recall_target=rt, aggregate_to_topk=False
                )
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, (tbl, bias))
        w = nds.shape[2]  # PartialReduce bin count (>= kf when agg off)
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(B, n_chunks * w)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(B, n_chunks * w)
        if n_chunks * w == kf:
            bs, bi = alld, alli
        else:
            bs, sel = jax.lax.top_k(alld, kf)
            bi = jnp.take_along_axis(alli, sel, axis=1)
        if rerank_k <= 0:
            # pack (ids, score-bits) into ONE int32 array: every device→
            # host pull pays ~30ms fixed relay latency, so one pull, not two
            return jnp.concatenate(
                [bi.astype(jnp.int32),
                 jax.lax.bitcast_convert_type(bs, jnp.int32)], axis=1)
        # exact f32 rescore of the candidate set
        flat = tbl.reshape(-1, d_pad)
        safe = jnp.where(bi >= 0, bi, 0)
        rows = flat[safe]  # [B, kf, d_pad]
        valid = (bi >= 0) & jnp.isfinite(bs)
        if metric == "L2":
            v = rows * 0.5  # storage form is 2v; sweep queries are raw q
            diff = qs[:, None, :] - v
            d_exact = jnp.sum(diff * diff, axis=2)
            s_exact = -d_exact
        else:
            s_exact = jnp.einsum(
                "bkd,bd->bk", rows, qs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        s_exact = jnp.where(valid, s_exact, -jnp.inf)
        ts, ti = jax.lax.top_k(s_exact, k)
        out_i = jnp.take_along_axis(bi, ti, axis=1)
        return jnp.concatenate(
            [out_i.astype(jnp.int32),
             jax.lax.bitcast_convert_type(ts, jnp.int32)], axis=1)

    _SWEEP_FNS[key] = run
    return run


_SWEEP_FNS_I8 = {}


def _sweep_fn_i8(n_chunks: int, chunk: int, d_pad: int, k: int, rt: float,
                 rerank_k: int, metric: str, d_in: int):
    """int8-scored sweep with in-jit exact f32 re-rank — for HBM-resident
    tables (the 1.18M serving shape), one step past the bf16 lane toward
    the matmul floor: int8 MXU MACs run ~2x the bf16 rate, and the score
    slab the bin-select pass reads back is emitted bf16 (half the HBM
    traffic of the f32 slab).  Queries arrive f16, are quantized to int8
    per-query max-abs ON DEVICE (asymmetric ScaNN-style scoring with a
    rank-invariant per-query scale), and the f32 table re-ranks the
    over-fetched candidates exactly — recall at the operating point is
    covered by the rerank, same as the bf16 lane.  SURVEY §7.4."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, k, rt, rerank_k, metric, d_in)
    fn = _SWEEP_FNS_I8.get(key)
    if fn is not None:
        return fn
    kf = max(k, rerank_k)

    @jax.jit
    def run(tbl_i8, scale, bias, tbl, qs_in):
        qs = qs_in.astype(jnp.float32)
        if d_in and d_in < d_pad:
            qs = jnp.pad(qs, ((0, 0), (0, d_pad - d_in)))
        B = qs.shape[0]
        mx = jnp.max(jnp.abs(qs), axis=1)
        q_scale = jnp.where(mx > 0, mx / 127.0, 1.0).astype(jnp.float32)
        q_i8 = jnp.clip(
            jnp.round(qs / q_scale[:, None]), -127, 127
        ).astype(jnp.int8)

        def body(_, xs):
            cv, cs, cb = xs  # [chunk, d_pad] i8, [chunk] f32, [chunk] f32
            s32 = jax.lax.dot_general(
                q_i8, cv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = (
                s32.astype(jnp.float32) * (cs[None, :])
                * q_scale[:, None] + cb[None, :]
            ).astype(jnp.bfloat16)
            nd, ni = jax.lax.approx_max_k(
                s, kf, recall_target=rt,
                aggregate_to_topk=n_chunks > 16,
            )
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, (tbl_i8, scale, bias))
        w = nds.shape[2]
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(B, n_chunks * w)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(B, n_chunks * w)
        if n_chunks * w == kf:
            bs, bi = alld, alli
        else:
            bs, sel = jax.lax.top_k(alld, kf)
            bi = jnp.take_along_axis(alli, sel, axis=1)
        # exact f32 rescore of the candidate set (same tail as _sweep_fn)
        flat = tbl.reshape(-1, d_pad)
        safe = jnp.where(bi >= 0, bi, 0)
        rows = flat[safe]  # [B, kf, d_pad]
        valid = (bi >= 0) & jnp.isfinite(bs.astype(jnp.float32))
        if metric == "L2":
            v = rows * 0.5
            diff = qs[:, None, :] - v
            d_exact = jnp.sum(diff * diff, axis=2)
            s_exact = -d_exact
        else:
            s_exact = jnp.einsum(
                "bkd,bd->bk", rows, qs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        s_exact = jnp.where(valid, s_exact, -jnp.inf)
        ts, ti = jax.lax.top_k(s_exact, k)
        out_i = jnp.take_along_axis(bi, ti, axis=1)
        return jnp.concatenate(
            [out_i.astype(jnp.int32),
             jax.lax.bitcast_convert_type(ts, jnp.int32)], axis=1)

    _SWEEP_FNS_I8[key] = run
    return run


_QUANTIZE_FNS = {}


def _quantize_tbl_fn(n_chunks: int, chunk: int, d_pad: int):
    """Derive the int8 lane (rows + per-row scale) from the resident f32
    table entirely on device — no host round-trip, re-run per version."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad)
    fn = _QUANTIZE_FNS.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(tbl, bias):
        mx = jnp.max(jnp.abs(tbl), axis=2)
        sc = jnp.where(mx > 0, mx / 127.0, 1.0)
        q = jnp.clip(
            jnp.round(tbl / sc[..., None]), -127, 127
        ).astype(jnp.int8)
        return q, jnp.where(
            jnp.isfinite(bias), sc, 0.0
        ).astype(jnp.float32)

    _QUANTIZE_FNS[key] = run
    return run


_UPDATE_FNS = {}


def _update_fn(n_chunks, chunk, d_pad, u_pad):
    """Scatter dirty slots into the resident chunked table."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, u_pad)
    fn = _UPDATE_FNS.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(tbl, bias, cs, rs, new_rows, new_bias):
        tbl = tbl.at[cs, rs].set(new_rows)
        bias = bias.at[cs, rs].set(new_bias)
        return tbl, bias

    _UPDATE_FNS[key] = run
    return run


class SweepTable:
    """Device-resident chunked score table for one index, incrementally
    maintained from the host index's dirty-slot set."""

    def __init__(self) -> None:
        self.version = -1
        self.n_slots = 0
        self.tbl = None
        self.bias = None
        self.chunk = 0
        self.n_chunks = 0
        self.d_pad = 0
        # capacity hint: size chunking for this many rows up-front so a
        # growing bulk build compiles the sweep exactly once
        self.reserve = 0
        # int8 scoring lane (compute_dtype="i8"), derived on device from
        # the f32 table per version
        self.tbl_i8 = None
        self.scale_i8 = None
        self.i8_version = -1
        # fused Pallas lane (compute_dtype="fused"): flat bf16 table +
        # finite-min bias, derived on device per version
        self.tbl_fused = None
        self.bias_fused = None
        self.fused_version = -1

    # -- host-side row prep ---------------------------------------------------

    @staticmethod
    def _prep_rows(index, slots: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (rows [len, d_pad] f32, bias [len] f32) in sweep form."""
        d = index.dim
        d_pad = max(128, int(math.ceil(d / 128) * 128))
        vecs = index.vectors[slots].astype(np.float32)
        alive = index.alive[slots]
        rows = np.zeros((len(slots), d_pad), dtype=np.float32)
        bias = np.where(alive, 0.0, -np.inf).astype(np.float32)
        if index.distance == "L2":
            rows[:, :d] = 2.0 * vecs
            bias = bias - index.norms[slots].astype(np.float32)
        elif index.distance == "IP":
            rows[:, :d] = vecs
        else:  # Cosine
            nrm = np.sqrt(index.norms[slots]).astype(np.float32)
            nrm = np.where(nrm > 0, nrm, 1.0)
            rows[:, :d] = vecs / nrm[:, None]
        bias = np.where(alive, bias, -np.inf)
        return rows, bias

    def refresh(self, index) -> None:
        if self.version == index.version:
            return
        jax, jnp = _jx()
        n = max(index.n, 1, self.reserve)
        chunk, n_chunks = _chunking(n)
        d = index.dim
        d_pad = max(128, int(math.ceil(d / 128) * 128))
        pending = index.sweep_pending
        if (
            self.tbl is not None
            and n_chunks == self.n_chunks
            and chunk == self.chunk
            and d_pad == self.d_pad
            and pending is not None
            and 0 < len(pending) <= max(4096, (chunk * n_chunks) // 16)
        ):
            slots = np.fromiter(sorted(pending), dtype=np.int64)
            u_pad = _pad_pow2(len(slots))
            slots_p = np.full(u_pad, slots[0], dtype=np.int64)
            slots_p[: len(slots)] = slots
            rows, bias = self._prep_rows(index, slots_p)
            cs = (slots_p // chunk).astype(np.int32)
            rs = (slots_p % chunk).astype(np.int32)
            fn = _update_fn(n_chunks, chunk, d_pad, u_pad)
            self.tbl, self.bias = fn(
                self.tbl, self.bias, jnp.asarray(cs), jnp.asarray(rs),
                jnp.asarray(rows), jnp.asarray(bias),
            )
        else:
            total = n_chunks * chunk
            slots = np.arange(total, dtype=np.int64)
            slots_c = np.minimum(slots, index.vectors.shape[0] - 1)
            rows, bias = self._prep_rows(index, slots_c)
            # padding slots (>= index capacity or >= n) are dead
            dead = slots >= index.n
            bias[dead] = -np.inf
            rows[dead] = 0.0
            self.tbl = jnp.asarray(rows.reshape(n_chunks, chunk, d_pad))
            self.bias = jnp.asarray(bias.reshape(n_chunks, chunk))
        self.chunk, self.n_chunks, self.d_pad = chunk, n_chunks, d_pad
        self.version = index.version
        self.n_slots = n
        index.sweep_pending.clear()

    # -- search ---------------------------------------------------------------

    def search(
        self,
        index,
        qs: np.ndarray,
        k: int,
        rt: float = 0.98,
        compute_dtype: str = "bf16",
        exact_rerank: bool = True,
        rerank_k: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        jax, jnp = _jx()
        self.refresh(index)
        d = index.dim
        q = np.asarray(qs, dtype=np.float32)
        B = q.shape[0]
        # f16 query upload by default: halves the dominant per-call cost
        # (the axon relay moves the [B, d_pad] batch at ~30MB/s); f16's
        # 11-bit mantissa perturbs scores ~1e-4 relative — measured recall
        # unchanged at the 0.9999 operating point.  COZO_TPU_Q_F16=0
        # restores exact f32 queries (bind_distance then bit-exact).
        import os as _os

        qdt = (
            np.float16
            if compute_dtype in ("bf16", "i8", "fused")  # f32 stays bit-exact
            and _os.environ.get("COZO_TPU_Q_F16", "1") == "1"
            else np.float32
        )
        if qdt == np.float16 and index.distance != "Cosine":
            # f16 overflows to inf past 65504 and every score in the
            # affected row goes inf/NaN -> the bad-filter returns all -1.
            # Cosine queries are normalized below; L2/IP must check the
            # raw magnitudes and keep f32 for out-of-range batches.
            amax = float(np.max(np.abs(q))) if q.size else 0.0
            if not (amax < 6.0e4):  # also catches nan/inf inputs
                qdt = np.float32
        # unpadded upload: send [B, d], zero-pad to d_pad on device
        qp = np.empty((B, d), dtype=qdt)
        if index.distance == "Cosine":
            nrm = np.linalg.norm(q, axis=1, keepdims=True)
            nrm = np.where(nrm > 0, nrm, 1.0)
            qp[:] = q / nrm
        else:
            qp[:] = q
        # over-fetch + on-device exact f32 re-rank: corrects bf16 rank noise
        # inside the candidate set AND makes bind_distance exact (reference
        # hnsw_knn returns true f32 distances, runtime/hnsw.rs:943-1006),
        # all in one relay round-trip
        # overfetch width: k+16 covers bf16 rank noise at the 0.999
        # operating point; the noisier int8 lane needs more (callers pass
        # rerank_k explicitly — the cost is one slightly wider gather+
        # einsum against a 1.18M-row matmul, i.e. ~free)
        rerank_k = (
            min(max(rerank_k or 0, k + 16), self.n_chunks * self.chunk)
            if exact_rerank
            else 0
        )
        if compute_dtype == "fused":
            # fused Pallas scoring + segment-top2 (ops/pallas_sweep.py):
            # the score slab never touches HBM.  Always exact-reranked.
            from . import pallas_sweep as _ps

            n_total = self.n_chunks * self.chunk
            if not _ps.supported(n_total, self.d_pad, B):
                from ..utils import fallback as _fb

                _fb.record(
                    "sweep.fused",
                    RuntimeError(
                        f"shape unsupported (n={n_total} d_pad={self.d_pad})"
                    ),
                )
                compute_dtype = "bf16"
        if compute_dtype == "fused":
            try:
                if self.fused_version != self.version or self.tbl_fused is None:
                    pfn = _ps._prep_fn(self.n_chunks, self.chunk, self.d_pad)
                    self.tbl_fused, self.bias_fused = pfn(self.tbl, self.bias)
                    self.fused_version = self.version
                B_pad = ((B + _ps.B_TILE - 1) // _ps.B_TILE) * _ps.B_TILE
                fn = _ps._serve_fn(
                    n_total, B_pad, k, max(rerank_k, k + 16), index.distance,
                    d, self.n_chunks, self.chunk, self.d_pad,
                )
                packed = np.asarray(fn(
                    self.tbl_fused, self.bias_fused, self.tbl, jnp.asarray(qp)
                ))
                exact_rerank = True
            except Exception as e:  # compile/launch failure → bf16 lane
                # (the r5 kernel's first real-shape compile OOMed scoped
                # vmem and killed the whole bench; a serving path must
                # degrade, not die)
                from ..utils import fallback as _fb

                _fb.record("sweep.fused", e)
                self.tbl_fused = self.bias_fused = None
                compute_dtype = "bf16"
                fn = _sweep_fn(
                    self.n_chunks, self.chunk, self.d_pad, k, rt,
                    compute_dtype, rerank_k=rerank_k,
                    metric=index.distance, d_in=d,
                )
                packed = np.asarray(fn(self.tbl, self.bias, jnp.asarray(qp)))
        elif compute_dtype == "i8":
            # int8 lane (always exact-reranked): quantize-on-device copy
            if self.i8_version != self.version or self.tbl_i8 is None:
                qfn = _quantize_tbl_fn(self.n_chunks, self.chunk, self.d_pad)
                self.tbl_i8, self.scale_i8 = qfn(self.tbl, self.bias)
                self.i8_version = self.version
            fn = _sweep_fn_i8(
                self.n_chunks, self.chunk, self.d_pad, k, rt,
                rerank_k=max(rerank_k, k + 16), metric=index.distance,
                d_in=d,
            )
            packed = np.asarray(fn(
                self.tbl_i8, self.scale_i8, self.bias, self.tbl,
                jnp.asarray(qp),
            ))
            exact_rerank = True
        else:
            fn = _sweep_fn(
                self.n_chunks, self.chunk, self.d_pad, k, rt, compute_dtype,
                rerank_k=rerank_k, metric=index.distance, d_in=d,
            )
            packed = np.asarray(fn(self.tbl, self.bias, jnp.asarray(qp)))
        kk = packed.shape[1] // 2
        ids = packed[:, :kk].astype(np.int64)
        scores = np.ascontiguousarray(packed[:, kk:]).view(
            np.float32
        ).astype(np.float64)
        bad = ~np.isfinite(scores) | (ids < 0) | (ids >= index.n)
        ids = np.where(bad, -1, ids)
        if exact_rerank:
            # scores are exact f32: L2 returns -||q-v||^2, others similarity
            dists = -scores if index.distance == "L2" else 1.0 - scores
        elif index.distance == "L2":
            qn = np.einsum("bd,bd->b", q.astype(np.float64), q.astype(np.float64))
            dists = np.maximum(qn[:, None] - scores, 0.0)
        else:
            dists = 1.0 - scores
        dists = np.where(bad, np.inf, dists)
        return ids, dists


def sweep_search(index, qs, k, rt: float = 0.98, compute_dtype: str = "bf16",
                 exact_rerank: bool = True, rerank_k: Optional[int] = None):
    """Module-level entry: per-index cached SweepTable."""
    st = getattr(index, "_sweep_table", None)
    if st is None:
        st = SweepTable()
        index._sweep_table = st
    return st.search(
        index, qs, k, rt=rt, compute_dtype=compute_dtype,
        exact_rerank=exact_rerank, rerank_k=rerank_k,
    )
