"""int8-quantized chunked MXU sweep — vector serving beyond f32-in-HBM
scale (SURVEY §5.7: BASELINE config #5 is 10M x 768-d; the f32 table is
30GB against 16GB HBM, the int8 table is 7.4GB).

Design (ScaNN-family asymmetric scoring, TPU-first):
  - storage: per-row max-abs scale s_r = max|v_i|/127, rows quantized to
    int8; scales stay f32.  Cosine rows are L2-normalized first.
  - scan: int8 x int8 MXU matmul (int32 accumulate) per chunk, rescaled
    by s_r (the per-query scale is rank-invariant), `approx_max_k`
    over-fetch, one exact end merge.
  - re-rank: the over-fetched candidate ids are re-scored on the host
    against the f32 vectors (which stay in host RAM — they never fit on
    device at this scale), restoring exact top-k order.

Reference anchor: runtime/hnsw.rs:869-1012 serves any-scale tables by
streaming from the KV store; this is the TPU equivalent where HBM, not
the algorithm, is the binding constraint.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def _jx():
    from ..utils.jax_setup import ensure_jax_config

    ensure_jax_config()
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _chunking(n: int) -> Tuple[int, int]:
    from .exact_knn import _chunking as c

    return c(n)


_QSWEEP_FNS = {}


# past this chunk count the per-chunk aggregation pass beats the
# deferred end-merge: at 77 chunks (10M rows) the deferred design's one
# exact top_k runs over n_chunks*1024 = 78,848 columns — measured 0.65s
# warm and a pathological 939s XLA compile, vs 0.31s warm / 2.7s compile
# with aggregate_to_topk=True (benches/profile_quant_10m.py).  At <=9
# chunks (the 1.18M serving shape) the r4 measurement still holds the
# other way (deferred wins, exact_knn._sweep_fn).
_AGG_CHUNKS = 16


def _qsweep_fn(n_chunks: int, chunk: int, d_pad: int, kf: int, rt: float):
    """score = (q_i8 . row_i8) * scale_row * scale_q + bias_row.

    The per-query scale and the additive per-row bias make L2 servable
    (VERDICT r3 weak #8): with rows stored as v (scales doubled at load)
    and bias = -||v||^2, score = 2 q.v - ||v||^2 which ranks -||q-v||^2
    per query.  IP/Cosine use bias 0 (dead rows -inf); multiplying by the
    positive per-query scale is rank-invariant there, so one kernel form
    serves every metric."""
    jax, jnp = _jx()
    key = (n_chunks, chunk, d_pad, kf, rt)
    fn = _QSWEEP_FNS.get(key)
    if fn is not None:
        return fn
    aggregate = n_chunks > _AGG_CHUNKS

    @jax.jit
    def run(tbl_i8, scales, bias, qs_i8, q_scale):
        B = qs_i8.shape[0]

        def body(_, xs):
            cv, cs, cb = xs  # [chunk, d_pad] i8, [chunk] f32, [chunk] f32
            s32 = jax.lax.dot_general(
                qs_i8, cv,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = (
                s32.astype(jnp.float32) * cs[None, :] * q_scale[:, None]
                + cb[None, :]
            )
            nd, ni = jax.lax.approx_max_k(
                s, kf, recall_target=rt, aggregate_to_topk=aggregate
            )
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, (tbl_i8, scales, bias))
        w = nds.shape[2]
        offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(B, n_chunks * w)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(B, n_chunks * w)
        if n_chunks * w == kf:
            ii, ss = alli, alld
        else:
            ss, sel = jax.lax.top_k(alld, kf)
            ii = jnp.take_along_axis(alli, sel, axis=1)
        # one packed pull (ids, score-bits): each device→host pull pays
        # ~30ms fixed relay latency
        return jnp.concatenate(
            [ii.astype(jnp.int32),
             jax.lax.bitcast_convert_type(ss, jnp.int32)], axis=1)

    _QSWEEP_FNS[key] = run
    return run


class QuantSweepTable:
    """Device-resident int8 table + scales for one index/matrix."""

    def __init__(self) -> None:
        self.tbl = None  # [n_chunks, chunk, d_pad] int8 on device
        self.scales = None  # [n_chunks, chunk] f32 (0 = dead row)
        self.bias = None  # [n_chunks, chunk] f32 (-inf = dead; L2: -||v||^2)
        self.chunk = self.n_chunks = self.d_pad = 0
        self.n = 0
        self.distance = "Cosine"
        self.version = -1

    @staticmethod
    def quantize_rows(vecs: np.ndarray, distance: str,
                      alive: Optional[np.ndarray] = None,
                      out_q: Optional[np.ndarray] = None,
                      out_s: Optional[np.ndarray] = None,
                      out_b: Optional[np.ndarray] = None):
        """Returns (q_rows int8 [n, d], scales f32 [n], bias f32 [n]) in
        scoring form: score(q, r) = (q_i8 . r_i8) * scales[r] * scale_q
        + bias[r] monotonically ranks the true metric for a fixed query
        (cosine/IP: descending dot, bias 0; L2: scales doubled, bias
        -||v||^2 so score = 2 q.v - ||v||^2 = ||q||^2 - ||q - v||^2).

        Processes in row blocks: at 10M x 768 the table is 30 GiB and a
        whole-array normalize/rint chain allocates 3-4 full f32 temps —
        enough to OOM a 128 GiB host.  ``out_q``/``out_s``/``out_b`` let
        callers pass preallocated (possibly padded) destinations."""
        n, d = vecs.shape
        q = out_q if out_q is not None else np.empty((n, d), dtype=np.int8)
        scale = out_s if out_s is not None else np.empty(n, dtype=np.float32)
        bias = out_b if out_b is not None else np.zeros(n, dtype=np.float32)
        BLK = 262_144
        for s0 in range(0, n, BLK):
            v = np.asarray(vecs[s0 : s0 + BLK], dtype=np.float32)
            if distance == "Cosine":
                nrm = np.linalg.norm(v, axis=1, keepdims=True)
                v = v / np.where(nrm > 0, nrm, 1.0)
            mx = np.abs(v).max(axis=1)
            sc = np.where(mx > 0, mx / 127.0, 1.0).astype(np.float32)
            q[s0 : s0 + len(v), :d] = np.clip(
                np.rint(v / sc[:, None]), -127, 127
            )
            if distance == "L2":
                sc = sc * 2.0
                bias[s0 : s0 + len(v)] = -np.einsum(
                    "bd,bd->b", v, v, dtype=np.float64
                )
            else:
                bias[s0 : s0 + len(v)] = 0.0
            scale[s0 : s0 + len(v)] = sc
        if alive is not None:
            scale[:n] = np.where(alive[:n], scale[:n], 0.0)
            bias[:n] = np.where(alive[:n], bias[:n], -np.inf)
        return q, scale, bias

    def load(self, vecs: np.ndarray, distance: str,
             alive: Optional[np.ndarray] = None, chunk: Optional[int] = None,
             keep_host: bool = False):
        jax, jnp = _jx()
        n, d = vecs.shape
        self.n, self.distance = n, distance
        self.d_pad = max(128, int(math.ceil(d / 128) * 128))
        if chunk is None:
            chunk, n_chunks = _chunking(n)
        else:
            n_chunks = -(-n // chunk)
        self.chunk, self.n_chunks = chunk, n_chunks
        total = chunk * n_chunks
        # quantize straight into the padded staging arrays (no [n, d]
        # intermediate copy; see quantize_rows block processing)
        qp = np.zeros((total, self.d_pad), dtype=np.int8)
        sp = np.zeros(total, dtype=np.float32)
        bp = np.full(total, -np.inf, dtype=np.float32)  # padding rows dead
        self.quantize_rows(
            vecs, distance, alive,
            out_q=qp[:n, :d], out_s=sp[:n], out_b=bp[:n],
        )
        self.tbl = jax.device_put(
            jnp.asarray(qp.reshape(n_chunks, chunk, self.d_pad)))
        self.scales = jax.device_put(
            jnp.asarray(sp.reshape(n_chunks, chunk)))
        self.bias = jax.device_put(
            jnp.asarray(bp.reshape(n_chunks, chunk)))
        if keep_host:
            # callers that disk-cache the staging (bench reruns) keep the
            # host copies; pulling 7+ GiB back through the relay is ~100s
            self.host_qp, self.host_sp, self.host_bp = qp, sp, bp
        return self

    def quantize_queries(self, qs: np.ndarray):
        """(q_i8 padded, per-query scale f32 [B])."""
        q = np.asarray(qs, dtype=np.float32)
        if self.distance == "Cosine":
            nrm = np.linalg.norm(q, axis=1, keepdims=True)
            q = q / np.where(nrm > 0, nrm, 1.0)
        mx = np.abs(q).max(axis=1)
        scale = np.where(mx > 0, mx / 127.0, 1.0).astype(np.float32)
        qi = np.clip(np.rint(q / scale[:, None]), -127, 127).astype(np.int8)
        qp = np.zeros((q.shape[0], self.d_pad), dtype=np.int8)
        qp[:, : q.shape[1]] = qi
        return qp, scale

    def search_candidates(self, qs: np.ndarray, kf: int, rt: float = 0.95):
        """(ids [B, kf], approx scores) from the quantized scan."""
        jax, jnp = _jx()
        fn = _qsweep_fn(self.n_chunks, self.chunk, self.d_pad, kf, rt)
        qp, qsc = self.quantize_queries(qs)
        if self.bias is None:  # tables loaded before the bias lane existed
            self.bias = jnp.where(
                self.scales > 0, 0.0, -jnp.inf
            ).astype(jnp.float32)
        packed = np.asarray(fn(self.tbl, self.scales, self.bias,
                               jnp.asarray(qp), jnp.asarray(qsc)))
        kk = packed.shape[1] // 2
        ids = packed[:, :kk].astype(np.int64)
        sc = np.ascontiguousarray(packed[:, kk:]).view(np.float32)
        bad = (ids < 0) | (ids >= self.n) | ~np.isfinite(sc)
        return np.where(bad, -1, ids), sc


def quant_search(vectors: np.ndarray, table: QuantSweepTable, qs: np.ndarray,
                 k: int, overfetch: Optional[int] = None, rt: float = 0.95,
                 sq_norms: Optional[np.ndarray] = None):
    """End-to-end: int8 device scan over-fetching overfetch*k candidates,
    exact f32 re-rank on the host against `vectors` (the full-precision
    rows, host-resident).  Returns (ids [B, k], dists [B, k]) with the
    index's distance semantics (cosine/L2 distance / negative IP).

    overfetch default 4 (env COZO_TPU_QUANT_OVERFETCH): measured
    recall@10 is flat from overfetch 2-8 (0.9814 at 10M x 768 — the int8
    rank order is already near-exact and the residual gap is row
    quantization, which no overfetch recovers), while the HOST side of
    the rerank (a [B, kf, d] gather + einsum on a single core) scales
    linearly with kf.

    `sq_norms`: precomputed squared row norms (HnswIndex.norms) — saves
    a full [B, kf, d] pass recomputing candidate norms for Cosine."""
    import os as _os
    import time as _time

    timing = _os.environ.get("COZO_TPU_SEARCH_TIMING") == "1"
    if overfetch is None:
        overfetch = int(_os.environ.get("COZO_TPU_QUANT_OVERFETCH", 4))
    kf = min(max(k * overfetch, k), table.chunk)
    t0 = _time.time()
    ids, _ = table.search_candidates(qs, kf, rt)
    t_scan = _time.time()
    B = qs.shape[0]
    q = np.asarray(qs, dtype=np.float32)
    if table.distance == "Cosine":
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.where(qn > 0, qn, 1.0)
    safe = np.where(ids >= 0, ids, 0)
    # [B, kf, d] gather — the rerank's hot cost.  Past ~4M rows the
    # table is tens of GB and a random-order gather pays a TLB/page
    # miss per row; fetching in ascending row order then unpermuting
    # is ~4x faster at 10M x 768 under full-RAM pressure (r5 measured)
    if vectors.shape[0] >= int(
        _os.environ.get("COZO_TPU_SORTED_GATHER_MIN", 4_000_000)
    ):
        flat = safe.ravel()
        order = np.argsort(flat, kind="stable")
        g = vectors[flat[order]]
        out = np.empty_like(g)
        out[order] = g
        cand = out.reshape(safe.shape[0], safe.shape[1], vectors.shape[1])
    else:
        cand = vectors[safe]
    if table.distance == "Cosine":
        dots = np.einsum("bkd,bd->bk", cand, q, dtype=np.float32)
        if sq_norms is not None:
            cn = np.sqrt(sq_norms[safe]).astype(np.float32)
        else:
            cn = np.sqrt(
                np.einsum("bkd,bkd->bk", cand, cand, dtype=np.float32)
            )
        sims = dots / np.where(cn > 0, cn, 1.0)
        d = 1.0 - sims
    elif table.distance == "L2":
        diff = cand - q[:, None, :]  # promotes to f32 (q is f32)
        d = np.einsum("bkd,bkd->bk", diff, diff, dtype=np.float32)
    else:  # IP
        d = -np.einsum("bkd,bd->bk", cand, q, dtype=np.float32)
    d = np.where(ids >= 0, d, np.inf)
    sel = np.argsort(d, axis=1, kind="stable")[:, :k]
    out_ids = np.take_along_axis(ids, sel, axis=1)
    out_d = np.take_along_axis(d, sel, axis=1)
    if timing:
        print(
            f"# quant_search B={B} kf={kf}: scan+pull "
            f"{t_scan - t0:.3f}s rerank {_time.time() - t_scan:.3f}s",
            flush=True,
        )
    return out_ids, out_d
