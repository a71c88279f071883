"""Stage-by-stage profile of the 10M x 768 int8 serving path (the
vector-pivot join collapsed to 318 QPS at 10M vs 5,347 at 1M —
VERDICT r4 weak #1).  Works at the ops layer with no DB: the engine
step adds <0.5s at this row count (measured at 1M), so whatever the
12.9s is, it is in quant_search.

Stages timed separately:
  - quantize+upload (table load; one-time)
  - device scan (search_candidates: int8 matmul + approx_max_k bins +
    final exact top_k + packed pull)
  - host f32 re-rank gather + einsum
plus design variants (rt, aggregate_to_topk, overfetch) to locate the
regression.

Run alone on the host (single core; the 10M GT job must be done).
Usage: python benches/profile_quant_10m.py [n] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
K = 10
CACHE = os.environ.get("COZO_BENCH_DATA_CACHE", "/root/hybrid10m_cache.npy")


def t(label, fn, reps=1):
    out = None
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.3f}s", flush=True)
    return out


def main():
    data = np.load(CACHE, mmap_mode="r")
    qs = np.asarray(data[N : N + B])

    from cozo_tpu.ops.quant_knn import QuantSweepTable, quant_search

    print(f"# n={N} B={B} d={data.shape[1]}", flush=True)
    t0 = time.time()
    vecs = np.asarray(data[:N])  # RAM copy, like the bench's idx.vectors
    print(f"load_ram: {time.time() - t0:.1f}s", flush=True)

    qt = QuantSweepTable()
    t("quantize+upload", lambda: qt.load(vecs, "Cosine"))
    print(f"# chunks={qt.n_chunks} chunk={qt.chunk} d_pad={qt.d_pad}",
          flush=True)

    # what bin width does approx_max_k(aggregate_to_topk=False) emit?
    import jax
    import jax.numpy as jnp

    kf = K * 4
    shp = jax.eval_shape(
        lambda s: jax.lax.approx_max_k(s, kf, recall_target=0.95,
                                       aggregate_to_topk=False),
        jax.ShapeDtypeStruct((B, qt.chunk), jnp.float32),
    )
    w = shp[0].shape[1]
    print(f"# approx_max_k bins w={w} -> final top_k over "
          f"{qt.n_chunks * w} cols", flush=True)

    ids = sc = None

    def scan():
        nonlocal ids, sc
        ids, sc = qt.search_candidates(qs, kf, 0.95)

    t("scan_cold(compile)", scan)
    t("scan_warm", scan, reps=3)

    # host rerank alone (same ids)
    def rerank():
        q = np.asarray(qs, dtype=np.float32)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.where(qn > 0, qn, 1.0)
        safe = np.where(ids >= 0, ids, 0)
        cand = vecs[safe].astype(np.float32)
        cn = np.linalg.norm(cand, axis=2)
        dots = np.einsum("bkd,bd->bk", cand, q)
        d = 1.0 - dots / np.where(cn > 0, cn, 1.0)
        d = np.where(ids >= 0, d, np.inf)
        sel = np.argsort(d, axis=1, kind="stable")[:, :K]
        return np.take_along_axis(ids, sel, axis=1)

    t("host_rerank", rerank, reps=3)

    def full():
        return quant_search(vecs, qt, qs, K)

    out_ids, _ = t("quant_search_total", full, reps=3)

    # recall vs saved exact GT if present
    from benches.gt_host import gt_path

    gp = gt_path(CACHE, N, K, 512)
    if os.path.exists(gp):
        gt = np.load(gp)["ids"]
        ne = min(512, B)
        hits = sum(
            len(set(out_ids[i].tolist()) & set(gt[i].tolist()))
            for i in range(ne)
        )
        print(f"recall@10 vs exact f32 GT: {hits / (ne * K):.4f}",
              flush=True)

    # variants
    for rt in (0.9, 0.8):
        t(f"scan rt={rt}", lambda rt=rt: qt.search_candidates(qs, kf, rt),
          reps=2)
    # per-chunk exact aggregation (r4 measured this SLOWER at 1M; the
    # tradeoff may flip at 77 chunks)
    from cozo_tpu.ops import quant_knn as QK

    @jax.jit
    def agg_run(tbl, scales, bias, qs_i8, q_scale):
        def body(_, xs):
            cv, cs, cb = xs
            s32 = jax.lax.dot_general(
                qs_i8, cv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = (s32.astype(jnp.float32) * cs[None, :] * q_scale[:, None]
                 + cb[None, :])
            nd, ni = jax.lax.approx_max_k(s, kf, recall_target=0.95,
                                          aggregate_to_topk=True)
            return None, (nd, ni)

        _, (nds, nis) = jax.lax.scan(body, None, (tbl, scales, bias))
        nc = tbl.shape[0]
        offs = (jnp.arange(nc, dtype=jnp.int32) * tbl.shape[1])[None, :, None]
        alld = jnp.moveaxis(nds, 0, 1).reshape(qs_i8.shape[0], nc * kf)
        alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(
            qs_i8.shape[0], nc * kf)
        ss, sel = jax.lax.top_k(alld, kf)
        ii = jnp.take_along_axis(alli, sel, axis=1)
        return jnp.concatenate(
            [ii.astype(jnp.int32),
             jax.lax.bitcast_convert_type(ss, jnp.int32)], axis=1)

    qp, qsc = qt.quantize_queries(qs)
    qp_d, qsc_d = jnp.asarray(qp), jnp.asarray(qsc)

    def agg():
        return np.asarray(agg_run(qt.tbl, qt.scales, qt.bias, qp_d, qsc_d))

    t("variant agg_to_topk=True cold", agg)
    t("variant agg_to_topk=True warm", agg, reps=3)


if __name__ == "__main__":
    main()
