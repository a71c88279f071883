"""Serving-sweep design variants at the judged 1.18M x 100 shape, on raw
chunked tables (no HNSW build — the sweep only needs tbl/bias).

Variants (all end in the in-jit exact f32 re-rank, B=4096, k=10):
  A  baseline: bf16 dot -> f32 slab -> per-chunk approx bins
     (aggregate_to_topk=False) -> ONE exact top_k merge  (= bench lane)
  B  approx merge: same, but the final merge is approx_max_k
  C  bf16 slab: dot emits bf16 (slab HBM round-trip halves) -> bins ->
     approx merge
  D  per-chunk aggregated bins (aggregate_to_topk=True) -> approx merge

Prints per-variant median wall ms / QPS / recall@10 vs exact f32 GT.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

N, D, B, K, KF = 1_183_514, 100, 4096, 10, 26


def main():
    import jax
    import jax.numpy as jnp

    from cozo_tpu.ops.exact_knn import _chunking
    from cozo_tpu.utils.datasets import glove_like

    data = glove_like(N + B, D, seed=42)
    qs = data[N:]
    data = data[:N]
    d_pad = 128
    chunk, n_chunks = _chunking(N)
    total = chunk * n_chunks
    print(f"# chunks={n_chunks} chunk={chunk} total={total}", flush=True)
    tb = np.zeros((total, d_pad), dtype=np.float32)
    nrm = np.linalg.norm(data, axis=1, keepdims=True)
    tb[:N, :D] = data / np.where(nrm > 0, nrm, 1.0)
    bias = np.full(total, -np.inf, dtype=np.float32)
    bias[:N] = 0.0
    tbl = jax.device_put(jnp.asarray(tb.reshape(n_chunks, chunk, d_pad)))
    biasd = jax.device_put(jnp.asarray(bias.reshape(n_chunks, chunk)))
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    qp = np.zeros((B, d_pad), dtype=np.float16)
    qp[:, :D] = qn
    qd = jax.device_put(jnp.asarray(qp))

    # exact GT on device (f32 scan, exact top_k per chunk, exact merge)
    from cozo_tpu.ops import exact_knn as EK

    gt_fn = EK._sweep_fn(n_chunks, chunk, d_pad, K, 1.0, "f32",
                         rerank_k=0, metric="IP", d_in=0)  # qp pre-padded
    gt = np.asarray(gt_fn(tbl, biasd, qd))[:, :K]
    print("# GT done", flush=True)

    def mk(variant, rt=0.98, kf=KF):
        @jax.jit
        def run(tbl, bias, qs_in):
            qs_ = jnp.pad(qs_in.astype(jnp.float32), ((0, 0), (0, 0)))

            def body(_, xs):
                cv, cb = xs
                s = jax.lax.dot_general(
                    qs_.astype(jnp.bfloat16), cv.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = s + cb[None, :]
                if variant == "C":
                    s = s.astype(jnp.bfloat16)
                agg = variant == "D"
                nd, ni = jax.lax.approx_max_k(
                    s, kf, recall_target=rt, aggregate_to_topk=agg
                )
                return None, (nd, ni)

            _, (nds, nis) = jax.lax.scan(body, None, (tbl, bias))
            w = nds.shape[2]
            offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[
                None, :, None
            ]
            alld = jnp.moveaxis(nds, 0, 1).reshape(B, n_chunks * w)
            alli = (jnp.moveaxis(nis, 0, 1) + offs).reshape(B, n_chunks * w)
            if variant in ("A", "E"):
                bs, sel = jax.lax.top_k(alld, kf)
            else:
                bs, sel = jax.lax.approx_max_k(
                    alld.astype(jnp.float32), kf, recall_target=0.99,
                    aggregate_to_topk=True,
                )
            bi = jnp.take_along_axis(alli, sel, axis=1)
            flat = tbl.reshape(-1, d_pad)
            safe = jnp.where(bi >= 0, bi, 0)
            rows = flat[safe]
            valid = (bi >= 0) & jnp.isfinite(bs.astype(jnp.float32))
            s_exact = jnp.einsum(
                "bkd,bd->bk", rows, qs_,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            s_exact = jnp.where(valid, s_exact, -jnp.inf)
            ts, ti = jax.lax.top_k(s_exact, K)
            out_i = jnp.take_along_axis(bi, ti, axis=1)
            return jnp.concatenate(
                [out_i.astype(jnp.int32),
                 jax.lax.bitcast_convert_type(ts, jnp.int32)], axis=1)

        return run

    cases = [
        ("A", 0.98, KF), ("E", 0.97, KF), ("E", 0.95, 40), ("E", 0.95, KF),
        ("A", 0.98, KF),
    ]
    for v, rt, kf in cases:
        fn = mk(v, rt, kf)
        tag = f"{v} rt={rt} kf={kf}"
        t0 = time.time()
        out = np.asarray(fn(tbl, biasd, qd))
        print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
        reps = []
        for _ in range(5):
            t0 = time.time()
            out = np.asarray(fn(tbl, biasd, qd))
            reps.append(time.time() - t0)
        el = sorted(reps)[2]
        ids = out[:, :K]
        rec = np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
            for i in range(B)
        ])
        print(f"{tag}: median {el*1000:.1f}ms -> {B/el:,.0f} QPS "
              f"recall@10={rec:.4f} reps_ms="
              f"{[round(r*1000,1) for r in reps]}", flush=True)


if __name__ == "__main__":
    main()
