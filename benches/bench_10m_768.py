"""BASELINE config #5 scale probe: 10M x 768-d cosine vector serving on
ONE TPU chip.  The f32 table is 30GB (vs 16GB HBM); serving runs the
int8-quantized chunked sweep (ops/quant_knn.py, 7.8GB on device) with
host f32 re-rank.  Records QPS + recall@10 vs exact host ground truth."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, NQ, K = 10_000_000, 768, 1024, 10
B = 1024

def emb_like_fast(n, d, seed=11, n_clusters=4096, rank=96):
    """Clustered embedding stand-in generated at BLAS speed: per-cluster
    low-rank latents (rank-96 anisotropic) expanded to d dims.  This VM
    generates normals at only ~14M f32/s, so the full-rank glove_like
    would take ~10 minutes for 7.7G values; the latent scheme needs
    n*rank normals + one matmul, and low intrinsic dimension per cluster
    is itself embedding-realistic."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n_clusters + 1) ** 0.9
    w /= w.sum()
    sizes = rng.multinomial(n, w)
    centers = (rng.standard_normal((n_clusters, d)) * 4.0).astype(np.float32)
    out = np.empty((n, d), dtype=np.float32)
    pos = 0
    for c in range(n_clusters):
        s = sizes[c]
        if s == 0:
            continue
        z = rng.standard_normal((s, rank), dtype=np.float32)
        z *= np.exp(rng.standard_normal(rank) * 0.6).astype(np.float32)[None, :]
        basis = rng.standard_normal((rank, d), dtype=np.float32) / np.sqrt(rank)
        out[pos : pos + s] = centers[c][None, :] + z @ basis
        pos += s
    out *= np.exp(rng.standard_normal(n) * 0.25).astype(np.float32)[:, None]
    return out


# datagen (12 min) and exact ground truth (29 min) are disk-cached: the
# quantize/serve phases under test can be re-run without recomputing them
CACHE = os.environ.get("COZO_BENCH10M_CACHE", "/tmp/bench10m_cache")
os.makedirs(CACHE, exist_ok=True)
_data_f = os.path.join(CACHE, "data.npy")
_qs_f = os.path.join(CACHE, "qs.npy")
_gt_f = os.path.join(CACHE, "gt.npz")

if os.path.exists(_data_f) and os.path.exists(_qs_f):
    t0 = time.time()
    data = np.load(_data_f, mmap_mode=None)
    qs = np.load(_qs_f)
    print(f"datagen (cached) {time.time()-t0:.0f}s", flush=True)
else:
    t0 = time.time()
    data = emb_like_fast(N + NQ, D)
    qs = data[N:].copy()
    data = data[:N]
    np.save(_qs_f, qs)
    np.save(_data_f, data)
    print(f"datagen {time.time()-t0:.0f}s ({data.nbytes/2**30:.1f} GiB)",
          flush=True)

if os.path.exists(_gt_f):
    z = np.load(_gt_f)
    gt_d, gt_i = z["gt_d"], z["gt_i"]
    print("ground truth (cached)", flush=True)
else:
    # exact cosine ground truth on host BLAS (chunked)
    t0 = time.time()
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    gt_d = np.full((NQ, K), -np.inf, np.float32)
    gt_i = np.full((NQ, K), -1, np.int64)
    CH = 500_000
    for s in range(0, N, CH):
        blk = data[s : s + CH]
        bn = np.linalg.norm(blk, axis=1)
        sims = (qn @ blk.T) / np.where(bn > 0, bn, 1.0)[None, :]
        alld = np.concatenate([gt_d, sims], axis=1)
        alli = np.concatenate(
            [gt_i, np.arange(s, s + blk.shape[0])[None, :].repeat(NQ, 0)],
            axis=1)
        sel = np.argpartition(-alld, K - 1, axis=1)[:, :K]
        gt_d = np.take_along_axis(alld, sel, axis=1)
        gt_i = np.take_along_axis(alli, sel, axis=1)
    np.savez(_gt_f, gt_d=gt_d, gt_i=gt_i)
    print(f"ground truth {time.time()-t0:.0f}s", flush=True)

from cozo_tpu.ops.quant_knn import QuantSweepTable, quant_search

_q_f = os.path.join(CACHE, "quant.npz")
t0 = time.time()
tbl = QuantSweepTable()
if os.path.exists(_q_f):
    z = np.load(_q_f)
    tbl.n, tbl.distance = N, "Cosine"
    tbl.chunk, tbl.n_chunks, tbl.d_pad = (
        int(z["chunk"]), int(z["n_chunks"]), int(z["d_pad"]))
    import jax, jax.numpy as jnp
    tbl.tbl = jax.device_put(jnp.asarray(
        z["qp"].reshape(tbl.n_chunks, tbl.chunk, tbl.d_pad)))
    tbl.scales = jax.device_put(jnp.asarray(
        z["sp"].reshape(tbl.n_chunks, tbl.chunk)))
    print(f"quantize (cached) + upload {time.time()-t0:.0f}s", flush=True)
else:
    tbl.load(data, "Cosine", chunk=131072, keep_host=True)
    np.savez(_q_f, qp=tbl.host_qp, sp=tbl.host_sp,
             chunk=tbl.chunk, n_chunks=tbl.n_chunks, d_pad=tbl.d_pad)
    del tbl.host_qp, tbl.host_sp
    print(f"quantize+upload {time.time()-t0:.0f}s "
          f"(device {tbl.n_chunks*tbl.chunk*tbl.d_pad/2**30:.1f} GiB int8)",
          flush=True)

for of, rt, b in ((2, 0.95, 4096), (1, 0.95, 4096), (2, 0.95, 8192),
                  (2, 0.95, 16384)):
    qb = np.tile(qs, (b // NQ, 1)) if b > NQ else qs[:b]
    ids, d = quant_search(data, tbl, qb, K, overfetch=of, rt=rt)  # warm
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        ids, d = quant_search(data, tbl, qb, K, overfetch=of, rt=rt)
    el = (time.time() - t0) / reps
    nr = min(b, NQ)  # recall over the unique queries
    rec = np.mean([
        len(set(ids[i].tolist()) & set(gt_i[i].tolist())) / K
        for i in range(nr)
    ])
    print(f"overfetch={of} rt={rt} B={b}: {b/el:,.0f} QPS, "
          f"recall@10={rec:.4f}", flush=True)
