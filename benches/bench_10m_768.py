"""BASELINE config #5 scale probe: 10M x 768-d cosine vector serving on
ONE TPU chip.  The f32 table is 30GB (vs 16GB HBM); serving runs the
int8-quantized chunked sweep (ops/quant_knn.py, 7.8GB on device) with
host f32 re-rank.  Records QPS + recall@10 vs exact host ground truth."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, NQ, K = 10_000_000, 768, 1024, 10
B = 1024

t0 = time.time()
from cozo_tpu.utils.datasets import glove_like
data = glove_like(N + NQ, D, seed=11, n_clusters=4096)
qs = data[N:]
data = data[:N]
print(f"datagen {time.time()-t0:.0f}s ({data.nbytes/2**30:.1f} GiB)", flush=True)

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
        [gt_i, np.arange(s, s + blk.shape[0])[None, :].repeat(NQ, 0)], axis=1)
    sel = np.argpartition(-alld, K - 1, axis=1)[:, :K]
    gt_d = np.take_along_axis(alld, sel, axis=1)
    gt_i = np.take_along_axis(alli, sel, axis=1)
print(f"ground truth {time.time()-t0:.0f}s", flush=True)

from cozo_tpu.ops.quant_knn import QuantSweepTable, quant_search

t0 = time.time()
tbl = QuantSweepTable().load(data, "Cosine", chunk=131072)
print(f"quantize+upload {time.time()-t0:.0f}s "
      f"(device {tbl.n_chunks*tbl.chunk*tbl.d_pad/2**30:.1f} GiB int8)",
      flush=True)

for of, rt in ((8, 0.95), (4, 0.95), (8, 0.85)):
    ids, d = quant_search(data, tbl, qs[:B], K, overfetch=of, rt=rt)  # warm
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        ids, d = quant_search(data, tbl, qs[:B], K, overfetch=of, rt=rt)
    el = (time.time() - t0) / reps
    rec = np.mean([
        len(set(ids[b].tolist()) & set(gt_i[b].tolist())) / K
        for b in range(B)
    ])
    print(f"overfetch={of} rt={rt}: {B/el:,.0f} QPS, recall@10={rec:.4f}",
          flush=True)
