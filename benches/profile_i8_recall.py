"""int8-lane operating-point sweep at the bench shape (VERDICT r4 next #5).

The i8 serving lane scores at 2x the bf16 MXU rate but lands recall@10
0.9894 at the default (rt=0.98, rerank_k=k+16) point — under the 0.999
headline bar. This sweeps (rt, rerank_k, B) to find whether a wider
exact-f32 rerank buys the missing recall for less than the bf16 lane's
speed advantage. Uses a vectors-only stand-in index (the sweep table
never touches the HNSW graph) so the 1.18M build is skipped.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, NQ, K = 1_183_514, 100, int(os.environ.get("COZO_PROF_NQ", 8192)), 10


class VecOnlyIndex:
    """Duck-typed minimum for SweepTable: vectors/alive/norms/n/version."""

    def __init__(self, data):
        self.dim = data.shape[1]
        self.distance = "Cosine"
        self.version = 1
        self.n = data.shape[0]
        self.vectors = data
        self.alive = np.ones(data.shape[0], dtype=bool)
        self.norms = np.einsum("nd,nd->n", data, data).astype(np.float64)
        self.sweep_pending = set()


def main():
    from cozo_tpu.ops.exact_knn import sweep_search
    from cozo_tpu.utils.datasets import glove_like

    t0 = time.time()
    data = glove_like(N + NQ, D, seed=42)
    qs_all = data[N:]
    data = data[:N]
    print(f"datagen {time.time()-t0:.0f}s", flush=True)
    index = VecOnlyIndex(data)

    # recall is estimated on the first NQ_GT queries (sample error
    # ~1e-4 at 16K queries); QPS is measured at the full batch width
    NQ_GT = min(NQ, int(os.environ.get("COZO_PROF_NQ_GT", 16384)))
    t0 = time.time()
    gt8_ids, _ = sweep_search(index, qs_all[:NQ_GT], K, rt=1.0,
                              compute_dtype="f32", exact_rerank=False)
    print(f"gt {time.time()-t0:.0f}s", flush=True)

    def recall(ids, gt):
        return float(np.mean([
            len(set(ids[b].tolist()) & set(gt[b].tolist())) / K
            for b in range(len(gt))
        ]))

    import json as _json

    cfg_env = os.environ.get("COZO_PROF_CONFIGS")
    if cfg_env:
        configs = [tuple(c) for c in _json.loads(cfg_env)]
    else:
        configs = [
            ("bf16 rt.98 rk26  B4096", "bf16", 0.98, None, 4096),
            ("i8   rt.98 rk26  B4096", "i8", 0.98, None, 4096),
            ("i8   rt.98 rk64  B4096", "i8", 0.98, 64, 4096),
            ("i8   rt.99 rk64  B4096", "i8", 0.99, 64, 4096),
            ("i8   rt.99 rk128 B4096", "i8", 0.99, 128, 4096),
            ("i8   rt.995 rk128 B4096", "i8", 0.995, 128, 4096),
            ("bf16 rt.98 rk26  B8192", "bf16", 0.98, None, 8192),
            ("i8   rt.99 rk128 B8192", "i8", 0.99, 128, 8192),
        ]
    for tag, mode, rt, rk, B in configs:
        q = qs_all[:B]
        gt = gt8_ids[: min(B, NQ_GT)]
        rerank = mode != "raw"
        cd = mode if mode in ("i8", "fused") else "bf16"
        try:
            ids, _ = sweep_search(index, q, K, rt=rt, compute_dtype=cd,
                                  exact_rerank=rerank, rerank_k=rk)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        per = []
        for _ in range(3):
            t0 = time.time()
            ids, _ = sweep_search(index, q, K, rt=rt, compute_dtype=cd,
                                  exact_rerank=rerank, rerank_k=rk)
            per.append(B / (time.time() - t0))
        r = recall(ids, gt)
        print(
            f"{tag}: median {np.median(per):,.0f} QPS "
            f"(reps {', '.join(f'{p:,.0f}' for p in per)}) recall@10={r:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
