"""Serving operating-point sweep: batch size x recall_target through the
REAL serving entry (SweepTable.search, includes host prep + relay upload
+ packed pull).

The per-call relay costs are mostly FIXED (~30ms result pull, dispatch
latency), so a bigger batch amortizes them; the question is whether the
in-jit time stays linear (HBM pressure from the [B, chunk] score slabs)
and where QPS peaks.

Run ON TPU: python benches/profile_batch_size.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, K = 1_183_514, 100, 10


class StubIndex:
    """Bare table-holder: SweepTable only reads these fields."""

    def __init__(self, data):
        self.dim = D
        self.distance = "Cosine"
        self.vectors = data
        self.n = len(data)
        self.alive = np.ones(len(data), dtype=bool)
        self.norms = np.einsum("nd,nd->n", data, data).astype(np.float64)
        self.version = 0
        self.sweep_pending = set()


def main():
    from cozo_tpu.ops.exact_knn import SweepTable
    from cozo_tpu.utils.datasets import glove_like

    t0 = time.time()
    data = glove_like(N + 16384, D, seed=42)
    qs_all = data[N:]
    data = data[:N]
    print(f"# datagen {time.time()-t0:.0f}s", flush=True)

    idx = StubIndex(data)
    st = SweepTable()

    # exact GT on 256 queries (host matmul) for recall sanity
    sub = 256
    dn = data / np.sqrt(idx.norms)[:, None]
    qn = qs_all[:sub] / np.linalg.norm(qs_all[:sub], axis=1, keepdims=True)
    gt = np.argsort(-(qn.astype(np.float32) @ dn.T.astype(np.float32)),
                    axis=1)[:, :K]

    for B in (4096, 8192, 16384):
        qs = qs_all[:B]
        for rt in (0.98, 0.99):
            ids, _ = st.search(idx, qs, K, rt=rt)  # warm/compile
            reps = 5
            per = []
            for _ in range(reps):
                t0 = time.time()
                ids, _ = st.search(idx, qs, K, rt=rt)
                per.append(B / (time.time() - t0))
            rec = float(np.mean([
                len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
                for i in range(sub)
            ]))
            print(
                f"B={B:6d} rt={rt}: {np.mean(per):8,.0f} QPS "
                f"(min {min(per):,.0f} / med {np.median(per):,.0f}) "
                f"recall@10={rec:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
