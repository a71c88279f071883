"""Exact f32 ground truth for the 10M hybrid bench, computed on the
host (blocked BLAS matmul) and persisted next to the dataset cache.

Why host: the previous GT lane (int8 device scan at rt=1.0) kept a
[n_pad, B] f32 slab on device next to the 7.7 GB int8 serving table and
OOMed 16 GB HBM at 10M rows (VERDICT r4 missing #1).  GT depends only
on (dataset, n, K, queries) — it is a per-dataset artifact, not
per-run work — so it is computed once, exactly, in f32 on the host
(~7.9 TFLOP for 512 queries x 10M x 768: a few minutes of BLAS) and
every recall_eval after that is a file load.

Usage: python benches/gt_host.py <data.npy> <n> [neval] [k] [out.npz]
Output keys: ids [neval, k] int64 (dataset row order), metric, n, k.
Reference anchor: runtime/hnsw.rs:869 (exact recall semantics).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gt_path(cache_path: str, n: int, k: int, neval: int) -> str:
    base, _ = os.path.splitext(cache_path)
    return f"{base}.gt_n{n}_k{k}_q{neval}.npz"


def compute_gt(data, n, qs, k, metric="Cosine", blk=65536, log=True):
    """Exact top-k (dataset row ids) of `qs` against data[:n]."""
    nq = qs.shape[0]
    q = np.ascontiguousarray(qs, dtype=np.float32)
    if metric == "Cosine":
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.where(qn > 0, qn, 1.0)
    # running top-k: keep (score, id) heaps as arrays, merge per block
    best_s = np.full((nq, k), -np.inf, dtype=np.float32)
    best_i = np.full((nq, k), -1, dtype=np.int64)
    qt = q.T.copy()  # [d, nq] contiguous for the GEMM
    t0 = time.time()
    for s0 in range(0, n, blk):
        v = np.asarray(data[s0 : min(s0 + blk, n)], dtype=np.float32)
        s = v @ qt  # [blk, nq]
        if metric == "Cosine":
            vn = np.linalg.norm(v, axis=1)
            s /= np.where(vn > 0, vn, 1.0)[:, None]
        elif metric == "L2":
            vv = np.einsum("bd,bd->b", v, v)
            s = 2.0 * s - vv[:, None]  # ranks -||q-v||^2
        st = s.T  # [nq, blk]
        m = st.shape[1]
        kk = min(k, m)
        part = np.argpartition(st, m - kk, axis=1)[:, m - kk:]
        ps = np.take_along_axis(st, part, axis=1)
        cat_s = np.concatenate([best_s, ps.astype(np.float32)], axis=1)
        cat_i = np.concatenate([best_i, part.astype(np.int64) + s0], axis=1)
        sel = np.argpartition(-cat_s, k - 1, axis=1)[:, :k]
        best_s = np.take_along_axis(cat_s, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
        if log and (s0 // blk) % 16 == 0:
            done = min(s0 + blk, n)
            el = time.time() - t0
            print(f"# gt {done}/{n} rows {el:.0f}s "
                  f"(~{el / max(done, 1) * n:.0f}s total)", flush=True)
    order = np.argsort(-best_s, axis=1, kind="stable")
    return np.take_along_axis(best_i, order, axis=1)


def main():
    path = sys.argv[1]
    n = int(sys.argv[2])
    neval = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    out = sys.argv[5] if len(sys.argv) > 5 else gt_path(path, n, k, neval)
    data = np.load(path, mmap_mode="r")
    qs = np.asarray(data[n : n + neval])
    t0 = time.time()
    ids = compute_gt(data, n, qs, k, metric="Cosine")
    el = time.time() - t0
    np.savez_compressed(out, ids=ids, n=n, k=k, neval=neval,
                        metric="Cosine")
    print(f"# GT saved {out} ({el:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
