"""Benchmark: SIFT-10K-shaped HNSW build + batched k-NN on TPU
(BASELINE.json config #1: 10K × 128-d, M=16, ef_construction=200,
k=10 L2 queries, in-mem storage).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no HNSW QPS (BASELINE.md — README
only claims "vector-op limited"); we baseline against 5_000 QPS, a
generous single-thread estimate for the Rust engine's pointer-chasing
search at these parameters (each query touches ~ef·M ≈ 1-2K candidate
distances plus a KV get per vector, README.md:62-65).  Recall@10 is
measured against exact brute force and reported alongside."""

import json
import sys
import time

import numpy as np


def main():
    from cozo_tpu.models.hnsw_index import HnswIndex
    from cozo_tpu.ops.vector_search import brute_force_knn

    rng = np.random.default_rng(42)
    n, dim, n_queries, k, ef = 10_000, 128, 4096, 10, 96

    data = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)

    t0 = time.time()
    index = HnswIndex(dim=dim, m=16, ef_construction=200, distance="L2")
    index.bulk_build(data, wave=512)  # wave-batched construction
    build_s = time.time() - t0
    print(f"# build: {n} vectors in {build_s:.1f}s", file=sys.stderr)

    # ground truth (device brute force)
    t_ids, _ = brute_force_knn(
        index.vectors[: index.n], index.norms[: index.n], queries, k, "L2"
    )

    # warm up + compile the device search
    ids, dists = index.search(queries, k=k, ef=ef, use_tpu=True)

    t0 = time.time()
    reps = 4
    for _ in range(reps):
        ids, dists = index.search(queries, k=k, ef=ef, use_tpu=True)
    elapsed = time.time() - t0
    qps = reps * n_queries / elapsed

    hits = 0
    for b in range(n_queries):
        hits += len(set(t_ids[b].tolist()) & set(ids[b].tolist()))
    recall = hits / (n_queries * k)
    print(f"# recall@10 = {recall:.4f}, qps = {qps:.0f}", file=sys.stderr)

    baseline_qps = 5_000.0
    print(
        json.dumps(
            {
                "metric": f"hnsw_sift10k_qps_k10_ef{ef}_recall{recall:.3f}",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / baseline_qps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
