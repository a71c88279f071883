"""Large-graph benchmark (BASELINE config 3: PageRank + Dijkstra fixed
rules at LiveJournal scale, ~69M edges).

Synthetic power-law-ish graph; measures device PageRank (10 iterations)
and batched device SSSP, reporting Medges/s.  Run standalone:
    python benches/graph_scale_bench.py [n_edges]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_graph(n_nodes: int, n_edges: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    # preferential-attachment-flavored degree skew via zipf-ish sampling
    src = (rng.pareto(1.2, n_edges) * n_nodes / 20).astype(np.int64) % n_nodes
    dst = rng.integers(0, n_nodes, n_edges)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, dst


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 69_000_000
    n_nodes = max(n_edges // 14, 1000)
    print(f"# generating {n_nodes} nodes / {n_edges} edges", file=sys.stderr)
    indptr, dst = make_graph(n_nodes, n_edges)

    from cozo_tpu.ops.graph_algos import (
        graph_content_key,
        pagerank_jax,
        sssp_device,
    )

    ck = graph_content_key(indptr, dst)
    t0 = time.time()
    ranks = pagerank_jax(indptr, dst, iterations=10, cache_key=ck)
    warm = time.time() - t0
    t0 = time.time()
    ranks = pagerank_jax(indptr, dst, iterations=10, cache_key=ck)
    dt = time.time() - t0
    medges = 10 * n_edges / dt / 1e6
    print(
        f"pagerank 10 iters: {dt:.2f}s ({medges:.0f} Medges/s relaxed; "
        f"first run incl compile {warm:.2f}s)"
    )

    w = np.ones(len(dst), dtype=np.float32)
    t0 = time.time()
    dists, parents = sssp_device(indptr, dst, w, [0], cache_key=ck)
    dt = time.time() - t0
    reached = int(np.isfinite(dists[0]).sum())
    print(f"sssp 1 source: {dt:.2f}s (reached {reached} nodes)")


if __name__ == "__main__":
    main()
