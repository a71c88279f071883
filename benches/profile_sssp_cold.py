"""Breakdown of the SSSP cold path at 69M edges (VERDICT r4 next #7).

Reproduces graph_scale_bench's PageRank->SSSP order with
COZO_TPU_SSSP_LOG=1 so the meta/pack/solve split is visible.
"""

import os
import sys
import time

os.environ.setdefault("COZO_TPU_SSSP_LOG", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from graph_scale_bench import make_graph


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 69_000_000
    n_nodes = max(n_edges // 14, 1000)
    t = time.time()
    indptr, dst = make_graph(n_nodes, n_edges)
    print(f"datagen {time.time()-t:.1f}s", flush=True)

    from cozo_tpu.ops.graph_algos import (
        graph_content_key,
        pagerank_jax,
        sssp_device,
    )

    t = time.time()
    ck = graph_content_key(indptr, dst)
    print(f"content key {time.time()-t:.1f}s", flush=True)
    t = time.time()
    pagerank_jax(indptr, dst, iterations=10, cache_key=ck)
    print(f"pagerank cold {time.time()-t:.1f}s", flush=True)
    w = np.ones(len(dst), dtype=np.float32)
    t = time.time()
    sssp_device(indptr, dst, w, [0], cache_key=ck)
    print(f"sssp cold {time.time()-t:.1f}s", flush=True)
    t = time.time()
    sssp_device(indptr, dst, w, [0], cache_key=ck)
    print(f"sssp warm {time.time()-t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
