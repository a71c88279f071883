"""Large-graph benchmark (BASELINE config 3: PageRank + Dijkstra fixed
rules at LiveJournal scale, ~69M edges) + hub-graph LabelPropagation.

Synthetic power-law-ish graph; measures device PageRank (10 iterations),
batched device SSSP (cold = fresh staging in this process, warm = the
content-keyed staged image reused), and LabelPropagation on a 50M-edge
graph with a planted ~10K-in-degree hub (the hybrid kernel's worst case:
every node but the hub rides the dense device pick, the hub takes the
exact host weighted-mode lane).

Run standalone:
    python benches/graph_scale_bench.py [n_edges] [out.json]
Reference anchors: fixed_rule/algos/page_rank.rs, shortest_path_dijkstra.rs:432,
label_propagation.rs:97 (all host-side, single/rayon CPU in the reference).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULT = {}


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


def make_hub_graph(n_nodes: int, n_edges: int, hub_deg: int, seed: int = 11):
    """Uniform sparse graph + one node with `hub_deg` in-edges: the shape
    that fell off the sort-kernel cliff in r2 (1467s warm at 50M edges)."""
    rng = np.random.default_rng(seed)
    base = n_edges - hub_deg
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = np.empty(n_edges, dtype=np.int64)
    dst[:base] = rng.integers(0, n_nodes, base)
    dst[base:] = 0  # the hub
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, dst


def save(path):
    if path:
        with open(path, "w") as f:
            json.dump(RESULT, f, indent=1)


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 69_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    n_nodes = max(n_edges // 14, 1000)
    print(f"# generating {n_nodes} nodes / {n_edges} edges", file=sys.stderr)
    t0 = time.time()
    indptr, dst = make_graph(n_nodes, n_edges)
    RESULT.update(
        {
            "config": "BASELINE #3 (LiveJournal scale)",
            "graph": {"nodes": int(n_nodes), "edges": int(n_edges)},
            "datagen_s": round(time.time() - t0, 2),
            "chip": "1x TPU v5e via axon relay",
        }
    )

    from cozo_tpu.ops.graph_algos import (
        graph_content_key,
        labelprop_jax,
        pagerank_jax,
        sssp_device,
    )

    ck = graph_content_key(indptr, dst)
    t0 = time.time()
    pagerank_jax(indptr, dst, iterations=10, cache_key=ck)
    cold = time.time() - t0
    t0 = time.time()
    pagerank_jax(indptr, dst, iterations=10, cache_key=ck)
    dt = time.time() - t0
    medges = 10 * n_edges / dt / 1e6
    print(
        f"pagerank 10 iters: {dt:.2f}s ({medges:.0f} Medges/s relaxed; "
        f"first run incl compile {cold:.2f}s)"
    )
    RESULT.update(
        {
            "pagerank_first_run_incl_compile_s": round(cold, 2),
            "pagerank_10iter_warm_s": round(dt, 2),
            "pagerank_medges_per_s": round(medges),
        }
    )
    save(out_path)

    w = np.ones(len(dst), dtype=np.float32)
    t0 = time.time()
    dists, _parents = sssp_device(indptr, dst, w, [0], cache_key=ck)
    cold = time.time() - t0
    reached = int(np.isfinite(dists[0]).sum())
    t0 = time.time()
    dists, _parents = sssp_device(indptr, dst, w, [0], cache_key=ck)
    warm = time.time() - t0
    print(
        f"sssp 1 source: cold {cold:.2f}s / warm-staged {warm:.2f}s "
        f"(reached {reached} nodes)"
    )
    RESULT.update(
        {
            "sssp_cold_total_s": round(cold, 2),
            "sssp_warm_staged_run_s": round(warm, 2),
            "sssp_reached": reached,
            "sssp_kernel": "sliced-ELL, native counting-sort dst staging "
            "shared with PageRank, jitted device bucket pack, uniform-"
            "weight scalar upload",
            "note": "cold = staging + pack + solve in a fresh process "
            "(PageRank shares the dst-sort, run first as in real "
            "pipelines); warm-staged = content-keyed device image reused",
        }
    )
    save(out_path)

    # ---- LabelPropagation on a hub graph (VERDICT r3 next #6) ----
    lp_edges = min(n_edges, 50_000_000)
    lp_nodes = max(lp_edges // 14, 1000)
    hub_deg = 10_000
    print(
        f"# LP hub graph: {lp_nodes} nodes / {lp_edges} edges, "
        f"hub in-degree {hub_deg}",
        file=sys.stderr,
    )
    hp, hd = make_hub_graph(lp_nodes, lp_edges, hub_deg)
    hck = graph_content_key(hp, hd)
    t0 = time.time()
    labels = labelprop_jax(hp, hd, iterations=10, cache_key=hck)
    cold = time.time() - t0
    t0 = time.time()
    labels = labelprop_jax(hp, hd, iterations=10, cache_key=hck)
    warm = time.time() - t0
    n_comms = int(len(np.unique(labels)))
    print(
        f"labelprop hub graph: cold {cold:.2f}s / warm {warm:.2f}s "
        f"({n_comms} communities)"
    )
    RESULT["labelprop_hub"] = {
        "nodes": int(lp_nodes),
        "edges": int(lp_edges),
        "hub_in_degree": hub_deg,
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 2),
        "communities": n_comms,
        "kernel": "hybrid: dense device pick for deg<=cap nodes + exact "
        "host weighted-mode for hubs (r2 sort kernel: 1467s warm at this "
        "scale)",
    }
    save(out_path)


if __name__ == "__main__":
    main()
