"""BASELINE config #5, datalog half: hybrid recursive Datalog + HNSW
vector-pivot joins + community detection on the proximity graph — all
through the full engine at 1.18M x 100-d (the glove-100 shape whose
serving numbers bench.py records).

Phases (each timed, printed as JSON lines):
  1. ingest 1.18M vector rows (ndarray params, batched :put)
  2. ::hnsw create  — device bulk build via the DDL path
  3. batched vector-pivot join: 4096 stored query vectors datalog-joined
     through the HNSW search atom
  4. recursive expansion: 2-hop semantic neighborhood via datalog
     recursion over the HNSW atom
  5. proximity graph as a relation: scan *item:ix level-0 edges into a
     fixed rule — PageRank + LabelPropagation (device kernels) over the
     ~2M-node graph
Reference anchors: HnswSearchRA (query/ra.rs:1085), proximity-graph
querying (README.md:52-54)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, NQ, K = 1_183_514, 100, 4096, 10


def emit(phase, seconds, **kw):
    print(json.dumps({"phase": phase, "seconds": round(seconds, 2), **kw}),
          flush=True)


def main():
    from cozo_tpu.runtime.db import Db
    from cozo_tpu.utils.datasets import glove_like

    t0 = time.time()
    data = glove_like(N + NQ, D, seed=42)
    qs = data[N:]
    data = data[:N]
    emit("datagen", time.time() - t0)

    db = Db("mem")
    db.run_script(f":create item {{id: Int => v: <F32; {D}>}}")
    t0 = time.time()
    B = 50_000
    for s in range(0, N, B):
        rows = [[int(s + i), data[s + i]] for i in range(min(B, N - s))]
        db.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": rows})
    emit("ingest", time.time() - t0, rows=N,
         rows_per_s=round(N / (time.time() - t0)))

    t0 = time.time()
    db.run_script(
        f"::hnsw create item:ix {{dim: {D}, m: 16, dtype: F32, fields: [v], "
        "distance: Cosine, ef_construction: 200}"
    )
    emit("hnsw_ddl_bulk_build", time.time() - t0, n=N)

    # stored query table for the vector-pivot join
    db.run_script(f":create q {{qid: Int => qv: <F32; {D}>}}")
    db.run_script(
        "?[qid, qv] <- $rows :put q {qid => qv}",
        {"rows": [[int(i), qs[i]] for i in range(NQ)]},
    )

    join = (
        "?[qid, id, d] := *q{qid, qv}, "
        "~item:ix{id | query: qv, k: 10, ef: 64, bind_distance: d}"
    )
    out = db.run_script(join)  # warm (device compile + caches)
    t0 = time.time()
    out = db.run_script(join)
    el = time.time() - t0
    emit("vector_pivot_join", el, queries=NQ, rows=len(out.rows),
         qps=round(NQ / el))

    two_hop = (
        "first[id, v2] := ~item:ix{id, v: v2 | query: qv, k: 4, ef: 64}, "
        "qv = vec($q)\n"
        "?[id2] := first[id, v2], "
        "~item:ix{id: id2 | query: v2, k: 4, ef: 64}, id2 != id"
    )
    db.run_script(two_hop, {"q": qs[0]})
    t0 = time.time()
    reps = 20
    for r in range(reps):
        out = db.run_script(two_hop, {"q": qs[r]})
    el = (time.time() - t0) / reps
    emit("recursive_2hop", el, rows=len(out.rows))

    # proximity graph (level-0 HNSW edges) -> device graph algorithms.
    # Materialized once into a stored relation (the reference's README
    # example queries the idx relation the same way, README.md:52-54);
    # `*prox[]` inputs then hit the int-pair CSR fast staging + the
    # per-(relation,version) CSR cache + the device graph cache.
    t0 = time.time()
    db.run_script(":create prox {fr: Int, to: Int}")
    db.run_script(
        "?[fr, to] := *item:ix{layer: 0, fr_id: fr, to_id: to}, fr != to "
        ":put prox {fr, to}"
    )
    n_edges = db.run_script("?[count(fr)] := *prox{fr}").rows[0][0]
    emit("proximity_materialize", time.time() - t0, edges=n_edges)

    pr_script = "?[n, s] <~ PageRank(*prox[fr, to])\n:limit 10"
    t0 = time.time()
    out = db.run_script(pr_script)
    emit("proximity_pagerank_cold", time.time() - t0)
    t0 = time.time()
    out = db.run_script(pr_script)
    emit("proximity_pagerank_warm", time.time() - t0)

    lp_script = (
        "?[l, n] <~ LabelPropagation(*prox[fr, to], undirected: true)\n"
        ":limit 10"
    )
    t0 = time.time()
    out = db.run_script(lp_script)
    emit("proximity_labelprop_cold", time.time() - t0)
    t0 = time.time()
    out = db.run_script(lp_script)
    emit("proximity_labelprop_warm", time.time() - t0)


if __name__ == "__main__":
    main()
