"""BASELINE config #5 at FULL scale: hybrid recursive Datalog + HNSW
vector-pivot joins over 10M x 768-d embeddings + community detection on
the proximity graph — every phase through the engine (`Db`), not the ops
layer (VERDICT r2 missing #2).

What full scale exercises that 1.18M did not:
  - the DDL build persists a *packed KV image* (runtime/hnsw_packed.py)
    instead of ~330M discrete edge rows;
  - the device build runs on the int8 table (ops/bulk_build.py
    `_build_step_fn_i8`) because the f32 table (30.7 GB) exceeds HBM;
  - serving inherits the build's int8 table (no host re-quantization)
    and re-ranks candidates against the host f32 rows;
  - the proximity graph stages straight from the in-memory adjacency
    via the fixed-rule constant-pin arg (`*item:ix{layer: 0, ...}`).

Ground truth for recall: exhaustive int8 device scan with kf=4096
over-fetch + exact f32 host re-rank (miss probability « 0.1%).

Run: python benches/bench_hybrid_10m.py [n] [out.json]
Reference anchors: runtime/hnsw.rs:679,869; README.md:52-58.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = int(os.environ.get("COZO_BENCH_DIM", 768))
NQ = int(os.environ.get("COZO_BENCH_NQ", 4096))
K = 10
N_CLUSTERS = 4096

PHASES = []
OUT_PATH = None
META = {}


def _rss_now_mb():
    """Current (not peak) resident size — the r4 run OOMed the host at
    the LabelPropagation phase and ru_maxrss couldn't attribute it."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return -1


def emit(phase, seconds, **kw):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    rec = {"phase": phase, "seconds": round(seconds, 2),
           "peak_rss_mb": rss, "rss_now_mb": _rss_now_mb(), **kw}
    PHASES.append(rec)
    if phase == "done":
        META["status"] = "done"
    print(json.dumps(rec), flush=True)
    if OUT_PATH:  # incremental: a killed run keeps its finished phases
        with open(OUT_PATH, "w") as f:
            json.dump({**META, "phases": PHASES}, f, indent=1)


def gen_clustered(n, seed=42):
    """Streaming clustered embeddings (glove_like's distribution without
    its second full-size permutation copy — at 10M x 768 that copy alone
    is 30.7 GB)."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, N_CLUSTERS + 1) ** 0.9
    w /= w.sum()
    centers = (rng.standard_normal((N_CLUSTERS, D)) * 4.0).astype(np.float32)
    scales = np.exp(rng.standard_normal((N_CLUSTERS, D)) * 0.6).astype(
        np.float32
    )
    out = np.empty((n, D), dtype=np.float32)
    BLK = 262_144
    for s0 in range(0, n, BLK):
        m = min(BLK, n - s0)
        cid = rng.choice(N_CLUSTERS, size=m, p=w)
        blk = rng.standard_normal((m, D), dtype=np.float32)
        blk *= scales[cid]
        blk += centers[cid]
        blk *= np.exp(rng.standard_normal(m) * 0.25)[:, None].astype(
            np.float32
        )
        out[s0 : s0 + m] = blk
    return out


def main():
    global OUT_PATH
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    OUT_PATH = sys.argv[2] if len(sys.argv) > 2 else None
    META.update({"n": n, "dim": D, "status": "INCOMPLETE"})
    # internal deadline: exit CLEANLY past the budget instead of being
    # timeout-killed mid-TPU-call (a SIGKILLed axon client wedges the
    # device lease for a long time — learned the hard way)
    t_start = time.time()
    deadline = float(os.environ.get("COZO_BENCH_DEADLINE", 0)) or None

    def over_deadline(phase):
        if deadline and time.time() - t_start > deadline:
            emit("skipped_past_deadline", time.time() - t_start, at=phase)
            return True
        return False

    # a 10M build on host waves would take days — fail loudly instead
    os.environ.setdefault("COZO_TPU_REQUIRE_DEVICE_BUILD", "1")
    # attribute the join's engine-vs-device split in the artifact log
    # (r4's 318 QPS collapse was unattributable without it)
    os.environ.setdefault("COZO_TPU_SEARCH_TIMING", "1")

    from cozo_tpu.runtime.db import Db

    t0 = time.time()
    cache_path = os.environ.get("COZO_BENCH_DATA_CACHE")
    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path, mmap_mode="r")
        assert data.shape[0] >= n + NQ and data.shape[1] == D, data.shape
        data = data[: n + NQ]
    else:
        data = gen_clustered(n + NQ)
        if cache_path:
            np.save(cache_path, data)
            data = np.load(cache_path, mmap_mode="r")  # drop the RAM copy
    qs = np.asarray(data[n:])
    emit("datagen", time.time() - t0, rows=n, dim=D,
         cached=bool(cache_path))

    db = Db("mem")
    db.run_script(f":create item {{id: Int => v: <F32; {D}>}}")
    t0 = time.time()
    B = 25_000
    for s in range(0, n, B):
        rows = [[int(s + i), data[s + i]] for i in range(min(B, n - s))]
        db.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": rows})
    el = time.time() - t0
    emit("ingest", el, rows=n, rows_per_s=round(n / el))
    del data  # KV owns the rows now; drop the 30 GB staging array

    # serialize device use against a concurrent bench: wait (bounded)
    # while the lock file exists before the first TPU touch.  The wait
    # doesn't count against the deadline.
    lock = os.environ.get("COZO_TPU_WAIT_LOCK")
    if lock:
        waited = 0.0
        while os.path.exists(lock) and waited < 5400:
            time.sleep(5)
            waited += 5
        if waited:
            print(f"# waited {waited:.0f}s for TPU lock {lock}", flush=True)
            t_start += waited

    t0 = time.time()
    db.run_script(
        f"::hnsw create item:ix {{dim: {D}, m: 16, dtype: F32, fields: [v], "
        "distance: Cosine, ef_construction: 200}"
    )
    el = time.time() - t0
    emit("hnsw_ddl_bulk_build", el, n=n, rows_per_s=round(n / el))

    # release fragmented allocator arenas from ingest/build back to the
    # kernel: the join phases run at ~125GB RSS otherwise and the engine
    # path pays ~1s of pure memory-pressure overhead (r5 timing)
    import ctypes
    import gc as _gc

    _gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass
    # freeze the resident 10M-row heap out of the cyclic collector: the
    # join's ~1M transient envs/rows per rep trigger young-gen GC passes
    # whose full-heap sweeps otherwise cost >1s/rep at this scale (the
    # r5b run's 975-2072 QPS rep spread; see _GcEvalTimer in runtime/db.py)
    _gc.freeze()
    emit("malloc_trim", 0.0, gc_frozen=_gc.get_freeze_count())

    # confirm the packed image actually engaged at this scale
    tx = db._new_session(False, 0)
    packed = tx.get_relation("item:ix").packed_src is not None
    tx.abort()
    emit("packed_image", 0.0, engaged=packed)

    # stored query table for the vector-pivot join
    db.run_script(f":create q {{qid: Int => qv: <F32; {D}>}}")
    for s in range(0, NQ, B):
        db.run_script(
            "?[qid, qv] <- $rows :put q {qid => qv}",
            {"rows": [[int(i), qs[i]] for i in range(s, min(s + B, NQ))]},
        )

    join = (
        "?[qid, id, d] := *q{qid, qv}, "
        f"~item:ix{{id | query: qv, k: {K}, ef: 64, bind_distance: d}}"
    )
    t0 = time.time()
    out = db.run_script(join)  # cold (compile + device staging)
    emit("vector_pivot_join_cold", time.time() - t0, queries=NQ,
         rows=len(out.rows))
    # 5 warm reps: the relay's run-to-run weather is ±15%+; report the
    # median as the headline (per-rep values stay in the artifact)
    reps = []
    for _ in range(5):
        t0 = time.time()
        out = db.run_script(join)
        reps.append(time.time() - t0)
    el = sorted(reps)[len(reps) // 2]
    emit("vector_pivot_join", el, queries=NQ, rows=len(out.rows),
         qps=round(NQ / el),
         reps_qps=[round(NQ / r) for r in reps])

    # overfetch-2 variant: the int8 scan's rank order is near-exact, so
    # halving the host re-rank candidate set halves its gather+einsum
    # cost; its recall is stamped by a separate eval below
    os.environ["COZO_TPU_QUANT_OVERFETCH"] = "2"
    reps2 = []
    out2q = None
    for _ in range(5):
        t0 = time.time()
        out2q = db.run_script(join)
        reps2.append(time.time() - t0)
    del os.environ["COZO_TPU_QUANT_OVERFETCH"]
    el = sorted(reps2)[len(reps2) // 2]
    emit("vector_pivot_join_of2", el, queries=NQ, rows=len(out2q.rows),
         qps=round(NQ / el),
         reps_qps=[round(NQ / r) for r in reps2])

    # ops-layer search timing (same queries, straight through
    # HnswIndex.search): separates kernel cost from engine-step cost in
    # the artifact itself — the r4 join collapse (318 QPS) was
    # unattributable without it
    from cozo_tpu.runtime.hnsw import get_hnsw_cache

    tx = db._new_session(False, 0)
    base = tx.get_relation("item")
    cache = get_hnsw_cache(db, tx, base, "ix", base.indices["ix"])
    idx = cache.index
    t0 = time.time()
    idx.search(qs, K, 64)
    el = time.time() - t0
    emit("vector_search_ops_layer", el, queries=NQ, qps=round(NQ / el))
    tx.abort()

    # recall vs exact f32 ground truth (host-computed, cached on disk
    # next to the dataset — benches/gt_host.py.  The r4 device GT lane
    # kept a [n_pad, B] f32 slab next to the 7.7GB int8 table and OOMed
    # HBM; GT is a per-dataset artifact, not per-run work.)
    t0 = time.time()
    got = {}
    for r in out.rows:
        got.setdefault(r[0], []).append(r[1])
    NEVAL = min(512, NQ)
    from benches.gt_host import compute_gt, gt_path

    if not cache_path:
        raise SystemExit(
            "recall_eval needs COZO_BENCH_DATA_CACHE (exact GT is "
            "computed against the on-disk dataset; see benches/gt_host.py)"
        )
    gp = gt_path(cache_path, n, K, NEVAL)
    if os.path.exists(gp):
        gt_ids = np.load(gp)["ids"]
        gt_src = "disk"
    else:
        gt_ids = compute_gt(
            np.load(cache_path, mmap_mode="r"), n, qs[:NEVAL], K,
            metric="Cosine",
        )
        np.savez_compressed(gp, ids=gt_ids, n=n, k=K, neval=NEVAL,
                            metric="Cosine")
        gt_src = "computed"
    hits = 0
    for i in range(NEVAL):
        hits += len(set(got.get(i, [])) & set(gt_ids[i].tolist()))
    rec = hits / (NEVAL * K)
    got2 = {}
    for r in out2q.rows:
        got2.setdefault(r[0], []).append(r[1])
    hits2 = 0
    for i in range(NEVAL):
        hits2 += len(set(got2.get(i, [])) & set(gt_ids[i].tolist()))
    emit("recall_eval", time.time() - t0, recall_at_10=round(rec, 4),
         recall_at_10_of2=round(hits2 / (NEVAL * K), 4),
         eval_queries=NEVAL, gt=f"exact-f32-host-{gt_src}")

    if os.environ.get("COZO_BENCH_UNTIL") == "recall_eval":
        # targeted serving-only rerun: the graph phases are covered by a
        # prior full artifact; stop here with an explicit marker
        emit("stopped_at_recall_eval_by_request", time.time() - t_start)
        emit("done", 0.0)
        return

    if over_deadline("recursive_2hop"):
        return
    # recursive 2-hop semantic expansion through the search atom
    two_hop = (
        "first[id, v2] := ~item:ix{id, v: v2 | query: qv, k: 4, ef: 64}, "
        "qv = vec($q)\n"
        "?[id2] := first[id, v2], "
        "~item:ix{id: id2 | query: v2, k: 4, ef: 64}, id2 != id"
    )
    db.run_script(two_hop, {"q": qs[0]})
    t0 = time.time()
    reps = 3
    for r in range(reps):
        out2 = db.run_script(two_hop, {"q": qs[r]})
    emit("recursive_2hop", (time.time() - t0) / reps, rows=len(out2.rows))

    if over_deadline("proximity_pagerank"):
        return
    # nothing after the 2-hop uses vector serving: free the int8 table
    # (7.7GB of HBM at 10M x 768) so the graph phases get the whole chip,
    # AND the host-side f32 row mirror + norms (30.8GB at 10M x 768) so
    # the graph phases get the host RAM — the r4 run entered
    # LabelPropagation at ~120GB RSS and the kernel OOM-killed it at
    # 131GB.  The mirror is a cache: it rebuilds from the KV rows if a
    # later search needs it (none does in this pipeline).
    qt = idx._quant_sweep
    if qt is not None:
        qt.tbl = qt.scales = qt.bias = None
        idx._quant_sweep = None
        idx._quant_sweep_version = -1
    freed = idx.vectors.nbytes + idx.norms.nbytes
    idx.vectors = np.zeros((0, D), dtype=idx.dtype)
    idx.norms = np.zeros(0, dtype=np.float64)
    del out, out2, got, qs
    import gc

    import cozo_tpu.ops.graph_algos as GA

    gc.collect()
    emit("free_serving_table", 0.0, freed_host_mb=freed // (1 << 20))

    # proximity graph -> device PageRank via the constant-pin staging
    pr_script = (
        "?[n, s] <~ PageRank(*item:ix{layer: 0, fr_id, to_id})\n:limit 10"
    )
    t0 = time.time()
    db.run_script(pr_script)
    emit("proximity_pagerank_cold", time.time() - t0)
    t0 = time.time()
    db.run_script(pr_script)
    emit("proximity_pagerank_warm", time.time() - t0)

    # community detection on the proximity graph — EXACT at every scale
    # (r5): the bucketed-lane hybrid LP kernel packs each node into a
    # pow2-width dense lane (device memory ~ 2x|E|, not n x max_degree)
    # and only mega-hubs past COZO_TPU_LP_TIER_MAX take the exact host
    # mode.  Drop PageRank's staged device image first; LP stages its
    # own lanes and the two never coexist.
    if over_deadline("community_labelprop"):
        return
    GA._GRAPH_DEV_CACHE.clear()
    gc.collect()
    os.environ.setdefault("COZO_TPU_LP_DENSE_MAX", str(9 << 30))
    lp_script = (
        "?[l, n] <~ LabelPropagation(*item:ix{layer: 0, fr_id, to_id}, "
        "undirected: true)\n:limit 10"
    )
    t0 = time.time()
    db.run_script(lp_script)
    emit("community_labelprop_cold", time.time() - t0, exact=True)
    t0 = time.time()
    db.run_script(lp_script)
    emit("community_labelprop_warm", time.time() - t0, exact=True)
    emit("done", 0.0)


if __name__ == "__main__":
    main()
