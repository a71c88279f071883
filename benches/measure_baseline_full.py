"""Measure the single-thread C++ HNSW CPU baseline at the FULL judged
scale (1,183,514 x 100-d cosine, same clustered synthetic data as
bench.py) — VERDICT r2 next-round #4: the 63x headline divided a 1.18M
TPU number by a 200K CPU number; this grounds the comparison at the
actual judged config.

Writes BASELINE_MEASURED_1M.json:
  {n, dim, m, ef_construction, metric, build_s, host, points: [
      {ef, qps, recall@10}, ...]}

Run (background, ~1-2h single-core build):
  cd /root/repo && nohup python benches/measure_baseline_full.py \
      > /tmp/baseline_1m.log 2>&1 &

Reference-algorithm semantics anchor: /root/reference/cozo-core/src/
runtime/hnsw.rs:679,869 (same M / ef_construction / neighbor-selection
heuristic, fully in-memory — strictly faster than the reference's
KV-backed engine, so the ratio stays conservative).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, NQ, K = 1_183_514, 100, 2048, 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BASELINE_MEASURED_1M.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from cozo_tpu.ops.cpu_baseline import CpuHnswBaseline
    from cozo_tpu.utils.datasets import glove_like

    t0 = time.time()
    data = glove_like(N + 4096, D, seed=42)
    qs = data[N:N + NQ]
    data = data[:N]
    log(f"datagen {time.time()-t0:.0f}s")

    # exact cosine ground truth over the full table (chunked matmul; this
    # is ground truth, not the timed baseline, so BLAS threading is fine)
    t0 = time.time()
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    gt = np.empty((NQ, K), dtype=np.int64)
    best = np.full((NQ, K), -np.inf, dtype=np.float32)
    bestid = np.zeros((NQ, K), dtype=np.int64)
    CH = 100_000
    for s in range(0, N, CH):
        ch = data[s:s + CH]
        chn = ch / np.linalg.norm(ch, axis=1, keepdims=True)
        sims = qn @ chn.T  # [NQ, ch]
        # merge with running top-k
        cat = np.concatenate([best, sims], axis=1)
        catid = np.concatenate(
            [bestid, np.broadcast_to(np.arange(s, s + ch.shape[0]), (NQ, ch.shape[0]))],
            axis=1)
        idx = np.argpartition(-cat, K - 1, axis=1)[:, :K]
        best = np.take_along_axis(cat, idx, axis=1)
        bestid = np.take_along_axis(catid, idx, axis=1)
    order = np.argsort(-best, axis=1)
    gt = np.take_along_axis(bestid, order, axis=1)
    log(f"ground truth {time.time()-t0:.0f}s")

    b = CpuHnswBaseline(D, m=16, ef_construction=200, metric="cosine")
    t0 = time.time()
    for i in range(0, N, 10_000):
        b.add(data[i:i + 10_000])
        if (i // 10_000) % 10 == 0:
            el = time.time() - t0
            done = min(i + 10_000, N)
            log(f"build {done}/{N} ({el:.0f}s, ~{el/done*N:.0f}s total)")
    build_s = time.time() - t0
    log(f"build done: {build_s:.0f}s")

    out = {
        "n": N, "dim": D, "m": 16, "ef_construction": 200,
        "metric": "cosine", "build_s": build_s,
        "host": "bench container CPU, single thread", "points": [],
    }
    for ef in (32, 64, 128, 256, 512, 1024):
        t0 = time.time()
        ids, _ = b.search(qs, K, ef)
        el = time.time() - t0
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
            for i in range(NQ)
        ]))
        pt = {"ef": ef, "qps": round(NQ / el, 1), "recall@10": round(rec, 4)}
        out["points"].append(pt)
        log(f"ef={ef}: {pt}")
        json.dump(out, open(OUT, "w"), indent=1)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
