"""BASELINE config #4: MinHash-LSH near-duplicate search over 1M short
docs (banded Jaccard), end-to-end through the Db (::lsh create backfill +
~rel:idx search atoms). Records numbers for BENCH_NOTES.md."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from cozo_tpu import Db

N = 1_000_000
rng = np.random.default_rng(5)
VOCAB = 50_000

def make_doc(r):
    n_words = 8 + int(r.integers(0, 10))
    return " ".join(f"w{int(w)}" for w in r.integers(0, VOCAB, n_words))

t0 = time.time()
docs = []
base_rngs = rng.spawn(16)
for br in base_rngs:
    for _ in range(N // 16):
        docs.append(make_doc(br))
# plant near-duplicates: docs[i] for i in 0..999 get a dup at N-1000+i
for i in range(1000):
    words = docs[i].split()
    words[0] = "wDUP"
    docs[N - 1000 + i] = " ".join(words)
print(f"docgen {time.time()-t0:.0f}s", flush=True)

db = Db("mem")
db.run_script(":create doc {id: Int => body: String}")
t0 = time.time()
CH = 50_000
for s in range(0, N, CH):
    rows = [[i, docs[i]] for i in range(s, min(s + CH, N))]
    db.run_script("?[id, body] <- $rows :put doc {id => body}", params={"rows": rows})
print(f"ingest {N} docs: {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
db.run_script(
    "::lsh create doc:sim {extractor: body, tokenizer: Simple, n_perm: 128, "
    "target_threshold: 0.7}"
)
build_s = time.time() - t0
print(f"lsh index build: {build_s:.0f}s ({N/build_s:,.0f} docs/s)", flush=True)

# query: the 1000 originals must find their planted dups.
# one warm-up query builds the serving image (1M-row inverse scan);
# its cost is recorded separately, not amortized into QPS
t0 = time.time()
db.run_script("?[id] := ~doc:sim{id | query: $q, k: 5}",
              params={"q": docs[0]})
serving_build_s = time.time() - t0
print(f"serving image build: {serving_build_s:.1f}s", flush=True)

t0 = time.time()
hits = 0
B = 200
for i in range(B):
    res = db.run_script(
        "?[id] := ~doc:sim{id | query: $q, k: 5}", params={"q": docs[i]}
    )
    ids = {r[0] for r in res.rows}
    if (N - 1000 + i) in ids:
        hits += 1
el = time.time() - t0
print(f"queries: {B/el:,.0f} QPS, planted-dup recall {hits/B:.3f}", flush=True)

# batched set-at-a-time: the search atom joined against a stored query
# relation probes every env in ONE serving-image pass (SURVEY §7.3 seam)
BQ = 1000
db.run_script(":create q {qid: Int => body: String}")
db.run_script(
    "?[qid, body] <- $rows :put q {qid => body}",
    params={"rows": [[i, docs[i]] for i in range(BQ)]},
)
join = "?[qid, id] := *q{qid, body}, ~doc:sim{id | query: body, k: 5}"
db.run_script(join)  # warm
t0 = time.time()
res = db.run_script(join)
el_b = time.time() - t0
got_pairs = {(r[0], r[1]) for r in res.rows}
bhits = sum((i, N - 1000 + i) in got_pairs for i in range(BQ))
print(f"batched join: {BQ/el_b:,.0f} QPS ({len(res.rows)} rows), "
      f"planted-dup recall {bhits/BQ:.3f}", flush=True)

import json

out = {
    "n_docs": N, "n_perm": 128, "target_threshold": 0.7,
    "build_s": round(build_s, 1), "build_docs_s": round(N / build_s, 1),
    "serving_image_build_s": round(serving_build_s, 1),
    "query_qps": round(B / el, 1), "planted_dup_recall": hits / B,
    "batched_join_qps": round(BQ / el_b, 1),
    "batched_join_recall": bhits / BQ,
    "host": "single-core container CPU",
}
print(json.dumps(out), flush=True)
if len(sys.argv) > 1:
    with open(sys.argv[1], "w") as f:
        json.dump(out, f, indent=1)
