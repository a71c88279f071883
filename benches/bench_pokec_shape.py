"""Pokec-large-shaped benchmark (reference README.md:141-151 regime):
1.63M vertices / 30.6M edges — OLTP point ops, 2-hop traversal,
full-scan aggregate, end-to-end PageRank through the fixed-rule path."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from cozo_tpu import Db

NV, NE = 1_632_803, 30_622_564
rng = np.random.default_rng(8)

t0 = time.time()
src = (rng.pareto(1.3, NE) * 40).astype(np.int64) % NV
dst = rng.integers(0, NV, NE).astype(np.int64)
keep = src != dst
src, dst = src[keep], dst[keep]
order = np.lexsort((dst, src))
src, dst = src[order], dst[order]
dup = np.zeros(len(src), bool)
dup[1:] = (src[1:] == src[:-1]) & (dst[1:] == dst[:-1])
src, dst = src[~dup], dst[~dup]
NE = len(src)
print(f"graphgen {NV}V/{NE}E {time.time()-t0:.0f}s", flush=True)

db = Db("mem")
db.run_script(":create e {f: Int, t: Int}")
db.run_script(":create person {id: Int => name: String}")

# stage edges via the bulk KV loader (data staging; queries below go
# through the full engine)
from cozo_tpu.runtime.relation import Catalog
tx = db.storage.transact(write=False)
h = Catalog.get(tx, "e"); tx.abort()
t0 = time.time()
from cozo_tpu.data.memcmp import encode_value
def enc_pairs(srcs, dsts, rel_id):
    import struct
    pre = struct.pack(">Q", rel_id)
    out = []
    for a, b in zip(srcs.tolist(), dsts.tolist()):
        buf = bytearray(pre)
        encode_value(buf, a)
        encode_value(buf, b)
        out.append((bytes(buf), b""))
    return out
CH = 2_000_000
for s in range(0, NE, CH):
    db.storage.batch_put(enc_pairs(src[s:s+CH], dst[s:s+CH], h.id))
print(f"edge staging: {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
for s in range(0, NV, 200_000):
    rows = [[i, f"p{i}"] for i in range(s, min(s+200_000, NV))]
    db.run_script("?[id, name] <- $r :put person {id => name}", params={"r": rows})
print(f"person ingest: {time.time()-t0:.0f}s", flush=True)

# --- OLTP point reads on person
N = 20000
t0 = time.time()
for i in range(N):
    db.run_script("?[n] := *person{id: $i, name: n}", params={"i": int(i)})
print(f"point reads: {N/(time.time()-t0):,.0f} QPS", flush=True)

# point writes at scale
t0 = time.time()
for i in range(N):
    db.run_script("?[id, name] <- [[$i, $n]] :put person {id => name}",
                  params={"i": int(i), "n": f"q{i}"})
print(f"point writes: {N/(time.time()-t0):,.0f} QPS", flush=True)

# --- 1-hop and 2-hop traversals (reference: 2-hop <1ms)
hot = [int(x) for x in rng.integers(0, NV, 200)]  # typical nodes (avg degree ~17)
db.run_script("?[t] := *e{f: $x, t}", params={"x": 0})  # warm plan
t0 = time.time()
cnt = 0
for x in hot:
    cnt += len(db.run_script("?[t] := *e{f: $x, t}", params={"x": x}).rows)
el = (time.time()-t0)/len(hot)
print(f"1-hop: {el*1000:.2f} ms/query (avg fanout {cnt/len(hot):.0f})", flush=True)
t0 = time.time()
cnt = 0
Q2 = 50
for x in hot[:Q2]:
    cnt += len(db.run_script(
        "?[y] := *e{f: $x, t: m}, *e{f: m, t: y}", params={"x": x}).rows)
el = (time.time()-t0)/Q2
print(f"2-hop: {el*1000:.1f} ms/query (avg result {cnt/Q2:.0f}) [ref <1ms]", flush=True)

# --- full-scan aggregate over 1.63M rows (reference OLAP scan ~1s)
t0 = time.time()
r = db.run_script("?[count(id)] := *person{id}")
print(f"full scan count 1.63M rows: {time.time()-t0:.1f}s [ref ~1s]", flush=True)

# --- end-to-end PageRank through the fixed rule (reference ~30s total)
t0 = time.time()
r = db.run_script("?[x, r] <~ PageRank(*e[])")
print(f"PageRank end-to-end (host CSR + device): {time.time()-t0:.0f}s, rows {len(r.rows)} [ref ~30s]", flush=True)
t0 = time.time()
r = db.run_script("?[x, r] <~ PageRank(*e[])")
print(f"PageRank warm (device graph cache): {time.time()-t0:.0f}s", flush=True)
