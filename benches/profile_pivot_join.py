"""Profile the engine-path vector-pivot join (VERDICT r3 weak #1 /
next #3): where do 8s of host time go for 4096 queries at 1M?

Runs at reduced scale (default 100K x 64, CPU backend OK) under
cProfile; the per-candidate host cost is scale-independent so the
hotspots are representative.

Usage: [JAX_PLATFORMS=cpu ...] python benches/profile_pivot_join.py [n] [dim]
"""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
NQ = 4096
K = 10


def main():
    from cozo_tpu.runtime.db import Db

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n + NQ, D)).astype(np.float32)
    qs = data[n:]

    db = Db("mem")
    db.run_script(f":create item {{id: Int => v: <F32; {D}>}}")
    t0 = time.time()
    B = 50_000
    for s in range(0, n, B):
        rows = [[int(s + i), data[s + i]] for i in range(min(B, n - s))]
        db.run_script("?[id, v] <- $rows :put item {id => v}", {"rows": rows})
    print(f"# ingest {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    db.run_script(
        f"::hnsw create item:ix {{dim: {D}, m: 16, dtype: F32, fields: [v], "
        "distance: Cosine, ef_construction: 200}"
    )
    print(f"# ddl build {time.time()-t0:.1f}s", file=sys.stderr)

    db.run_script(f":create q {{qid: Int => qv: <F32; {D}>}}")
    db.run_script(
        "?[qid, qv] <- $rows :put q {qid => qv}",
        {"rows": [[int(i), qs[i]] for i in range(NQ)]},
    )

    join = (
        "?[qid, id, d] := *q{qid, qv}, "
        "~item:ix{id | query: qv, k: 10, ef: 64, bind_distance: d}"
    )
    out = db.run_script(join)  # warm
    t0 = time.time()
    out = db.run_script(join)
    el = time.time() - t0
    print(f"# warm join: {el:.2f}s = {NQ/el:,.0f} QPS rows={len(out.rows)}",
          file=sys.stderr)

    prof = cProfile.Profile()
    prof.enable()
    out = db.run_script(join)
    prof.disable()
    stats = pstats.Stats(prof, stream=sys.stderr)
    stats.sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
