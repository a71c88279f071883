"""VERDICT r2 next #7: measure the unmeasured reference numbers.

1. Backup / restore throughput on a 1.6M-row relation
   (reference: ~1M rows/s backup, ~400K rows/s restore, README.md:144 —
   RocksDB engine -> SQLite backup file on a 2020 Mac Mini).
2. Pokec-shape OLTP point reads/writes on the PERSISTENT tkv engine
   (fsync mode 1) — the r2 headline OLTP numbers were mem-engine only;
   the reference's are disk-backed.

Run: python benches/bench_backup_oltp.py  (CPU-only, ~5 min)
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cozo_tpu import Db

N = 1_600_000


def log(m):
    print(m, flush=True)


def build_db(engine, path=None):
    db = Db(engine, path) if path else Db(engine)
    db.run_script(":create person {id: Int => name: String, age: Int}")
    t0 = time.time()
    for s in range(0, N, 100_000):
        rows = [[i, f"person-{i}", i % 97] for i in range(s, min(s + 100_000, N))]
        db.run_script("?[id, name, age] <- $r :put person {id => name, age}",
                      params={"r": rows})
    log(f"  ingest {N} rows ({engine}): {time.time()-t0:.0f}s "
        f"({N/(time.time()-t0):,.0f} rows/s)")
    return db


def main():
    tmp = tempfile.mkdtemp(prefix="cozo_bench_")
    results = {}
    try:
        for engine in ("mem", "tkv"):
            path = None if engine == "mem" else os.path.join(tmp, f"db.{engine}")
            log(f"[{engine}]")
            db = build_db(engine, path)

            bpath = os.path.join(tmp, f"backup_{engine}.db")
            t0 = time.time()
            db.backup_db(bpath)
            el = time.time() - t0
            results[f"backup_{engine}"] = N / el
            log(f"  backup -> sqlite: {el:.1f}s ({N/el:,.0f} rows/s) "
                f"[ref ~1M rows/s]")

            rpath = os.path.join(tmp, f"restored.{engine}")
            db2 = Db(engine, rpath) if engine != "mem" else Db("mem")
            t0 = time.time()
            db2.restore_backup(bpath)
            el = time.time() - t0
            results[f"restore_{engine}"] = N / el
            log(f"  restore: {el:.1f}s ({N/el:,.0f} rows/s) [ref ~400K rows/s]")
            got = db2.run_script("?[name] := *person{id: 999999, name}")
            assert got.rows == [["person-999999"]], got.rows

            if engine == "tkv":
                # OLTP on the persistent engine (reference: >250K read QPS,
                # ~100K mixed QPS on 6-8 cores; we are single-core Python)
                rng = np.random.default_rng(3)
                ids = [int(x) for x in rng.integers(0, N, 20_000)]
                t0 = time.time()
                for i in ids:
                    db.run_script("?[n] := *person{id: $i, name: n}",
                                  params={"i": i})
                el = time.time() - t0
                results["tkv_point_read_qps"] = len(ids) / el
                log(f"  tkv point reads: {len(ids)/el:,.0f} QPS")
                t0 = time.time()
                for i in ids[:10_000]:
                    db.run_script(
                        "?[id, name, age] <- [[$i, $n, 1]] "
                        ":put person {id => name, age}",
                        params={"i": i, "n": f"u{i}"})
                el = time.time() - t0
                results["tkv_point_write_qps"] = 10_000 / el
                log(f"  tkv point writes (fsync batched): {10_000/el:,.0f} QPS")
                mixed = ids[:15_000]
                t0 = time.time()
                for j, i in enumerate(mixed):
                    if j % 3 == 2:
                        db.run_script(
                            "?[id, name, age] <- [[$i, $n, 2]] "
                            ":put person {id => name, age}",
                            params={"i": i, "n": f"m{i}"})
                    else:
                        db.run_script("?[n] := *person{id: $i, name: n}",
                                      params={"i": i})
                el = time.time() - t0
                results["tkv_mixed_qps"] = len(mixed) / el
                log(f"  tkv mixed 2r/1w: {len(mixed)/el:,.0f} QPS "
                    f"[ref ~100K on 6-8 cores]")
            db.close() if hasattr(db, "close") else None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    import json
    out = {
        "n_rows": N,
        "host": "single-core container CPU (reference numbers are "
                "rayon-parallel on a 6-8 core 2020 Mac Mini)",
        "reference": {"backup_rows_s": 1_000_000, "restore_rows_s": 400_000,
                      "mixed_qps_6_8_cores": 100_000},
        **{k: round(v, 1) for k, v in results.items()},
    }
    log(json.dumps(out))
    dest = sys.argv[1] if len(sys.argv) > 1 else None
    if dest:
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
