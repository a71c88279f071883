"""Run the 68-test air-routes battery across the full engine matrix
(VERDICT r3 missing #6 / next #9; SURVEY §4's cross-engine prescription,
reference cozo-core/tests/air_routes.rs:28 COZO_TEST_DB_ENGINE).

Usage: python benches/run_air_routes_matrix.py [out.json]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINES = ["mem", "sqlite", "tkv", "plog", "remote"]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "AIRROUTES_MATRIX.json"
    results = {}
    for engine in ENGINES:
        env = dict(os.environ, COZO_TEST_DB_ENGINE=engine)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_air_routes.py",
             "-q", "--no-header"],
            cwd=HERE, env=env, capture_output=True, text=True,
            timeout=3600,
        )
        tail = (p.stdout.strip().splitlines() or [""])[-1]
        results[engine] = {
            "exit": p.returncode,
            "summary": tail,
            "seconds": round(time.time() - t0, 1),
        }
        print(f"[{engine}] {tail} ({results[engine]['seconds']}s)",
              flush=True)
    ok = all(r["exit"] == 0 for r in results.values())
    out = {"battery": "tests/test_air_routes.py (68 ported reference tests)",
           "all_green": ok, "engines": results}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
