"""The host-side engine must work with jax absent (the Pyodide/WASM
embedding target, `ffi/wasm/`, and lightweight-host deployments).

Runs a representative slice — relations, datalog recursion, aggregation,
host fixed rules, FTS, LSH, HNSW host path, imperative scripts — in a
subprocess where importing jax raises."""

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys, importlib.abc

class Block(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith(("jax.", "jaxlib")):
            raise ImportError(f"blocked import of {name}")

sys.meta_path.insert(0, Block())
sys.path.insert(0, "@@SITE@@")  # -S dropped site-packages; restore w/o sitecustomize
sys.path.insert(0, "@@ROOT@@")
assert "jax" not in sys.modules  # sitecustomize must not have run

from cozo_tpu import Db

db = Db("mem")
db.run_script(":create person {id: Int => name: String, age: Int}")
db.run_script(
    "?[id, name, age] <- [[1,'a',30],[2,'b',41],[3,'c',25]] "
    ":put person {id => name, age}"
)
assert db.run_script("?[sum(age)] := *person{age}").rows[0][0] == 96

# datalog recursion + aggregation
out = db.run_script('''
e[f,t] <- [[1,2],[2,3],[3,4]]
reach[x,y] := e[x,y]
reach[x,y] := reach[x,z], e[z,y]
?[x, count(y)] := reach[x, y]
''')
assert sorted(out.rows) == [[1, 3], [2, 2], [3, 1]]

# host fixed rule
out = db.run_script('''
edges[f,t] <- [[1,2],[2,3],[1,3]]
?[v, s] <~ PageRank(edges[])
''')
assert len(out.rows) == 3

# FTS
db.run_script(":create doc {id: Int => body: String}")
db.run_script(
    "?[id, body] <- [[1,'the quick brown fox'],[2,'lazy dogs sleep']] "
    ":put doc {id => body}"
)
db.run_script(
    "::fts create doc:ft {extractor: body, tokenizer: Simple, "
    "filters: [Lowercase]}"
)
out = db.run_script("?[id] := ~doc:ft{id | query: 'quick', k: 5}")
assert [r[0] for r in out.rows] == [1]

# LSH
db.run_script(
    "::lsh create doc:near {extractor: body, tokenizer: Simple, "
    "n_perm: 32, target_threshold: 0.5, n_gram: 3}"
)

# HNSW host path (no device kernels available without jax)
db.run_script(":create emb {id: Int => v: <F32; 4>}")
db.run_script(
    "?[id, v] <- [[0,[1.0,0.0,0.0,0.0]],[1,[0.0,1.0,0.0,0.0]]] "
    ":put emb {id => v}"
)
db.run_script(
    "::hnsw create emb:ix {dim: 4, m: 4, dtype: F32, fields: [v], "
    "distance: L2, ef_construction: 16}"
)
out = db.run_script(
    "?[id] := ~emb:ix{id | query: vec([1.0,0.0,0.0,0.0]), k: 1, ef: 8}"
)
assert [r[0] for r in out.rows] == [0]

# imperative script
out = db.run_script('''
{?[a] <- [[0]] :replace _c {a}}
%loop
    {?[a] := *_c[b], a = b + 1 :replace _c {a}}
    %if { ?[x] := *_c[x], x >= 3 }
        %then %break
    %end
%end
%return _c
''')
assert out.rows[0][0] == 3

assert "jax" not in sys.modules
print("NO_JAX_OK")
"""


def test_full_host_slice_without_jax():
    import sysconfig

    code = _SCRIPT.replace("@@ROOT@@", _ROOT).replace(
        "@@SITE@@", sysconfig.get_paths()["purelib"]
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-S", "-c", code],  # -S: no sitecustomize preload
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "NO_JAX_OK" in proc.stdout
