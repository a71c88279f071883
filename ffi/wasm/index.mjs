/**
 * cozo_tpu WASM host — browser/Node embedding via Pyodide.
 *
 * Mirrors the reference's `cozo-lib-wasm` surface
 * (`/root/reference/cozo-lib-wasm/src/lib.rs:31-45`): a `CozoDb` with
 * `run`, `export_relations`, `import_relations`, mem engine only.
 *
 * Where the reference compiles its Rust core to wasm32, cozo_tpu's host
 * path is pure Python (verified jax-free by
 * `tests/test_no_jax_host_path.py` — datalog, FTS, LSH, HNSW host path
 * all run without the device stack), so the WASM story is the CPython
 * wasm runtime: Pyodide ships numpy + sortedcontainers, the only host
 * dependencies.  Build `cozo_tpu.zip` with `./build.sh`, serve it next
 * to this module.
 *
 * Usage:
 *   import { CozoDb } from "./index.mjs";
 *   const db = await CozoDb.new();
 *   const res = db.run("?[x] <- [[1],[2]]");   // JSON string, ok/rows
 */

const PYODIDE_URL = "https://cdn.jsdelivr.net/pyodide/v0.26.1/full/pyodide.mjs";

export class CozoDb {
  constructor(pyodide) {
    this._py = pyodide;
  }

  static async new(opts = {}) {
    const { loadPyodide } = await import(opts.pyodideUrl || PYODIDE_URL);
    const py = await loadPyodide();
    await py.loadPackage(["numpy", "sortedcontainers"]);
    const zipUrl = opts.packageUrl || new URL("./cozo_tpu.zip", import.meta.url);
    const buf = await (await fetch(zipUrl)).arrayBuffer();
    py.unpackArchive(buf, "zip", { extractDir: "/lib/cozo" });
    py.runPython(`
import sys, json
sys.path.insert(0, "/lib/cozo")
from cozo_tpu import Db
_db = Db("mem")

def _run(script, params_json, immutable):
    # run_script_json folds ok/took like the reference (lib.rs:244)
    return _db.run_script_json(script, params_json or "{}")

def _export(rels_json):
    try:
        data = _db.export_relations(json.loads(rels_json)["relations"])
        return json.dumps({"ok": True, "data": data}, default=str)
    except Exception as e:
        return json.dumps({"ok": False, "message": str(e)})

def _import(data_json):
    try:
        _db.import_relations(json.loads(data_json))
        return json.dumps({"ok": True})
    except Exception as e:
        return json.dumps({"ok": False, "message": str(e)})
`);
    return new CozoDb(py);
  }

  /** Run a CozoScript; returns a JSON string like the reference wasm API. */
  run(script, params = "", immutable = false) {
    return this._py.globals.get("_run")(script, params, immutable);
  }

  export_relations(data) {
    return this._py.globals.get("_export")(data);
  }

  import_relations(data) {
    return this._py.globals.get("_import")(data);
  }
}
