"""Multi-chip sharding validation: runs the graft dryrun on a virtual
8-device CPU mesh in a subprocess (the axon TPU plugin registers at
interpreter start, so the CPU override must be in the child's env)."""

import os
import subprocess
import sys

import pytest


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def test_dryrun_multichip_8():
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "DRYRUN_OK" in out.stdout, out.stderr[-2000:]


def test_entry_compiles():
    code = (
        "import __graft_entry__ as g; fn, args = g.entry(); out = fn(*args); "
        "assert out[0].shape == (16, 8); print('ENTRY_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "ENTRY_OK" in out.stdout, out.stderr[-2000:]


def test_sharded_sweep_parity_8dev():
    """Row-sharded sweep over an 8-device CPU mesh must reproduce the
    single-device exact results (VERDICT r1 #7)."""
    code = """
import numpy as np
from cozo_tpu.models.hnsw_index import HnswIndex
from cozo_tpu.parallel.mesh import make_mesh, ShardedSweep
rng = np.random.default_rng(0)
n, d, B, k = 4096, 32, 64, 10
data = rng.standard_normal((n, d)).astype(np.float32)
idx = HnswIndex(dim=d, m=8, ef_construction=50, distance="Cosine")
for v in data:
    idx.insert(v)
mesh = make_mesh(8)
ss = ShardedSweep(mesh, idx, chunk=128)
qs = rng.standard_normal((B, d)).astype(np.float32)
ids, dists = ss.search(qs, k)
gt_ids, gt_d = idx._bf_candidates_np(qs, k)
agree = np.mean([len(set(ids[b].tolist()) & set(gt_ids[b].tolist()))/k for b in range(B)])
assert agree > 0.97, agree
np.testing.assert_allclose(np.sort(dists,1), np.sort(gt_d,1), rtol=5e-2, atol=5e-3)
print('SHARDED_PARITY_OK', agree)
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "SHARDED_PARITY_OK" in out.stdout, out.stderr[-2000:]


def test_query_through_mesh_path_8dev():
    """A full CozoScript `~rel:idx` HNSW query served by the mesh-sharded
    sweep (COZO_TPU_MESH) must return the same rows as the single-device
    path (VERDICT r1 #7: 'dryrun exercises a sharded HNSW search AND a
    query runs through the mesh path')."""
    code = """
import numpy as np
from cozo_tpu import Db
from cozo_tpu.parallel.mesh import serving_mesh
assert serving_mesh() is not None, "mesh did not activate"
rng = np.random.default_rng(3)
db = Db("mem")
db.run_script(":create item {id: Int => emb: <F32; 16>}")
data = rng.standard_normal((512, 16)).astype(np.float32)
rows = [[i, list(map(float, data[i]))] for i in range(512)]
db.run_script("?[id, emb] <- $rows :put item {id => emb}", params={"rows": rows})
db.run_script("::hnsw create item:v {dim: 16, m: 8, dtype: F32, fields: [emb], "
              "distance: L2, ef_construction: 32}")
q = list(map(float, data[7] + 1e-4))
got = db.run_script(
    "?[id, dist] := ~item:v{id | query: vec($q), k: 5, ef: 32, bind_distance: dist}",
    params={"q": q})
ids = [r[0] for r in got.rows]
assert 7 in ids, got.rows
# parity: mesh top-5 == exact numpy top-5 (the sharded sweep is exact)
dif = data - np.asarray(q, np.float32)
gt = np.argsort(np.einsum("nd,nd->n", dif, dif))[:5]
assert set(ids) == set(int(x) for x in gt), (ids, gt)
# the index actually served through the mesh (sharded table was built)
built = [c for c in db.algo_cache.values()
         if getattr(getattr(c, "index", None), "_mesh_sweep", None) is not None]
assert built, "query did not go through the mesh-sharded sweep"
print('MESH_QUERY_OK')
"""
    env = _cpu_env()
    env["COZO_TPU_MESH"] = "all"
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "MESH_QUERY_OK" in out.stdout, out.stderr[-2000:]
