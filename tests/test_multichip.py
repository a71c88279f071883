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


def test_dryrun_hostile_env():
    """VERDICT r2 #1 'done' criterion: dryrun_multichip must pass even when
    called from a process whose env LIES — JAX_PLATFORMS=cpu + the right
    XLA_FLAGS were set *after* jax was already initialized on a different
    device topology (here: a 1-device CPU backend standing in for axon).
    The old fast path ran in-process and blew up; the unconditional
    re-exec must succeed."""
    code = """
import os
# initialize jax FIRST on a single-device cpu backend (flag absent)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
assert len(jax.devices()) == 1, jax.devices()
# now make the env *look* like an 8-device CPU mesh host (it is not)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import __graft_entry__ as g
g.dryrun_multichip(8)
print('HOSTILE_OK')
"""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env.pop("_COZO_MULTICHIP_CHILD", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "HOSTILE_OK" in out.stdout, out.stderr[-2000:]


def test_dryrun_child_asserts_backend():
    """The child sentinel path must refuse to run on a wrong-topology host
    with a diagnostic naming platform + devices (so a red artifact is at
    least attributable)."""
    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
os.environ["_COZO_MULTICHIP_CHILD"] = "1"
import __graft_entry__ as g
try:
    g.dryrun_multichip(8)
except RuntimeError as e:
    msg = str(e)
    assert "default_backend" in msg and "cpu" in msg, msg
    print('CHILD_GUARD_OK')
else:
    raise SystemExit("child guard did not fire")
"""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env.pop("_COZO_MULTICHIP_CHILD", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "CHILD_GUARD_OK" in out.stdout, out.stderr[-2000:]


def test_sharded_sssp_matches_dijkstra_8dev():
    """Edge-sharded Bellman-Ford relaxations (pmin combine) iterated to a
    fixed point must equal host Dijkstra exactly."""
    code = """
import numpy as np, heapq, jax
from cozo_tpu.parallel.mesh import (make_mesh, sharded_sssp_step,
                                    shard_array, replicate_array)
mesh = make_mesh(8)
rng = np.random.default_rng(3)
n, e = 4000, 64000
src = rng.integers(0, n, e).astype(np.int32)
dst = rng.integers(0, n, e).astype(np.int32)
w = rng.uniform(0.5, 3.0, e).astype(np.float32)
step = sharded_sssp_step(mesh, n)
# iterate INSIDE one jit: on a 1-core host, dozens of sequential
# executions of an 8-thread collective can starve the 40s CPU
# rendezvous window (xla rendezvous.cc fatal); one executable with a
# fori_loop keeps the device threads hot. 16 relaxations >> graph
# diameter (avg degree 16).
@jax.jit
def solve(s, d, w2, dist):
    return jax.lax.fori_loop(
        0, 16, lambda _, dd: step(s, d, w2, dd), dist)
dist = np.full(n, np.inf, np.float32); dist[0] = 0
dist_d = replicate_array(mesh, dist)
s_d, d_d, w_d = (shard_array(mesh, a) for a in (src, dst, w))
got = np.asarray(solve(s_d, d_d, w_d, dist_d))
adj = [[] for _ in range(n)]
for a, b, ww in zip(src, dst, w):
    adj[a].append((int(b), float(ww)))
ref = np.full(n, np.inf); ref[0] = 0
pq = [(0.0, 0)]
while pq:
    du, u = heapq.heappop(pq)
    if du > ref[u]: continue
    for v2, ww in adj[u]:
        if du + ww < ref[v2]:
            ref[v2] = du + ww; heapq.heappush(pq, (du + ww, v2))
assert np.allclose(got, ref, atol=1e-4, equal_nan=True)
print('SHARDED_SSSP_OK')
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "SHARDED_SSSP_OK" in out.stdout, out.stderr[-2000:]


def test_sharded_scale_1m_vectors_and_4m_edges():
    """VERDICT r2 #8: multi-chip correctness past toy shapes — a 1M x 64-d
    table row-sharded over 8 CPU devices with exact top-k parity vs a
    single-device numpy sweep, and a 4M-edge sharded PageRank psum epoch
    vs host numpy."""
    code = """
import numpy as np, types, jax, jax.numpy as jnp
from cozo_tpu.parallel.mesh import (make_mesh, ShardedSweep, shard_array,
                                    replicate_array, sharded_pagerank_step)
mesh = make_mesh(8)
rng = np.random.default_rng(7)
n, d, B, k = 1_000_000, 64, 16, 10
data = rng.standard_normal((n, d)).astype(np.float32)
idx = types.SimpleNamespace(
    dim=d, n=n, vectors=data, alive=np.ones(n, bool),
    norms=np.einsum('nd,nd->n', data, data), distance='L2')
ss = ShardedSweep(mesh, idx, chunk=1 << 14)
qs = data[rng.integers(0, n, B)] + 1e-3
ids, dists = ss.search(qs, k)
d2 = ((data[None, :, :1] * 0)).sum()  # noop keep mem low
score = (-2 * (qs @ data.T) + np.einsum('nd,nd->n', data, data)[None])
gt = np.argsort(score, axis=1)[:, :k]
match = np.mean([len(set(ids[b].tolist()) & set(gt[b].tolist())) / k for b in range(B)])
assert match >= 0.95, match  # f32 near-ties at 1M rows cost a few ids
# distance-level parity is tight: the kth-NN distances must agree
gt_d = np.sort(np.take_along_axis(score, gt, 1), 1)
gt_d = gt_d + np.einsum('bd,bd->b', qs, qs)[:, None]  # + |q|^2 -> true L2^2
np.testing.assert_allclose(np.sort(dists, 1), gt_d, rtol=5e-3, atol=0.25)
print('SCALE_SWEEP_OK', match)

# 4M-edge sharded PageRank epoch vs host numpy
n_nodes, e = 500_000, 4_000_000
src = rng.integers(0, n_nodes, e).astype(np.int32)
dst = rng.integers(0, n_nodes, e).astype(np.int32)
out_deg = np.maximum(np.bincount(src, minlength=n_nodes), 1).astype(np.float32)
step = sharded_pagerank_step(mesh, src, dst, jnp.asarray(out_deg), n_nodes)
ranks = np.full(n_nodes, 1.0 / n_nodes, np.float32)
got = np.asarray(step(shard_array(mesh, src), shard_array(mesh, dst),
                      replicate_array(mesh, ranks)))
contrib = ranks / out_deg
want = np.zeros(n_nodes, np.float64)
np.add.at(want, dst, contrib[src].astype(np.float64))
np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-3, atol=1e-9)
print('SCALE_PR_OK')
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "SCALE_SWEEP_OK" in out.stdout and "SCALE_PR_OK" in out.stdout, (
        out.stdout + out.stderr[-2000:]
    )
