"""Multi-chip sharding for the compute core.

The reference's only parallelism is intra-process rayon (SURVEY.md §5.8);
the TPU-native equivalent shards the *data structures* over a
`jax.sharding.Mesh` and lets XLA insert collectives over ICI:

- vector tables shard along the row axis ("data"); brute-force and
  re-ranking distance computations run locally per shard and combine via
  an all-gathered global top-k;
- edge lists shard along the edge axis; PageRank's gather/segment-sum
  spMV computes partial per-node contributions locally and `psum`s them.

These are the building blocks queries use when an index exceeds one
chip's HBM (BASELINE north star: sharded vector tables across chips)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def _jx():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _shard_map(fn, mesh, in_specs, out_specs):
    from jax.experimental.shard_map import shard_map

    # the replication checker cannot infer all-gathered outputs; disable it
    # (kwarg name varies across jax versions)
    for kw in ("check_vma", "check_rep"):
        try:
            return shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{kw: False}
            )
        except TypeError:
            continue
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    jax, _ = _jx()
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    from jax.sharding import Mesh

    return Mesh(np.array(devs), (axis,))


def sharded_knn(mesh, vectors: "jax.Array", queries, k: int, distance: str = "L2"):
    """Exact k-NN over a row-sharded vector table.

    vectors [N, d] sharded along rows; queries [B, d] replicated.
    Per-shard local top-k (MXU matmul + lax.top_k), then all-gather the
    k·n_shards candidates and reduce to the global top-k."""
    jax, jnp = _jx()
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_shards = mesh.devices.size
    shard_rows = vectors.shape[0] // n_shards

    def local(vecs, qs):
        dots = jnp.dot(qs, vecs.T, preferred_element_type=jnp.float32)
        if distance == "L2":
            qn = jnp.sum(qs * qs, axis=1, keepdims=True)
            vn = jnp.sum(vecs * vecs, axis=1)[None, :]
            d = qn + vn - 2.0 * dots
        elif distance == "IP":
            d = 1.0 - dots
        else:
            qn = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
            vn = jnp.sqrt(jnp.sum(vecs * vecs, axis=1))[None, :]
            denom = jnp.where(qn * vn > 0, qn * vn, 1.0)
            d = 1.0 - dots / denom
        neg, idx = jax.lax.top_k(-d, k)
        # local row ids → global ids
        my = jax.lax.axis_index(axis)
        gidx = idx + my * shard_rows
        # gather every shard's candidates on every device
        all_d = jax.lax.all_gather(-neg, axis)  # [S, B, k]
        all_i = jax.lax.all_gather(gidx, axis)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(qs.shape[0], -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(qs.shape[0], -1)
        neg2, pos = jax.lax.top_k(-all_d, k)
        out_i = jnp.take_along_axis(all_i, pos, axis=1)
        return out_i, -neg2

    fn = _shard_map(
        local,
        mesh,
        (P(axis, None), P(None, None)),
        (P(None, None), P(None, None)),
    )
    return jax.jit(fn)(vectors, queries)


_SERVING_MESH = None
_SERVING_MESH_CHECKED = False


def serving_mesh():
    """Process-wide serving mesh, or None.

    Opt-in via COZO_TPU_MESH: "1"/"all" shards over every visible jax
    device; an integer uses that many.  When active, HnswIndex.search
    serves `~rel:idx` queries through ShardedSweep (row-sharded table,
    all-gather top-k merge) instead of the single-device path —
    SURVEY §5.7/5.8's >HBM scale-out."""
    global _SERVING_MESH, _SERVING_MESH_CHECKED
    if _SERVING_MESH_CHECKED:
        return _SERVING_MESH
    _SERVING_MESH_CHECKED = True
    import os

    spec = os.environ.get("COZO_TPU_MESH", "")
    if not spec:
        return None
    jax, _ = _jx()
    n_avail = len(jax.devices())
    n = n_avail if spec in ("1", "all") else min(int(spec), n_avail)
    if n < 2:
        return None
    _SERVING_MESH = make_mesh(n)
    return _SERVING_MESH


class ShardedSweep:
    """The serving-path vector index sharded over a device mesh.

    Takes an `HnswIndex` (or just its vectors), converts rows to the
    sweep score-form (`ops/exact_knn.SweepTable._prep_rows`), and
    row-shards the chunked table over the mesh.  Search = per-shard
    chunk scan + local top-k, all-gather of k·n_shards candidates, global
    top-k — the >HBM scaling path of SURVEY §5.7/5.8 (queries replicate,
    the table shards, collectives ride ICI)."""

    def __init__(self, mesh, index, chunk: int = 1 << 14) -> None:
        jax, jnp = _jx()
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..ops.exact_knn import SweepTable

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.devices.size
        self.distance = index.distance
        self.dim = index.dim
        self.n = index.n
        n_chunks = max(1, -(-index.n // chunk))
        n_chunks = -(-n_chunks // self.n_shards) * self.n_shards
        total = n_chunks * chunk
        slots = np.arange(total, dtype=np.int64)
        rows, bias = SweepTable._prep_rows(
            index, np.minimum(slots, index.vectors.shape[0] - 1)
        )
        bias[slots >= index.n] = -np.inf
        rows[slots >= index.n] = 0.0
        self.chunk = chunk
        self.n_chunks = n_chunks
        self.d_pad = rows.shape[1]
        self.tbl = jax.device_put(
            rows.reshape(n_chunks, chunk, self.d_pad),
            NamedSharding(mesh, P(self.axis, None, None)),
        )
        self.bias = jax.device_put(
            bias.reshape(n_chunks, chunk),
            NamedSharding(mesh, P(self.axis, None)),
        )
        self._fns = {}

    def _fn(self, k: int):
        jax, jnp = _jx()
        from jax.sharding import PartitionSpec as P

        fn = self._fns.get(k)
        if fn is not None:
            return fn
        axis = self.axis
        chunk = self.chunk
        local_chunks = self.n_chunks // self.n_shards

        def local(tbl_l, bias_l, qs):
            B = qs.shape[0]
            my = jax.lax.axis_index(axis)

            def body(carry, xs):
                best_s, best_i, ci = carry
                chunk_v, chunk_b = xs
                s = jax.lax.dot_general(
                    qs.astype(jnp.bfloat16), chunk_v.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + chunk_b[None, :]
                nd, ni = jax.lax.top_k(s, k)
                ni = ni + (my * local_chunks + ci) * chunk
                md = jnp.concatenate([best_s, nd], axis=1)
                mi = jnp.concatenate([best_i, ni], axis=1)
                td, ti = jax.lax.top_k(md, k)
                return (td, jnp.take_along_axis(mi, ti, axis=1), ci + 1), None

            init = (
                jnp.full((B, k), -jnp.inf, jnp.float32),
                jnp.full((B, k), -1, jnp.int32),
                jnp.int32(0),
            )
            (ls, li, _), _ = jax.lax.scan(body, init, (tbl_l, bias_l))
            all_s = jax.lax.all_gather(ls, axis)  # [S, B, k]
            all_i = jax.lax.all_gather(li, axis)
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(B, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, -1)
            gd, gp = jax.lax.top_k(all_s, k)
            return jnp.take_along_axis(all_i, gp, axis=1), gd

        fn = jax.jit(
            _shard_map(
                local,
                self.mesh,
                (P(axis, None, None), P(axis, None), P(None, None)),
                (P(None, None), P(None, None)),
            )
        )
        self._fns[k] = fn
        return fn

    def search(self, qs: np.ndarray, k: int):
        jax, jnp = _jx()
        q = np.asarray(qs, dtype=np.float32)
        B, d = q.shape
        qp = np.zeros((B, self.d_pad), dtype=np.float32)
        if self.distance == "Cosine":
            nrm = np.linalg.norm(q, axis=1, keepdims=True)
            qp[:, :d] = q / np.where(nrm > 0, nrm, 1.0)
        else:
            qp[:, :d] = q
        ids, scores = self._fn(k)(self.tbl, self.bias, jnp.asarray(qp))
        ids = np.asarray(ids, dtype=np.int64)
        scores = np.asarray(scores, dtype=np.float64)
        if self.distance == "L2":
            qn = np.einsum("bd,bd->b", q.astype(np.float64), q.astype(np.float64))
            dists = np.maximum(qn[:, None] - scores, 0.0)
        else:
            dists = 1.0 - scores
        bad = ~np.isfinite(scores) | (ids < 0) | (ids >= self.n)
        return np.where(bad, -1, ids), np.where(bad, np.inf, dists)


def sharded_pagerank_step(mesh, src, dst, contrib_denom, n_nodes: int):
    """One PageRank spMV step over an edge-sharded graph.

    src/dst [E] sharded along the edge axis; returns a function
    ranks → new partial-summed incoming mass (psum over shards)."""
    jax, jnp = _jx()
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(src_l, dst_l, ranks):
        contrib = ranks / contrib_denom
        partial_in = jax.ops.segment_sum(
            contrib[src_l], dst_l, num_segments=n_nodes
        )
        return jax.lax.psum(partial_in, axis)

    return _shard_map(local, mesh, (P(axis), P(axis), P(None)), P(None))


def sharded_sssp_step(mesh, n_nodes: int):
    """One Bellman-Ford relaxation over an edge-sharded weighted graph.

    Edges (src, dst, w) shard along the edge axis; distances replicate.
    Each shard relaxes its local edges (`segment_min` of dist[src]+w per
    destination) and the shards combine with a `pmin` collective — the
    min-plus analog of `sharded_pagerank_step`'s psum.  Iterating the
    returned step to a fixed point is SSSP sharded over ICI."""
    jax, jnp = _jx()
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(src_l, dst_l, w_l, dist):
        cand = dist[src_l] + w_l
        relaxed = jax.ops.segment_min(cand, dst_l, num_segments=n_nodes)
        combined = jax.lax.pmin(relaxed, axis)
        return jnp.minimum(dist, combined)

    return _shard_map(
        local, mesh, (P(axis), P(axis), P(axis), P(None)), P(None)
    )


def shard_array(mesh, arr, axis_name: str = "data", dim: int = 0):
    """Place a host array row-sharded over the mesh."""
    jax, jnp = _jx()
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * arr.ndim
    spec[dim] = axis_name
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate_array(mesh, arr):
    jax, jnp = _jx()
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P(*([None] * arr.ndim))))
