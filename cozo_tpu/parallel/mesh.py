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
