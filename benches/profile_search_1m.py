"""Profile the raw HNSW beam-search kernel at 1M scale on the real chip.

Uses a synthetic random graph (same memory-access pattern as a real
index) to measure where time goes: per-iteration overhead vs gather
bandwidth, across beam/expand/batch."""

import time

import numpy as np

from cozo_tpu.utils.jax_setup import ensure_jax_config

ensure_jax_config()
import jax
import jax.numpy as jnp

from cozo_tpu.ops.vector_search import _compiled_search


def main():
    rng = np.random.default_rng(0)
    n_pad, d, m0, m_up, n_levels = 1 << 20, 100, 32, 16, 3
    print(f"devices: {jax.devices()}")
    vectors = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    nb0 = jnp.asarray(rng.integers(0, n_pad, (n_pad, m0)).astype(np.int32))
    up_nb = jnp.asarray(
        rng.integers(0, n_pad, (n_levels, n_pad, m_up)).astype(np.int32)
    )
    alive = jnp.ones(n_pad, bool)
    entry = jnp.int32(0)

    for B in (4096, 8192):
        qs = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
        for beam, expand in ((96, 8), (96, 16), (128, 16), (128, 32), (64, 16)):
            k = 10
            max_iters = (beam + expand - 1) // expand + 8
            fn = _compiled_search(
                n_pad, d, m0, beam, k, n_levels, m_up, 0, max_iters, expand
            )
            t0 = time.time()
            ids, dists = fn(vectors, nb0, up_nb, None, None, entry, alive, qs)
            ids = np.asarray(ids)
            compile_s = time.time() - t0
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                ids, dists = fn(vectors, nb0, up_nb, None, None, entry, alive, qs)
                ids = np.asarray(ids)
            el = (time.time() - t0) / reps
            print(
                f"B={B} beam={beam} expand={expand} iters<={max_iters}: "
                f"{el*1000:.1f} ms/batch -> {B/el:,.0f} QPS (first {compile_s:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
