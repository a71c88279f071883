"""Central JAX configuration: persistent compilation cache.

TPU (axon remote-compile) first-compiles are expensive; the on-disk cache
makes every subsequent process start warm.  Called lazily by the ops
modules before their first jit."""

from __future__ import annotations

import os

_DONE = False


def ensure_jax_config() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import jax

        cache_dir = os.environ.get(
            "COZO_TPU_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — cache is best-effort
        pass
