"""Measure axon relay host->device upload bandwidth + fixed round-trip
latency (grounds the SSSP true-cold bound: a fresh checkout must upload
the ~276MB dst-sorted edge array before the first solve — VERDICT r4
next #7 asks for <30s cold or a documented impossibility bound).

Run alone on the TPU: python benches/profile_relay_bw.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device {dev}", flush=True)
    # fixed latency: tiny pulls
    x = jax.device_put(jnp.zeros(8, jnp.float32))
    for _ in range(2):
        np.asarray(x)
    lats = []
    for _ in range(10):
        t0 = time.time()
        np.asarray(x)
        lats.append(time.time() - t0)
    print(f"pull_latency: median {sorted(lats)[5]*1000:.1f}ms "
          f"min {min(lats)*1000:.1f}ms", flush=True)

    for mb in (16, 64, 256):
        a = np.random.default_rng(0).integers(
            0, 1 << 30, size=(mb << 20) // 4, dtype=np.int32
        )
        ts = []
        for _ in range(3):
            t0 = time.time()
            d = jax.device_put(a)
            d.block_until_ready()
            # force materialization through the relay (block_until_ready
            # alone does not reliably block through axon)
            np.asarray(d[:8])
            ts.append(time.time() - t0)
            del d
        el = sorted(ts)[1]
        print(f"upload {mb}MB: median {el:.2f}s -> {mb/el:.1f} MB/s "
              f"reps={[round(t, 2) for t in ts]}", flush=True)

    for mb in (16, 64):
        d = jax.device_put(jnp.zeros((mb << 20) // 4, jnp.int32))
        np.asarray(d[:8])
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(d)
            ts.append(time.time() - t0)
        el = sorted(ts)[1]
        print(f"pull {mb}MB: median {el:.2f}s -> {mb/el:.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
