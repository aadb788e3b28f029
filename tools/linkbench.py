"""Measure the host<->device link (H2D/D2H bandwidth, dispatch round-trip)
and the fused kernel's device-side execution time.

On remote-attached devices (the axon tunnel) ``block_until_ready`` returns
before execution completes, so every measurement here forces real work with
a host fetch of (a slice of) the output — the only reliable sync point.
Writes one JSON line so bench artifacts can cite measured numbers instead
of folklore (round-2 verdict carried an unsourced 25 MB/s figure; round-3
measurements put the tunnel at ~60-225 MB/s H2D sustained with high
variance, and the old 336 B/read kernel at ~667 ms / 65536-read window).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_link(reps: int = 5):
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(np.zeros(1024, np.uint8), dev)
    np.asarray(f(x))

    # H2D: device_put then force materialization via a tiny dependent fetch
    for mb in (6, 22):
        n = mb << 20
        buf = np.random.randint(0, 255, n, dtype=np.uint8)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            y = jax.device_put(buf, dev)
            np.asarray(f(y)[:8])          # forces the transfer to finish
            ts.append(time.time() - t0)
        out[f"h2d_{mb}mb_ms"] = round(sorted(ts)[len(ts) // 2] * 1e3, 1)
        out[f"h2d_{mb}mb_mbps"] = round(mb / sorted(ts)[len(ts) // 2], 1)

    # D2H: fresh output each reps (np.asarray caches per-buffer)
    for kb in (512, 8192):
        n = kb << 10
        y = jax.device_put(np.zeros(n, np.uint8), dev)
        ts = []
        for _ in range(reps):
            z = f(y)
            np.asarray(z[:8])             # ensure computed before timing
            t0 = time.time()
            np.asarray(z)
            ts.append(time.time() - t0)
        out[f"d2h_{kb}kb_ms"] = round(sorted(ts)[len(ts) // 2] * 1e3, 1)

    # tiny dispatch round trip
    t0 = time.time()
    for _ in range(20):
        np.asarray(f(x))
    out["tiny_roundtrip_ms"] = round((time.time() - t0) / 20 * 1e3, 1)
    return out


def main() -> None:
    print(json.dumps(measure_link()), flush=True)


if __name__ == "__main__":
    main()
