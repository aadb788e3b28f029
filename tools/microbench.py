"""Primitive-op microbenchmarks on the real chip: gather variants, sort,
scatter, cumsum — establishes the achievable envelope for the engine."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    TAB = 43_000_000
    tab1 = jnp.asarray(rng.integers(0, 2**31, TAB, dtype=np.int32))
    tab4 = jnp.asarray(rng.integers(0, 2**31, (TAB, 4), dtype=np.int32))
    for NI in (3_150_000, 200_000):
        idx = jnp.asarray(rng.integers(0, TAB, NI, dtype=np.int32))
        dt = timeit(lambda t, i: t[i], tab1, idx)
        print(f"gather1d  {NI:>9}: {dt*1e3:8.2f} ms  {NI/dt/1e6:8.1f} M/s")
        dt = timeit(lambda t, i: t[i], tab4, idx)
        print(f"gather2d4 {NI:>9}: {dt*1e3:8.2f} ms  {NI/dt/1e6:8.1f} Mrow/s")
        dt = timeit(lambda t, i: jnp.stack([t[:, k][i] for k in range(4)]),
                    tab4, idx)
        print(f"g4x1d     {NI:>9}: {dt*1e3:8.2f} ms  {NI/dt/1e6:8.1f} Mrow/s")

    # catcat-style window gather: (CANDS, 11) from 1.3M words
    W = 1_300_000
    cat = jnp.asarray(rng.integers(0, 2**31, W, dtype=np.int32))
    for C in (131072, 262144):
        g = jnp.asarray(rng.integers(0, W - 12, C, dtype=np.int32))
        kk = jnp.arange(11, dtype=jnp.int32)
        dt = timeit(lambda t, gg: t[gg[:, None] + kk[None, :]], cat, g)
        print(f"win11     {C:>9}: {dt*1e3:8.2f} ms  {C/dt/1e6:8.1f} Mwin/s")
        dt = timeit(
            lambda t, gg: jnp.stack([t[gg + k] for k in range(11)], 1),
            cat, g)
        print(f"win11x1d  {C:>9}: {dt*1e3:8.2f} ms  {C/dt/1e6:8.1f} Mwin/s")

    # sorts / scatters / scans on the candidate axis
    C = 131072
    keys = jnp.asarray(rng.integers(0, 2**31, C, dtype=np.int32))
    dt = timeit(lambda k: jnp.argsort(k, stable=True), keys)
    print(f"argsort   {C:>9}: {dt*1e3:8.2f} ms")
    dt = timeit(lambda k: jnp.cumsum(k), keys)
    print(f"cumsum    {C:>9}: {dt*1e3:8.2f} ms")
    B = 16384
    rid = jnp.asarray(rng.integers(0, B, C, dtype=np.int32))
    val = jnp.asarray(rng.integers(0, 16, C, dtype=np.int32))
    dt = timeit(lambda r, v: jnp.zeros((B, 16), jnp.int32).at[r, v].add(1),
                rid, val)
    print(f"scatter2d {C:>9}: {dt*1e3:8.2f} ms")
    dt = timeit(lambda r, v: jnp.zeros((B,), jnp.int32).at[r].min(v),
                rid, val)
    print(f"scatmin1d {C:>9}: {dt*1e3:8.2f} ms")
    bnd = jnp.asarray(np.sort(rng.integers(0, C, B, dtype=np.int32)))
    dt = timeit(lambda b, k: jnp.searchsorted(b, k), bnd, keys)
    print(f"searchsrt {C:>9}: {dt*1e3:8.2f} ms")

    # take_along_axis styles used by stage 1
    P = 96
    sarr = jnp.asarray(rng.integers(0, TAB, (B, P), dtype=np.int32))
    dt = timeit(lambda t, s: t[s], tab4, sarr)
    print(f"g2d (B,P) {B*P:>9}: {dt*1e3:8.2f} ms  {B*P/dt/1e6:8.1f} Mrow/s")
    rows = jnp.asarray(rng.integers(0, 2**20, (B, P, 4), dtype=np.int32))
    ki = jnp.asarray(rng.integers(0, P, (B, 128), dtype=np.int32))
    dt = timeit(lambda r, k: jnp.take_along_axis(r[..., 0], k, axis=1),
                rows, ki)
    print(f"taa(B,128): {dt*1e3:8.2f} ms")

    # dense ops baseline: the verify math itself on (C, 10) words
    q = jnp.asarray(rng.integers(0, 2**31, (C, 10), dtype=np.uint32))
    s = jnp.asarray(rng.integers(0, 2**31, (C, 10), dtype=np.uint32))
    def verify(q, s):
        xc = ((~s) << jnp.uint32(1)) | s | jnp.uint32(0x55555555)
        x = ((q & xc) ^ s) & q
        lanes = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
        return jax.lax.population_count(lanes).sum(-1)
    dt = timeit(verify, q, s)
    print(f"verifymath{C:>9}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
