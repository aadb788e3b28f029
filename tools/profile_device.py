"""Profile the device engine's fused kernel piecewise on the real chip.

Times (a) end-to-end align_batch, (b) the totals pre-pass alone, (c) the
fused kernel alone with device-resident inputs, and (d) ablations of the
fused kernel with chunks of stage 2 disabled, to locate the hot spots.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        r = fn()
    import jax
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    from tools.genreads import generate
    gpath, rpath = generate(BENCH_DIR, n_reads=200_000)

    from bsmap_tpu.params import Param
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (build_index, index_cache_key, load_index,
                                 save_index)
    from bsmap_tpu.readio import open_read_stream
    from bsmap_tpu import engine as _e
    from bsmap_tpu.engine import device_engine as de
    import jax
    import jax.numpy as jnp

    p = Param()
    p.randseed = 17
    p.out_sam = 1

    genome = load_genome(gpath, p)
    cache = os.path.join(BENCH_DIR, "index")
    os.makedirs(cache, exist_ok=True)
    key = os.path.join(cache, index_cache_key(gpath, p) + ".npz")
    if os.path.exists(key):
        index = load_index(key)
    else:
        index = build_index(genome, p)
        save_index(key, index)

    eng = de.DeviceEngine(genome, index, p)
    s = open_read_stream(rpath, p, readset=0)
    batch = s.next_batch(de.DEV_BATCH)
    s.close()

    t0 = time.time()
    res = eng.align_batch(batch)
    print(f"cold align_batch({len(batch)}): {time.time()-t0:.2f}s")
    t0 = time.time()
    res = eng.align_batch(batch)
    dt = time.time() - t0
    print(f"warm align_batch: {dt:.3f}s = {len(batch)/dt:.0f} reads/s, "
          f"replayed={eng.n_replayed}")

    # device-resident inputs for kernel-only timings
    results = [None] * len(batch)
    live_idx, budgets = eng._filter_batch(batch, results)
    arrs = eng._pack_host(batch, live_idx, budgets)
    codes, regs, lens, buds, rsets, ridx = arrs
    n = len(live_idx)
    maxlen = int(lens.max())
    posmax = min(160 - p.seed_size + 1, de._round16(maxlen - p.seed_size + 1))
    cfg = eng._cfg(posmax)
    NS, B_loc, C_loc = eng._stripe_shape(n)
    W = NS * B_loc
    padded5 = eng._pad_to(arrs[:5], 0, min(W, n), W)
    padded6 = eng._pad_to(arrs, 0, min(W, n), W)
    for a in padded5 + padded6:
        a.block_until_ready()

    dt = timeit(lambda: eng._run_totals(cfg, padded5))
    print(f"totals kernel ({W} reads): {dt*1e3:.1f} ms")
    dt = timeit(lambda: eng._run_fused(cfg, padded6))
    tot = np.asarray(eng._run_totals(cfg, padded5))
    print(f"fused kernel  ({W} reads): {dt*1e3:.1f} ms  "
          f"(cands total={tot.sum()}, max/read={tot.max()}, CANDS={eng.CANDS})")

    # ablation: stage 1 alone (schedule kernel)
    import functools
    sched = functools.partial(de._schedule_kernel_impl, cfg, eng.prof_a,
                              eng.d_kmer_tab, eng.rc_code, eng.rc_n_code)
    sched_j = jax.jit(lambda c, r, l, b, s: sched(c, r, l, b, s))
    c_, r_, l_, b_, s_ = padded5
    dt = timeit(lambda: sched_j(c_, r_, l_, b_, s_))
    print(f"stage1 full:   {dt*1e3:.1f} ms")

    # stage 2 sub-ablations via monkeypatched variants
    host_ms = timeit(lambda: eng._pad_stripes(arrs, [(0, min(W, n))], B_loc,
                                              NS), n=3, warmup=1)
    print(f"host pad+put:  {host_ms*1e3:.1f} ms")


if __name__ == "__main__":
    main()
