"""Profile the device engine end-to-end pieces on the real chip:
align_batch (kernel + orchestration), the raw fused dispatch, and the
host-side formatting, at DEV_BATCH scale."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main():
    from tools.genreads import generate
    gpath, rpath = generate(BENCH_DIR, n_reads=200_000)

    from bsmap_tpu.params import Param
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (build_index, index_cache_key, load_index,
                                 save_index)
    from bsmap_tpu.readio import open_read_stream
    from bsmap_tpu.output.sam import SamFormatter
    from bsmap_tpu.utils import RandR
    from bsmap_tpu.engine import device_engine as de
    import jax

    p = Param()
    p.randseed = 17
    p.out_sam = 1

    t0 = time.time()
    genome = load_genome(gpath, p)
    cache = os.path.join(BENCH_DIR, "index")
    os.makedirs(cache, exist_ok=True)
    key = os.path.join(cache, index_cache_key(gpath, p) + ".npz")
    index = load_index(key) if os.path.exists(key) else build_index(genome, p)
    if not os.path.exists(key):
        save_index(key, index)
    print(f"setup(load+index): {time.time()-t0:.1f}s", flush=True)

    eng = de.DeviceEngine(genome, index, p)
    fmt = SamFormatter(genome, p, RandR(1))
    s = open_read_stream(rpath, p, readset=0)
    t0 = time.time()
    batch = s.next_batch(de.DEV_BATCH)
    print(f"parse {len(batch)} reads: {time.time()-t0:.2f}s", flush=True)
    s.close()

    t0 = time.time()
    eng.align_batch(batch)
    print(f"cold align_batch: {time.time()-t0:.2f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        res = eng.align_batch(batch)
        dt = time.time() - t0
        print(f"warm align_batch: {dt*1e3:.0f} ms = "
              f"{len(batch)/dt:.0f} reads/s (replayed={eng.n_replayed})",
              flush=True)

    # raw kernel dispatch (amortized, pipelined x8)
    results = [None] * len(batch)
    live_idx, budgets = eng._filter_batch(batch, results)
    arrs_all = eng._pack_host(batch, live_idx, budgets)
    codes, regs, lens, buds, rsets, ridx = arrs_all
    from bsmap_tpu.utils import myrand_hash
    rand32 = myrand_hash(ridx, p.randseed)
    cfg = eng._cfg("f")
    sel = np.arange(min(len(live_idx), eng.B))
    padded = eng._pad_window((codes, regs, lens, buds, rand32), sel)
    out = eng._dispatch(cfg, padded)
    np.asarray(out)
    t0 = time.time()
    outs = [eng._dispatch(cfg, padded) for _ in range(8)]
    for o in outs:
        o.block_until_ready()
    dt = (time.time() - t0) / 8
    print(f"fused kernel x8 pipelined: {dt*1e3:.1f} ms/dispatch = "
          f"{len(sel)/dt:.0f} reads/s", flush=True)

    # host-side: pack + collect + format
    t0 = time.time()
    eng._pack_host(batch, live_idx, budgets)
    print(f"pack_host: {(time.time()-t0)*1e3:.0f} ms", flush=True)
    t0 = time.time()
    res = eng.align_batch(batch)
    t1 = time.time()
    text = "".join(fmt.emit_device(rd, r) if isinstance(r, de.DeviceView)
                   else fmt.string_align(rd, r)
                   for rd, r in zip(batch, res))
    print(f"format {len(batch)}: {(time.time()-t1)*1e3:.0f} ms "
          f"({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
