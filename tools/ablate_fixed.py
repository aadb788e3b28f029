"""On-chip A/B of the FIXED-schedule fused kernel (the bulk-round program).

Round-robin timing within one session (the tunnel's service load swings ~2x
across sessions, PERF.md) of:
  base   fixed kernel, small capacity (2xB), maxrank=0 (the bulk round)
  c1     capacity 1xB (candidate-lane cost: scans/dedup are CANDS-wide)
  s1     stage-1-only (probe): the verify stage's cost by difference
  cso    candidate-sort word-gather coalescing (r4 verdict item 1a)
  dd2    2-table dedup cascade
  sg     sliced reference-word gather
  exact  the exact-schedule program (ReorderSeed/zigzag), for the gap

Usage: python tools/ablate_fixed.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import numpy as np
    import jax
    from tools.genreads import generate
    from bsmap_tpu.params import Param, REG_ALPHABET
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (index_cache_key, load_index, build_index,
                                 save_index)
    from bsmap_tpu import native
    from bsmap_tpu.blockio import BlockReadStream
    import bsmap_tpu.engine.device_engine as de

    gpath, rpath = generate(BENCH_DIR, n_reads=1_000_000)
    p = Param()
    p.randseed = 17
    p.out_sam = 1
    genome = load_genome(gpath, p)
    key = os.path.join(BENCH_DIR, "index", index_cache_key(gpath, p) + ".npz")
    if os.path.exists(key):
        index = load_index(key)
    else:
        index = build_index(genome, p)
        os.makedirs(os.path.dirname(key), exist_ok=True)
        save_index(key, index)
    engine = de.DeviceEngine(genome, index, p)
    lib = native.get_lib()
    bs = BlockReadStream(rpath, p, readset=0, lib=lib)
    blk = bs.next_block(engine.B)
    bs.close()
    nw = 7
    rows = native.encode_block_words(lib, blk.buf, blk.rec, p.alphabet,
                                     REG_ALPHABET, nw)
    lens_h = rows[:, 2 * nw]
    rows[:, 2 * nw + 1] = ((p.max_snp_num + 1) * (lens_h - 1)
                           // np.maximum(lens_h, 1)).astype(np.int32)
    rows[:, 2 * nw + 2] = 0
    rows[:, 2 * nw + 3] = 0            # maxrank 0: the bulk round
    if len(rows) < engine.B:
        rows = np.concatenate([rows, np.zeros(
            (engine.B - len(rows), rows.shape[1]), np.int32)])
    dev_rows = np.ascontiguousarray(rows)

    B = engine.B
    args = engine._engine_args()
    cfg_fx = engine._cfg("f", lean=True, nw=nw)._replace(fixed=True)
    cfg_ex = engine._cfg("f", lean=True, nw=nw)
    cfg_s1 = cfg_fx._replace(probe=True, lean=False)

    variants = []

    def add(name, kvar, cfg, cands):
        fn = jax.jit(de._align_fused_kernel.__wrapped__,
                     static_argnames=("cfg", "CANDS"))

        def run(dev):
            old = de._KVAR
            de._KVAR = kvar
            try:
                return fn(cfg, cands, *args, dev)
            finally:
                de._KVAR = old
        variants.append((name, run))

    add("base_2B", set(), cfg_fx, 2 * B)
    add("cap_1B", set(), cfg_fx, B)
    add("stage1", set(), cfg_s1, 1)
    add("cso_2B", {"cso"}, cfg_fx, 2 * B)
    add("dd2_2B", {"dd2"}, cfg_fx, 2 * B)
    add("sg_2B", {"sg"}, cfg_fx, 2 * B)
    add("exact_2B", set(), cfg_ex, 2 * B)

    import jax.numpy as jnp
    dev = jnp.asarray(dev_rows)
    # overlap every remote compile: dispatch all once, then force
    pend = [(name, run(dev)) for name, run in variants]
    t0 = time.time()
    for name, out in pend:
        np.asarray(out)
    print(f"warmup (all compiles overlapped): {time.time() - t0:.1f}s",
          flush=True)

    times = {name: [] for name, _ in variants}
    for rep in range(reps):
        for name, run in variants:
            t0 = time.time()
            out = run(dev)
            np.asarray(out)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"{name:10s} median {med * 1e3:7.1f} ms  "
              f"min {ts[0] * 1e3:7.1f}  max {ts[-1] * 1e3:7.1f}", flush=True)


if __name__ == "__main__":
    main()
