"""Steady-state kernel timing on the attached chip.

Loads the 10Mb bench genome + reads, packs one real B-read window, then
dispatches the lean kernel K times with a forced host fetch each time.
Reports per-dispatch wall (the ~26 ms dispatch floor included).

Usage: python tools/kernel_bench.py [reps] [cands_mult] [genome]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    kind = sys.argv[3] if len(sys.argv) > 3 else "10mb"
    maxrank = int(os.environ.get("KB_MAXRANK", "0"))

    import numpy as np
    from tools.genreads import generate, generate_chr21
    if kind == "chr21":
        gpath, rpath = generate_chr21(BENCH_DIR, n_reads=500_000)
    else:
        gpath, rpath = generate(BENCH_DIR, n_reads=1_000_000)
    from bsmap_tpu.params import Param
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import index_cache_key, load_index, build_index, \
        save_index
    from bsmap_tpu import native
    from bsmap_tpu.blockio import BlockReadStream
    from bsmap_tpu.engine.device_engine import DeviceEngine
    from bsmap_tpu.params import REG_ALPHABET

    p = Param()
    p.randseed = 17
    p.out_sam = 1
    genome = load_genome(gpath, p)
    key = os.path.join(BENCH_DIR, "index", index_cache_key(gpath, p) + ".npz")
    if os.path.exists(key):
        index = load_index(key)
    else:
        index = build_index(genome, p)
        save_index(key, index)
    engine = DeviceEngine(genome, index, p)
    lib = native.get_lib()
    bs = BlockReadStream(rpath, p, readset=0, lib=lib)
    blk = bs.next_block(engine.B)
    bs.close()
    nw = 7
    rows = native.encode_block_words(lib, blk.buf, blk.rec, p.alphabet,
                                     REG_ALPHABET, nw)
    lens = rows[:, 2 * nw]
    buds = ((p.max_snp_num + 1) * (lens - 1) // np.maximum(lens, 1)).astype(
        np.int32)
    rows[:, 2 * nw + 1] = buds
    rows[:, 2 * nw + 2] = 0
    rows[:, 2 * nw + 3] = maxrank
    if len(rows) < engine.B:
        pad = np.zeros((engine.B - len(rows), rows.shape[1]), np.int32)
        rows = np.concatenate([rows, pad])

    cfg = engine._cfg("f", lean=True, nw=nw)
    cap = mult * engine.B
    t0 = time.time()
    out = engine._dispatch(cfg, rows, cap)
    r = np.asarray(out)
    print(f"first dispatch (load/compile): {time.time()-t0:.1f}s", flush=True)
    print(f"ok={int(((r[:,1] & 8) != 0).sum())} found="
          f"{int(((r[:,1] & 1) != 0).sum())} of {len(blk)} "
          f"ftot_sum={int(r[:,2].sum())}")
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = engine._dispatch(cfg, rows, cap)
        np.asarray(out)
        ts.append(time.time() - t0)
    ts = np.array(ts)
    print(f"cands={cap} maxrank={maxrank} per-dispatch: "
          f"median {1e3*np.median(ts):.1f} ms  min {1e3*ts.min():.1f}  "
          f"mean {1e3*ts.mean():.1f}")


if __name__ == "__main__":
    main()
