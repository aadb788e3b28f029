"""Phase profile of the native PE block path on the chip.

Times, per block: native parse+encode, kernel dispatch+collect (both
mates), the K x K join, prow assembly, native formatting.

Usage: python tools/profile_pe.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main() -> None:
    import numpy as np
    from tools.genreads import generate_pe
    from bsmap_tpu.params import Param, REG_ALPHABET, REV_CHAR
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (index_cache_key, load_index, build_index,
                                 save_index)
    from bsmap_tpu import native
    from bsmap_tpu.blockio import BlockReadStream
    from bsmap_tpu.engine.pair_device import PairDeviceEngine
    from bsmap_tpu.output.pair_sam import PairFormatter
    from bsmap_tpu.utils import RandR, myrand_hash

    gpath, r1, r2 = generate_pe(BENCH_DIR)
    p = Param()
    p.randseed = 17
    p.out_sam = 1
    p.pairend = 1
    genome = load_genome(gpath, p)
    key = os.path.join(BENCH_DIR, "index", index_cache_key(gpath, p) + ".npz")
    if os.path.exists(key):
        index = load_index(key)
    else:
        index = build_index(genome, p)
        save_index(key, index)
    eng = PairDeviceEngine(genome, index, p)
    fmt = PairFormatter(genome, p, RandR(1))
    lib = native.get_lib()
    t0 = time.time()
    eng.warmup_programs()
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    sa = BlockReadStream(r1, p, readset=1, lib=lib)
    sb = BlockReadStream(r2, p, readset=2, lib=lib)
    blk_n = 65536
    tot = {"parse": 0.0, "encode": 0.0, "kernel": 0.0, "join": 0.0,
           "usel": 0.0, "fmt": 0.0}
    n_tot = 0
    nwarm = 0
    while True:
        t0 = time.time()
        ba = sa.next_block(blk_n)
        bb = sb.next_block(blk_n)
        if ba is None or bb is None or len(ba) != len(bb):
            break
        tot["parse"] += time.time() - t0
        n = len(ba)
        n_tot += n
        t0 = time.time()
        native.fix_pair_names(lib, ba.buf, ba.rec, bb.buf, bb.rec)
        nw = 7
        ra0 = native.encode_block_words(lib, ba.buf, ba.rec, p.alphabet,
                                        REG_ALPHABET, nw)
        rb0 = native.encode_block_words(lib, bb.buf, bb.rec, p.alphabet,
                                        REG_ALPHABET, nw)
        la = ra0[:, 2 * nw].astype(np.int64)
        lb = rb0[:, 2 * nw].astype(np.int64)
        buds_a = ((p.max_snp_num + 1) * (la - 1) // la).astype(np.int32)
        buds_b = ((p.max_snp_num + 1) * (lb - 1) // lb).astype(np.int32)
        rand_a = myrand_hash(ba.indices.astype(np.uint64), p.randseed)
        rand_b = myrand_hash(bb.indices.astype(np.uint64), p.randseed)
        ra0[:, 2 * nw + 1] = buds_a
        rb0[:, 2 * nw + 1] = buds_b
        ra0[:, 2 * nw + 2] = rand_a.view(np.int32)
        rb0[:, 2 * nw + 2] = rand_b.view(np.int32)
        ra0[:, 2 * nw + 3] = 0
        rb0[:, 2 * nw + 3] = 0
        tot["encode"] += time.time() - t0
        cfg_a, cfg_b = eng._cfg(1, nw), eng._cfg(2, nw)
        t0 = time.time()
        rows_a, rows_b, join, _ = eng._align_join(
            ra0, rb0, cfg_a, cfg_b, la, lb, buds_a, buds_b, rand_a, rand_b)
        tot["kernel"] += time.time() - t0
        t0 = time.time()
        tot["join"] += time.time() - t0
        t0 = time.time()
        usel_a = eng._unpaired_sel(rows_a, rand_a)
        usel_b = eng._unpaired_sel(rows_b, rand_b)
        tot["usel"] += time.time() - t0
        t0 = time.time()
        from bsmap_tpu.engine.device_engine import (N_EXTRAS, X_FOUND, X_II,
                                                    X_SSUM)
        MS = eng.MS
        ex = 2 * MS
        s = join["sel"]
        n_all = n
        prow = np.zeros((n_all, 22), dtype=np.int32)
        cols = np.stack([
            join["paired"], join["cnt"], s["chain"], s["na"], s["nb"],
            s["insert"], s["a_chr"], s["a_loc"], s["b_chr"], s["b_loc"],
            rows_a[:, ex + X_FOUND], rows_a[:, ex + X_II],
            rows_a[:, ex + X_SSUM], usel_a[0], usel_a[1], usel_a[2],
            rows_b[:, ex + X_FOUND], rows_b[:, ex + X_II],
            rows_b[:, ex + X_SSUM], usel_b[0], usel_b[1], usel_b[2],
        ], axis=1).astype(np.int32)
        prow[:] = cols
        status = np.full(n_all, 2, dtype=np.int32)
        se = eng.se
        out, line_off, cnts = native.format_pair_block(
            lib, ba.buf, ba.rec, bb.buf, bb.rec, status, prow,
            se._chrname_buf, se._chrname_off, REV_CHAR, True, 1,
            ba.synth_qual, bb.synth_qual)
        tot["fmt"] += time.time() - t0
        nwarm += 1
    sa.close()
    sb.close()
    print(f"{n_tot} pairs, blocks={nwarm}")
    for k, v in tot.items():
        print(f"  {k:8s} {v:7.2f}s  ({1e6 * v / max(n_tot, 1):6.2f} us/pair)",
              flush=True)
    tsum = sum(tot.values())
    print(f"  total    {tsum:7.2f}s -> {n_tot / tsum:.0f} pairs/s")


if __name__ == "__main__":
    main()
