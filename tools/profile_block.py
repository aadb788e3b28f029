"""Clean phase breakdown of the SE block pipeline on the attached chip.

Measures, with engine counters reset after warmup:
  - align loop wall (main thread: align_block per block)
  - writer drain wall (time after last align until writer finishes)
  - per-phase: parse, encode, t_enqueue (pad+H2D enqueue), t_collect
    (device wait), native format, file write
Usage: python tools/profile_block.py [n_reads]
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main() -> None:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    genome_kind = sys.argv[2] if len(sys.argv) > 2 else "10mb"

    from tools.genreads import generate, generate_chr21
    if genome_kind == "chr21":
        gpath, rpath = generate_chr21(BENCH_DIR, n_reads=n_reads)
    else:
        gpath, rpath = generate(BENCH_DIR, n_reads=max(n_reads, 1_000_000))

    from bsmap_tpu.params import Param
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (build_index, index_cache_key, load_index,
                                 save_index)
    from bsmap_tpu.output.sam import SamFormatter, sam_header
    from bsmap_tpu.utils import RandR
    from bsmap_tpu import native
    from bsmap_tpu.blockio import BlockReadStream
    from bsmap_tpu.engine.device_engine import DeviceEngine

    p = Param()
    p.randseed = 17
    p.out_sam = 1
    p.read_end = n_reads
    t0 = time.time()
    genome = load_genome(gpath, p)
    print(f"genome load {time.time()-t0:.1f}s", flush=True)
    cache = os.path.join(BENCH_DIR, "index")
    os.makedirs(cache, exist_ok=True)
    key = os.path.join(cache, index_cache_key(gpath, p) + ".npz")
    t0 = time.time()
    if os.path.exists(key):
        index = load_index(key)
    else:
        index = build_index(genome, p)
        save_index(key, index)
    print(f"index {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    engine = DeviceEngine(genome, index, p)
    fmt = SamFormatter(genome, p, RandR(1))
    lib = native.get_lib()
    bs = BlockReadStream(rpath, p, readset=0, lib=lib)
    blk = bs.next_block(4096)
    engine.format_block(blk, fmt)
    bs.close()
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    # reset counters
    fmt.n_aligned = 0
    engine.t_enqueue = engine.t_collect = 0.0
    engine.n_dispatched = engine.n_replayed = 0

    stream = BlockReadStream(rpath, p, readset=0, lib=lib)
    stream.index = p.read_start - 1  # fresh
    blk_n = 4 * engine.B
    q_in: queue.Queue = queue.Queue(maxsize=2)
    q_out: queue.Queue = queue.Queue(maxsize=4)
    t_parse = [0.0]
    t_fmt = [0.0]
    t_write = [0.0]

    def producer():
        while True:
            t0 = time.time()
            blk = stream.next_block(blk_n)
            t_parse[0] += time.time() - t0
            q_in.put(blk)
            if blk is None:
                break

    def writer():
        with open(os.path.join(BENCH_DIR, "prof_out.sam"), "wb") as fout:
            fout.write(sam_header(genome).encode("latin1"))
            while True:
                item = q_out.get()
                if item is None:
                    break
                blk, aligned = item
                t0 = time.time()
                out = engine.format_aligned_block(blk, aligned, fmt)
                t_fmt[0] += time.time() - t0
                t0 = time.time()
                fout.write(out)
                t_write[0] += time.time() - t0

    t_all0 = time.time()
    t_prod = threading.Thread(target=producer, daemon=True)
    t_wr = threading.Thread(target=writer, daemon=True)
    t_prod.start()
    t_wr.start()
    total = 0
    t_align = 0.0
    t_qin = 0.0
    while True:
        t0 = time.time()
        blk = q_in.get()
        t_qin += time.time() - t0
        if blk is None:
            break
        t0 = time.time()
        aligned = engine.align_block(blk)
        t_align += time.time() - t0
        q_out.put((blk, aligned))
        total += len(blk)
        print(f"  {total} reads aligned @ {time.time()-t_all0:.2f}s",
              flush=True)
    t_last_align = time.time()
    q_out.put(None)
    t_wr.join()
    t_prod.join()
    t_all = time.time() - t_all0
    drain = time.time() - t_last_align
    print(f"total {total} reads in {t_all:.2f}s = {total/t_all:.0f} reads/s")
    print(f"  align loop (main thread in align_block): {t_align:.2f}s")
    print(f"    t_enqueue={engine.t_enqueue:.2f} t_collect="
          f"{engine.t_collect:.2f} n_disp={engine.n_dispatched} "
          f"n_replay={engine.n_replayed} t_h2d={engine.t_h2d:.2f} "
          f"t_call={engine.t_call:.2f}")
    print(f"  q_in wait (parser-bound): {t_qin:.2f}s; parse thread total "
          f"{t_parse[0]:.2f}s")
    print(f"  writer: fmt={t_fmt[0]:.2f}s write={t_write[0]:.2f}s; "
          f"tail drain after last align: {drain:.2f}s")
    print(f"  tuning: probe_mode={engine.probe_mode} "
          f"n_probe={engine.n_probe} rank_start={engine.rank_start}")


if __name__ == "__main__":
    main()
