"""Headline benchmark: SE WGBS alignment throughput (reads/s) on one chip.

Protocol mirrors the reference measurement: 200k fully-converted 100nt
bisulfite reads against a 10Mb genome at -v 2 -S 17, SAM output.  Timed
region = the alignment phase (read batches -> align -> formatted SAM
strings), i.e. what scales with read count; genome load + index build are
one-time, cacheable setup (the reference rebuilds them every run:
main.cpp:457-464).

Baseline: reference BSMAP v2.6 compiled -O3, single thread, same data and
flags, measured on the dev host (user-time of the alignment phase:
~4.4 s / 1M reads => ~2.27e5 reads/s; wall-clock estimate 1.8e5).  We use
the wall-clock figure 1.8e5 reads/s as the recorded CPU baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_BASELINE_READS_PER_SEC = 1.8e5   # reference BSMAP, 1 CPU thread (above)
BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")
N_READS = int(os.environ.get("BSMAP_TPU_BENCH_READS", 200_000))


def main() -> None:
    from tools.genreads import generate
    gpath, rpath = generate(BENCH_DIR, n_reads=N_READS)

    from bsmap_tpu.params import Param
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (build_index, index_cache_key, load_index,
                                 save_index)
    from bsmap_tpu.readio import open_read_stream, BATCH_NUM
    from bsmap_tpu.output.sam import SamFormatter, sam_header
    from bsmap_tpu.utils import RandR
    from bsmap_tpu.cli import Options, make_engine

    p = Param()
    p.randseed = 17
    p.out_sam = 1

    t0 = time.time()
    genome = load_genome(gpath, p)
    cache = os.path.join(BENCH_DIR, "index")
    os.makedirs(cache, exist_ok=True)
    key = os.path.join(cache, index_cache_key(gpath, p) + ".npz")
    if os.path.exists(key):
        index = load_index(key)
    else:
        index = build_index(genome, p)
        save_index(key, index)
    o = Options()
    o.param = p
    o.query_a = rpath
    o.out_file = os.path.join(BENCH_DIR, "out.sam")
    engine = make_engine(o, genome, index)
    fmt = SamFormatter(genome, p, RandR(1))

    # warmup: compile on a first block (persistent XLA cache makes repeat
    # runs start hot); uses the same lean program as the timed region
    use_blocks0 = getattr(engine, "supports_blocks", lambda: False)()
    if use_blocks0:
        from bsmap_tpu import native
        from bsmap_tpu.blockio import BlockReadStream
        bs = BlockReadStream(rpath, p, readset=0, lib=native.get_lib())
        engine.format_block(bs.next_block(4096), fmt)
        bs.close()
    else:
        s = open_read_stream(rpath, p, readset=0)
        engine.format_batch(s.next_batch(4096), fmt)
        s.close()
    fmt.n_aligned = 0
    setup_s = time.time() - t0

    from bsmap_tpu.cli import run_single_end_blocks, run_single_end_reads
    from bsmap_tpu.utils import StepTimer
    from bsmap_tpu.readio import detect_format
    use_blocks = (getattr(engine, "supports_blocks", lambda: False)()
                  and detect_format(rpath) < 2)
    t1 = time.time()
    if use_blocks:
        n = run_single_end_blocks(o, engine, fmt, genome, StepTimer())
    else:
        n = run_single_end_reads(o, engine, fmt, genome, StepTimer())
    dt = time.time() - t1
    value = n / dt
    print(json.dumps({
        "metric": "se_wgbs_100nt_v2_align_reads_per_sec",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / REF_BASELINE_READS_PER_SEC, 3),
    }))
    print(f"# {n} reads in {dt:.2f}s (setup {setup_s:.1f}s), "
          f"engine={type(engine).__name__}", file=sys.stderr)


if __name__ == "__main__":
    main()
