"""Multi-device scaling: reads/s/chip of the shard_map data-parallel engine
vs the single-device engine on the same data.

Runs in its own process on a virtual N-device CPU mesh (JAX_PLATFORMS=cpu):
with one real chip attached, this measures the sharding PLUMBING overhead —
the collective + stripe-layout cost that bounds real-pod efficiency from
above (reads are independent, so compute scales perfectly; only dispatch
width and the psum differ).  Prints one JSON line:
{"n_devices", "reads_per_sec_1dev", "reads_per_sec_per_chip", "efficiency"}.

bench.py shells out to this after the headline configs (BASELINE north
star: >=85% scaling efficiency).
"""

from __future__ import annotations

import json
import os
import sys
import time

NDEV = int(os.environ.get("BSMAP_TPU_SCALING_NDEV", 8))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={NDEV}").strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from tools.genreads import generate
    BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")
    n_reads = int(os.environ.get("BSMAP_TPU_SCALING_READS", 100_000))
    gpath, rpath = generate(BENCH_DIR, n_reads=max(n_reads, 200_000))

    from bsmap_tpu.params import Param, REG_ALPHABET
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (build_index, index_cache_key, load_index,
                                 save_index)
    from bsmap_tpu import native
    from bsmap_tpu.blockio import BlockReadStream
    from bsmap_tpu.engine import device_engine as de
    from bsmap_tpu.parallel import ShardedDeviceEngine, make_mesh
    from bsmap_tpu.utils import myrand_hash

    p = Param()
    p.randseed = 17
    p.out_sam = 1
    genome = load_genome(gpath, p)
    cache = os.path.join(BENCH_DIR, "index")
    os.makedirs(cache, exist_ok=True)
    key = os.path.join(cache, index_cache_key(gpath, p) + ".npz")
    index = load_index(key) if os.path.exists(key) else build_index(genome, p)
    if not os.path.exists(key):
        save_index(key, index)

    # pre-encode one read window so the timed region is pure align
    lib = native.get_lib()
    bs = BlockReadStream(rpath, p, readset=0, lib=lib)
    B_loc = int(os.environ.get("BSMAP_TPU_SCALING_BLOC", 8192))
    blk = bs.next_block(NDEV * B_loc)
    bs.close()
    rows = native.encode_block_words(lib, blk.buf, blk.rec, p.alphabet,
                                     REG_ALPHABET, de.FIXELEMENT)
    lens = rows[:, de.SC_LEN]
    rows[:, de.SC_BUD] = ((p.max_snp_num + 1) * (lens - 1)
                          // np.maximum(lens, 1)).astype(np.int32)
    rows[:, de.SC_RAND] = myrand_hash(blk.indices,
                                      p.randseed).astype(np.uint32).view(
        np.int32)
    rows[:, de.SC_RANK] = 0
    n = len(rows)

    def timed(engine, reps=3):
        read_of = lambda t: blk.read_obj(int(t))
        cfg = engine._cfg("f")
        engine._align_arrays(cfg, rows[: engine.B], read_of)  # compile
        t0 = time.time()
        for _ in range(reps):
            engine._align_arrays(cfg, rows[: engine.B], read_of)
        return engine.B * reps / (time.time() - t0)

    e1 = de.DeviceEngine(genome, index, p)
    e1.B = B_loc
    e1._set_tiers(B_loc)
    r1 = timed(e1)

    mesh = make_mesh(NDEV)
    en = ShardedDeviceEngine(genome, index, p, mesh=mesh, b_loc=B_loc)
    rn = timed(en)

    per_chip = rn / NDEV
    print(json.dumps({
        "n_devices": NDEV,
        "reads_per_sec_1dev": round(r1, 1),
        "reads_per_sec_total": round(rn, 1),
        "reads_per_sec_per_chip": round(per_chip, 1),
        # virtual devices timeshare the SAME cores, so per-chip efficiency
        # is meaningless here; the honest proxy is same-silicon throughput
        # ratio = sharding plumbing overhead (1.0 = free).  Real per-chip
        # efficiency needs a real multi-chip pod.
        "plumbing_efficiency": round(rn / r1, 3),
        "note": f"virtual {NDEV}-device CPU mesh on shared cores: "
                "plumbing-overhead proxy (1 real chip attached)",
    }), flush=True)


if __name__ == "__main__":
    main()
