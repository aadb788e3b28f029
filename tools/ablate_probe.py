"""Cumulative-prefix ablation of stage 1 (the seed schedule) on the chip.

Builds one program per prefix of _schedule_impl's pipeline (all compiles
overlap on the async remote-compile service), then times them round-robin.
The deltas between consecutive prefixes locate stage 1's real costs.

Usage: python tools/ablate_probe.py [genome: 10mb|chr21]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "10mb"
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tools.genreads import generate, generate_chr21
    if kind == "chr21":
        gpath, rpath = generate_chr21(BENCH_DIR, n_reads=500_000)
    else:
        gpath, rpath = generate(BENCH_DIR, n_reads=1_000_000)
    from bsmap_tpu.params import Param, REG_ALPHABET
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import index_cache_key, load_index, build_index, \
        save_index
    from bsmap_tpu import native
    from bsmap_tpu.blockio import BlockReadStream
    import bsmap_tpu.engine.device_engine as de
    from bsmap_tpu.engine import aot_cache
    from bsmap_tpu.engine.device_engine import (_g1, _rowg, _taa,
                                                _seed_array_w,
                                                _unpack_inputs)

    p = Param()
    p.randseed = 17
    p.out_sam = 1
    genome = load_genome(gpath, p)
    key = os.path.join(BENCH_DIR, "index", index_cache_key(gpath, p) + ".npz")
    index = load_index(key) if os.path.exists(key) else build_index(genome, p)
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
    rows[:, 2 * nw + 3] = p.max_snp_num
    if len(rows) < engine.B:
        rows = np.concatenate([rows, np.zeros(
            (engine.B - len(rows), rows.shape[1]), np.int32)])

    cfg = engine._cfg("f", lean=False, nw=nw)
    S, I, P, MS = cfg.S, cfg.I, cfg.P, cfg.maxseg

    def prefix(cut):
        def fn(prof_a, d_kmer_tab, packed):
            qw0, rw0, lens, budgets, rand32, maxrank = _unpack_inputs(packed)
            sarr = _seed_array_w(qw0, S, P)
            if cut == 0:
                return sarr.sum(axis=1, keepdims=True)
            rows_p = _rowg(d_kmer_tab, sarr)
            cnt = rows_p[..., 1]
            if cut == 1:
                return cnt.sum(axis=1, keepdims=True) + sarr[:, :1]
            B = qw0.shape[0]
            n_i = jnp.arange(MS, dtype=jnp.int32)
            off_i = jnp.arange(S, dtype=jnp.int32)
            BIGU = jnp.uint32(0xFFFFFFFF)
            seedseg = jnp.clip(jnp.minimum((lens - I + 1) // S, budgets + 1),
                               0, MS)
            max_off = (lens - I + 1) % S
            cost = jnp.where(cnt > 0, cnt + 2, 0).astype(jnp.uint32)
            WLEN = MS * S + I
            cost_p = jnp.zeros((B, WLEN + 1), jnp.uint32)
            cost_p = cost_p.at[:, 1: min(P, WLEN) + 1].set(cost[:, :WLEN])
            cs = jnp.cumsum(cost_p, axis=1)
            Ws = cs[:, I:] - cs[:, :-I]
            T = Ws[:, : MS * S].reshape(B, MS, S)
            seg_mask = (n_i[None, :] < seedseg[:, None])
            tot = jnp.where(seg_mask[:, :, None], T, 0).sum(
                axis=1, dtype=jnp.uint32)
            off_ok = off_i[None, :] < max_off[:, None]
            tot_m = jnp.where(off_ok, tot, BIGU)
            s_off = jnp.where(max_off > 0,
                              jnp.argmin(tot_m, axis=1), 0).astype(jnp.int32)
            if cut == 2:
                return (s_off + tot.sum(axis=1).astype(jnp.int32)
                        )[:, None] + sarr[:, :1]

            def zig_body(it, start_arr):
                half = it // 2
                ptr = jnp.where(it % 2 == 0, half, seedseg - 1 - half)
                active = (it < seedseg)
                ptr_c = jnp.clip(ptr, 0, MS - 1).astype(jnp.int32)
                prev = _taa(start_arr,
                            jnp.clip(ptr_c - 1, 0, MS - 1)[:, None])[:, 0]
                nxt = _taa(start_arr,
                           jnp.clip(ptr_c + 1, 0, MS - 1)[:, None])[:, 0]
                lo = jnp.where(ptr_c == 0, 0, prev)
                hi = jnp.where(ptr_c == seedseg - 1, max_off, nxt)
                costs = _taa(T.reshape(B, MS * S),
                             ptr_c[:, None] * S + off_i[None, :])
                rng_ok = (off_i[None, :] >= lo[:, None]) & \
                         (off_i[None, :] <= hi[:, None])
                costs_m = jnp.where(rng_ok, costs, BIGU)
                best = jnp.argmin(costs_m, axis=1).astype(jnp.int32)
                onehot = (n_i[None, :] == ptr_c[:, None]) & active[:, None]
                return jnp.where(onehot, best[:, None], start_arr)

            start_arr = jnp.broadcast_to(s_off[:, None], (B, MS))
            for it in range(MS):
                start_arr = zig_body(it, start_arr)
            if cut == 3:
                return start_arr.sum(axis=1, keepdims=True) + sarr[:, :1]
            cost_n = _taa(T.reshape(B, MS * S), n_i[None, :] * S + start_arr)
            cost_s = cost_n ^ jnp.uint32(0x80000000)
            key_hi = jnp.where(seg_mask, cost_s, BIGU)
            order = jnp.argsort(key_hi, axis=1, stable=True).astype(jnp.int32)
            if cut == 4:
                return order.sum(axis=1, keepdims=True) + sarr[:, :1]
            NB = cfg.NB
            slot_rank = jnp.repeat(n_i, I)
            slot_phase = jnp.tile(jnp.arange(I, dtype=jnp.int32), MS)
            mode = _taa(order, jnp.broadcast_to(slot_rank[None, :], (B, NB)))
            a = _g1(prof_a, mode * I + slot_phase[None, :])
            st = _taa(start_arr, mode)
            k = a + st - slot_phase[None, :]
            k_c = jnp.clip(k, 0, P - 1)
            fresh = (k >= 0) & (k <= (lens - S)[:, None])
            ncol = rows_p.shape[-1]
            flat = jnp.arange(B, dtype=jnp.int32)[:, None] * P + k_c
            rs = _rowg(rows_p.reshape(B * P, ncol), flat)
            cntv = jnp.where(fresh, rs[..., 1], 0)
            return (rs[..., 0] + cntv + rs[..., 2] + rs[..., 3]).sum(
                axis=1, keepdims=True) + sarr[:, :1]
        return fn

    sd = jax.ShapeDtypeStruct
    specs = (sd(engine.prof_a.shape, engine.prof_a.dtype),
             sd(engine.d_kmer_tab.shape, engine.d_kmer_tab.dtype),
             sd((engine.B, rows.shape[1]), jnp.int32))
    names = ["seed_array", "+row_gather", "+cumsums/offsets", "+zigzag",
             "+argsort", "+slot_desc"]
    exes = []
    for cut in range(6):
        jitted = jax.jit(prefix(cut))
        exes.append(aot_cache.get_compiled(f"ablate{cut}", jitted, (), specs))
    print("compiles enqueued", flush=True)
    args = (engine.prof_a, engine.d_kmer_tab, jnp.asarray(rows))
    for cut, exe in enumerate(exes):
        t0 = time.time()
        np.asarray(exe(*args))
        print(f"first {names[cut]}: {time.time()-t0:.1f}s", flush=True)
    times = [[] for _ in exes]
    for rep in range(8):
        for cut, exe in enumerate(exes):
            t0 = time.time()
            np.asarray(exe(*args))
            times[cut].append(time.time() - t0)
    prev = 0.0
    for cut, exe in enumerate(exes):
        med = 1e3 * float(np.median(times[cut]))
        print(f"{names[cut]:18s} median {med:7.1f} ms   delta "
              f"{med - prev:+7.1f}")
        prev = med


if __name__ == "__main__":
    main()
