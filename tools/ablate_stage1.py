"""Ablate stage 1 (schedule kernel) of the device engine: time cumulative
prefixes of the computation to find where the ~244ms goes."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def bench(f, args, n=10, warmup=2):
    for _ in range(warmup):
        r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    from tools.genreads import generate
    gpath, rpath = generate(BENCH_DIR, n_reads=200_000)
    from bsmap_tpu.params import Param, FIXSIZE, FIXELEMENT, SEGLEN, MAXSNPS
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import build_index, index_cache_key, load_index, save_index
    from bsmap_tpu.readio import open_read_stream
    from bsmap_tpu.engine import device_engine as de

    p = Param(); p.randseed = 17; p.out_sam = 1
    genome = load_genome(gpath, p)
    cache = os.path.join(BENCH_DIR, "index"); os.makedirs(cache, exist_ok=True)
    key = os.path.join(cache, index_cache_key(gpath, p) + ".npz")
    index = load_index(key) if os.path.exists(key) else build_index(genome, p)
    if not os.path.exists(key):
        save_index(key, index)
    eng = de.DeviceEngine(genome, index, p)
    s = open_read_stream(rpath, p, readset=0)
    batch = s.next_batch(de.DEV_BATCH); s.close()
    results = [None] * len(batch)
    live_idx, budgets = eng._filter_batch(batch, results)
    arrs = eng._pack_host(batch, live_idx, budgets)
    codes, regs, lens, buds, rsets, ridx = arrs
    n = len(live_idx)
    maxlen = int(lens.max())
    posmax = min(FIXSIZE - p.seed_size + 1, de._round16(maxlen - p.seed_size + 1))
    cfg = eng._cfg(posmax)
    NS, B_loc, C_loc = eng._stripe_shape(n)
    W = NS * B_loc
    c_, r_, l_, b_, s_ = eng._pad_to(arrs[:5], 0, min(W, n), W)
    MAXSEG = MAXSNPS + 1
    S, I, P = cfg.S, cfg.I, cfg.POSMAX

    def prefix(stage):
        def f(prof_a, d_kmer_tab, rc_code, rc_n_code, codes, regs, lens,
              budgets, readsets):
            B = codes.shape[0]
            pos = jnp.arange(FIXSIZE, dtype=jnp.int32)
            src = lens[:, None] - 1 - pos[None, :]
            src_c = jnp.clip(src, 0, FIXSIZE - 1)
            g_codes = jnp.take_along_axis(codes, src_c, axis=1)
            g_regs = jnp.take_along_axis(regs, src_c, axis=1)
            in_rng = src >= 0
            ccodes = jnp.where(in_rng & (g_regs > 0), rc_code[g_codes],
                               jnp.where(in_rng, rc_n_code.astype(jnp.uint8),
                                         jnp.uint8(0)))
            cregs = jnp.where(in_rng, g_regs, jnp.uint8(0))
            qw = jnp.stack([de._pack(codes), de._pack(ccodes)], axis=1)
            rw = jnp.stack([de._pack(regs), de._pack(cregs)], axis=1)
            if stage == 0:
                return qw.sum() + rw.sum()
            sf = de._seed_array(codes, S, P)
            sc = de._seed_array(ccodes, S, P)
            if stage == 1:
                return sf.sum() + sc.sum()
            acc = jnp.uint32(0)
            seedseg = jnp.minimum((lens - I + 1) // S, budgets + 1)
            seedseg = jnp.maximum(seedseg, 0)
            max_off = (lens - I + 1) % S
            n_i = jnp.arange(MAXSEG, dtype=jnp.int32)
            off_i = jnp.arange(S, dtype=jnp.int32)
            outs = []
            for sarr in (sf, sc):
                rows = d_kmer_tab[sarr]
                o0 = rows[..., 0]; cnt = rows[..., 1]; wc = rows[..., 2]
                cost = jnp.where(cnt > 0, cnt + 2, 0).astype(jnp.uint32)
                if stage == 2:
                    outs.append(cost.sum() + o0.sum().astype(jnp.uint32)
                                + wc.sum().astype(jnp.uint32))
                    continue
                WLEN = MAXSEG * S + I
                cost_p = jnp.zeros((B, WLEN + 1), jnp.uint32)
                cost_p = cost_p.at[:, 1: P + 1].set(cost)
                cs = jnp.cumsum(cost_p, axis=1)
                Ws = cs[:, I:] - cs[:, :-I]
                T = Ws[:, : MAXSEG * S].reshape(B, MAXSEG, S)
                BIGU = jnp.uint32(0xFFFFFFFF)
                seg_mask = (n_i[None, :] < seedseg[:, None])
                tot = jnp.where(seg_mask[:, :, None], T, 0).sum(
                    axis=1, dtype=jnp.uint32)
                off_ok = off_i[None, :] < max_off[:, None]
                tot_m = jnp.where(off_ok, tot, BIGU)
                s_off = jnp.where(max_off > 0,
                                  jnp.argmin(tot_m, axis=1), 0).astype(jnp.int32)
                if stage == 3:
                    outs.append(s_off.sum().astype(jnp.uint32))
                    continue

                def zig_body(it, start_arr):
                    half = it // 2
                    ptr = jnp.where(it % 2 == 0, half, seedseg - 1 - half)
                    active = (it < seedseg)
                    ptr_c = jnp.clip(ptr, 0, MAXSEG - 1).astype(jnp.int32)
                    prev = jnp.take_along_axis(
                        start_arr, jnp.clip(ptr_c - 1, 0, MAXSEG - 1)[:, None],
                        axis=1)[:, 0]
                    nxt = jnp.take_along_axis(
                        start_arr, jnp.clip(ptr_c + 1, 0, MAXSEG - 1)[:, None],
                        axis=1)[:, 0]
                    lo = jnp.where(ptr_c == 0, 0, prev)
                    hi = jnp.where(ptr_c == seedseg - 1, max_off, nxt)
                    costs = jnp.take_along_axis(
                        T, ptr_c[:, None, None], axis=1)[:, 0, :]
                    rng_ok = (off_i[None, :] >= lo[:, None]) & \
                             (off_i[None, :] <= hi[:, None])
                    costs_m = jnp.where(rng_ok, costs, BIGU)
                    best = jnp.argmin(costs_m, axis=1).astype(jnp.int32)
                    onehot = (n_i[None, :] == ptr_c[:, None]) & active[:, None]
                    return jnp.where(onehot, best[:, None], start_arr)

                start_arr = jnp.broadcast_to(s_off[:, None], (B, MAXSEG))
                start_arr = jax.lax.fori_loop(0, MAXSEG, zig_body, start_arr)
                if stage == 4:
                    outs.append(start_arr.sum().astype(jnp.uint32))
                    continue
                cost_n = jnp.take_along_axis(T, start_arr[:, :, None],
                                             axis=2)[:, :, 0]
                cost_s = cost_n ^ jnp.uint32(0x80000000)
                key_hi = jnp.where(seg_mask, cost_s, BIGU)
                order = jnp.argsort(key_hi, axis=1, stable=True).astype(jnp.int32)
                if stage == 5:
                    outs.append(order.sum().astype(jnp.uint32))
                    continue
                outs.append((start_arr, order, o0, cnt, wc))
            if stage <= 5:
                return sum(outs)
            # stage 6: slot grid + final cumsum
            (start_f, order_f, o0_f, cnt_f, wc_f) = outs[0]
            (start_c, order_c, o0_c, cnt_c, wc_c) = outs[1]
            slot_rank = jnp.repeat(n_i, 2 * I)
            slot_chain = jnp.tile(jnp.repeat(jnp.arange(2, dtype=jnp.int32), I),
                                  MAXSEG)
            slot_phase = jnp.tile(jnp.arange(I, dtype=jnp.int32), 2 * MAXSEG)
            flag_f = (readsets < 2) | bool(cfg.chains)
            flag_c = (readsets == 2) | bool(cfg.chains)

            def slot_desc(start_arr, order, o0_p, cnt_p, wc_p):
                mode = order[:, slot_rank]
                a = prof_a[mode, slot_phase[None, :]]
                st = jnp.take_along_axis(start_arr, mode, axis=1)
                k = a + st - slot_phase[None, :]
                k_c = jnp.clip(k, 0, P - 1)
                h = -a + slot_phase[None, :] - st
                return (jnp.take_along_axis(o0_p, k_c, axis=1),
                        jnp.take_along_axis(cnt_p, k_c, axis=1),
                        jnp.take_along_axis(wc_p, k_c, axis=1), h)

            o0f, cntf, wcf, hf = slot_desc(start_f, order_f, o0_f, cnt_f, wc_f)
            o0c, cntc, wcc, hc = slot_desc(start_c, order_c, o0_c, cnt_c, wc_c)
            is_c = (slot_chain[None, :] == 1)
            off0 = jnp.where(is_c, o0c, o0f)
            cnt = jnp.where(is_c, cntc, cntf)
            h = jnp.where(is_c, hc, hf)
            chain_ok = jnp.where(is_c, flag_c[:, None], flag_f[:, None])
            valid = chain_ok & (slot_rank[None, :] < seedseg[:, None])
            cnt = jnp.where(valid, cnt, 0)
            cum = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32),
                 jnp.cumsum(cnt, axis=1, dtype=jnp.int32)], axis=1)
            totals = cum[:, -1]
            read_cum = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(totals, dtype=jnp.int32)])
            return (off0.sum() + h.sum() + read_cum[-1]).astype(jnp.uint32)
        return jax.jit(f)

    args = (eng.prof_a, eng.d_kmer_tab, eng.rc_code, eng.rc_n_code,
            c_, r_, l_, b_, s_)
    names = ["pack+rc", "seed_arrays", "+tab gather", "+window sums",
             "+zigzag", "+argsort16", "full stage1"]
    for st in range(7):
        dt = bench(prefix(st), args)
        print(f"stage<= {st} ({names[st]:>13}): {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
