"""Ablate the fused kernel: time cumulative prefixes (stage1, +verify-math,
full) with pipelined dispatches to locate the hot section."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

BENCH_DIR = os.environ.get("BSMAP_TPU_BENCH_DIR", "/tmp/bsmap_tpu_bench")


def main():
    from tools.genreads import generate
    gpath, rpath = generate(BENCH_DIR, n_reads=200_000)
    from bsmap_tpu.params import Param
    from bsmap_tpu.reference import load_genome
    from bsmap_tpu.index import (build_index, index_cache_key, load_index,
                                 save_index)
    from bsmap_tpu.readio import open_read_stream
    from bsmap_tpu.utils import myrand_hash
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
    codes, regs, lens, buds, rsets, ridx = eng._pack_host(
        batch, live_idx, budgets)
    rand32 = myrand_hash(ridx, p.randseed)
    cfg = eng._cfg("f")
    CANDS = eng.CANDS
    sel = np.arange(min(len(live_idx), eng.B))
    packed = eng._pad_window((codes, regs, lens, buds, rand32), sel)
    c_, r_, l_, b_, rnd, mrk = (jnp.asarray(a) for a in de._unpack_inputs(
        jnp.asarray(packed)))

    def stage1_only(prof_a, d_kmer_tab, rc_code, rc_n_code, codes, regs,
                    lens, budgets, maxrank):
        outs = de._schedule_impl(cfg, prof_a, d_kmer_tab, rc_code, rc_n_code,
                                 codes, regs, lens, budgets, maxrank)
        return sum(o.sum().astype(jnp.uint32) if o.dtype != jnp.uint32
                   else o.sum() for o in outs[2:])

    def upto_wmm(prof_a, d_kmer_tab, rc_code, rc_n_code, d_catcat, d_anchors,
                 d_sizes, d_rcoff, d_wlocs, d_clocs, codes, regs, lens,
                 budgets, rand32, maxrank):
        (qw, rw, h, off0, off3, wcnt, cnt, wantv, s_off,
         c_off, _ftot) = de._schedule_impl(
            cfg, prof_a, d_kmer_tab, rc_code, rc_n_code, codes, regs, lens,
            budgets, maxrank)
        B = qw.shape[0]
        W, NB, nch, I, MS = cfg.W, cfg.NB, cfg.nch, cfg.I, cfg.maxseg
        sidx = jnp.arange(CANDS, dtype=jnp.int32)
        cnt_flat = jnp.minimum(cnt.reshape(-1), de.SATLIM).astype(jnp.uint32)
        gcum_i = de._satadd_scan(cnt_flat)
        starts = jnp.concatenate([jnp.zeros(1, jnp.uint32),
                                  gcum_i[:-1]]).astype(jnp.int32)
        total_all = gcum_i[-1].astype(jnp.int32)
        slot_ids = jnp.arange(B * NB, dtype=jnp.int32)
        tgt = jnp.where((cnt_flat > 0) & (starts < CANDS), starts, CANDS)
        fid0 = jnp.full((CANDS + 1,), -1, jnp.int32).at[tgt].max(slot_ids)
        fid = jax.lax.associative_scan(jnp.maximum, fid0[:CANDS])
        fid = jnp.clip(fid, 0, B * NB - 1)
        rid = fid // NB
        e = sidx - de._g1(starts, fid)
        g_off0 = de._g1(off0, fid)
        g_wc = de._g1(wcnt, fid)
        g_h = de._g1(h, fid)
        crick = e >= g_wc
        g_off3 = de._g1(off3, fid)
        w_entry = de._g1(d_wlocs, jnp.clip(g_off0 + e, 0,
                                           d_wlocs.shape[0] - 1))
        c_entry = de._g1(d_clocs, jnp.clip(g_off3 + (e - g_wc), 0,
                                           d_clocs.shape[0] - 1))
        entry = jnp.where(crick, c_entry, w_entry)
        g = entry + g_h.astype(jnp.uint32)
        wbase = (g >> 4).astype(jnp.int32) + jnp.where(crick,
                                                       jnp.int32(W), 0)
        wbase = jnp.clip(wbase, 0, 2 * W - de.FIXELEMENT - 1)
        words = jnp.stack([de._g1(d_catcat, wbase + k)
                           for k in range(de.FIXELEMENT + 1)], axis=1)
        z = (g & 15).astype(jnp.uint32)
        sl = (z * 2)[:, None]
        w_lo = words[:, :de.FIXELEMENT] << sl
        w_hi = words[:, 1:] >> (jnp.uint32(32) - sl)
        sref = jnp.where(sl == 0, words[:, :de.FIXELEMENT], w_lo | w_hi)
        qrow = rid * nch
        q = de._rowg(qw.reshape(B * nch, de.FIXELEMENT), qrow)
        r = de._rowg(rw.reshape(B * nch, de.FIXELEMENT), qrow)
        xc = ((~sref) << jnp.uint32(1)) | sref | jnp.uint32(0x55555555)
        x = ((q & xc) ^ sref) & r
        lanes = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
        wmm = jax.lax.population_count(lanes).sum(axis=-1).astype(jnp.int32)
        return wmm.sum() + total_all

    args1 = (eng.prof_a, eng.d_kmer_tab, eng.rc_code, eng.rc_n_code,
             c_, r_, l_, b_, mrk)
    args2 = (eng.prof_a, eng.d_kmer_tab, eng.rc_code, eng.rc_n_code,
             eng.d_catcat, eng.d_anchors, eng.d_sizes, eng.d_rcoff,
             eng.d_wlocs, eng.d_clocs, c_, r_, l_, b_, rnd, mrk)

    for name, fn, args in [("stage1", jax.jit(stage1_only), args1),
                           ("upto_wmm", jax.jit(upto_wmm), args2)]:
        out = fn(*args); out.block_until_ready()
        t0 = time.time()
        outs = [fn(*args) for _ in range(8)]
        for o in outs:
            o.block_until_ready()
        dt = (time.time() - t0) / 8
        print(f"{name}: {dt*1e3:8.1f} ms/dispatch", flush=True)

    full = lambda: eng._dispatch(cfg, eng._pad_window(
        (codes, regs, lens, buds, rand32), sel))
    out = full(); out.block_until_ready()
    t0 = time.time()
    outs = [full() for _ in range(8)]
    for o in outs:
        o.block_until_ready()
    dt = (time.time() - t0) / 8
    print(f"full: {dt*1e3:8.1f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
