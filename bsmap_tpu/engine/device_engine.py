"""Vectorized JAX alignment engine — the TPU-native fast path.

Design (TPU-first rather than a port of align.cpp):

  * The genome lives on device as one uint32 array ``catcat`` =
    refcat ++ crefcat (2-bit packed, 16 bases/word) plus the CSR seed index
    (offsets / Watson-counts / entry coordinates).  All large arrays are
    passed to the jitted kernels as runtime buffers (never closed over as
    constants — the compiled program must stay small).
  * A batch of reads becomes fixed-shape arrays: 2-bit packed read words at
    phase 0 for both chains, per-read lengths/budgets.  Instead of the
    reference's 16-phase read shifting (align.cpp:82-87), candidate reference
    windows are gathered and phase-aligned with two shifts — the mismatch
    lanes come out identical.
  * Seed scheduling (ReorderSeed/AdjustSeedStartArray, align.cpp:454-577)
    is computed for all reads at once from a (reads x segments x offsets)
    bucket-cost table.
  * Candidate enumeration lays every read's bucket entries into a fixed
    (reads x C) slot grid in exact reference discovery order (segment rank
    major, then read chain, then interval phase, then bucket entry), so
    dedup-by-first-occurrence and multi-hit selection reproduce the
    sequential semantics.
  * Verification is a batched bitwise XOR/popcount over
    (reads x candidates x 10 words) — the CountMismatch kernel
    (align.h:167-200) as pure VPU lane math.
  * The progressive-sensitivity early exit (align.cpp:445-449) is recast as
    a per-read prefix-min over segment ranks; acceptance is masked to ranks
    <= the stopping rank.

Exactness: the fast path assumes a static mismatch threshold (no bucket-cap
tightening) and no -r 0 abort.  Reads where those sequential semantics could
change anything are detected (level count >= max_num_hits, slot-capacity
overflow, -r 0 multi-hits) and replayed on the exact host engine — a tiny
fraction of reads, preserving bit parity at batch throughput.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..index import SeedIndex
from ..params import (FIXELEMENT, FIXSIZE, MAXSNPS, Param, REG_ALPHABET,
                      REV_CHAR, SEGLEN)
from ..readio import Read
from ..reference import PackedGenome
from ..trim import filter_read
from .host_engine import HostEngine, SEResult

MAXSEG = MAXSNPS + 1          # max seed segments per read
DEV_BATCH = 4096              # reads per device dispatch
CAP_CLASSES = (256, 1024, 4096, 16384)  # candidate-slot capacities
BIGLEVEL = 99


class EngineUnsupported(ImportError):
    """Raised when the device fast path cannot handle this configuration;
    callers fall back to the exact host engine."""


class Cfg(NamedTuple):
    """Static (compile-time) configuration of the kernels."""

    S: int
    I: int
    NB: int
    SEEDPOS: int
    chains: int
    max_num_hits: int
    report_repeat_hits: int
    randseed: int
    W: int                 # words per catcat half
    n_chr: int


# ---------------------------------------------------------------------------
# jitted kernels (pure functions; big arrays are runtime args)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _schedule_kernel(cfg: Cfg, prof_a, d_offsets, d_wcounts, rc_code,
                     codes, regs, lens, budgets, readsets, rc_n_code):
    p_chains = bool(cfg.chains)
    B = codes.shape[0]
    S, I = cfg.S, cfg.I
    SEEDPOS = cfg.SEEDPOS
    pos = jnp.arange(FIXSIZE, dtype=jnp.int32)

    # --- reverse-complement chain (ConvertBinaySeq align.cpp:131-161) -------
    src = lens[:, None] - 1 - pos[None, :]
    src_c = jnp.clip(src, 0, FIXSIZE - 1)
    g_codes = jnp.take_along_axis(codes, src_c, axis=1)
    g_regs = jnp.take_along_axis(regs, src_c, axis=1)
    in_rng = src >= 0
    ccodes = jnp.where(in_rng & (g_regs > 0), rc_code[g_codes],
                       jnp.where(in_rng, rc_n_code.astype(jnp.uint8),
                                 jnp.uint8(0)))
    cregs = jnp.where(in_rng, g_regs, jnp.uint8(0))

    qw = jnp.stack([_pack(codes), _pack(ccodes)], axis=1)
    rw = jnp.stack([_pack(regs), _pack(cregs)], axis=1)

    sf = _seed_array(codes, S, SEEDPOS)
    sc = _seed_array(ccodes, S, SEEDPOS)

    seedseg = jnp.minimum((lens - I + 1) // S, budgets + 1)
    seedseg = jnp.maximum(seedseg, 0)
    max_off = (lens - I + 1) % S

    flag_f = (readsets < 2) | p_chains
    flag_c = (readsets == 2) | p_chains

    n_i = jnp.arange(MAXSEG, dtype=jnp.int32)
    off_i = jnp.arange(S, dtype=jnp.int32)
    ph_i = jnp.arange(I, dtype=jnp.int32)

    def chain_schedule(sarr):
        # cost table T[b, n, off] = CountSeeds(n, off) (align.cpp:549-556)
        idx = (prof_a[:, None, :] + off_i[None, :, None]
               - ph_i[None, None, :])
        idx_c = jnp.clip(idx, 0, SEEDPOS - 1)
        sv = sarr[:, idx_c]                       # (B, 16, S, I)
        c = d_offsets[sv + 1] - d_offsets[sv]
        # reference cost includes the +2 CSR header slots (dbseq.cpp:381)
        c = jnp.where(c > 0, c + 2, 0)
        T = c.sum(axis=-1).astype(jnp.int64)      # (B, 16, S)

        seg_mask = (n_i[None, :] < seedseg[:, None])
        tot = jnp.where(seg_mask[:, :, None], T, 0).sum(axis=1)
        off_ok = off_i[None, :] < max_off[:, None]
        tot_m = jnp.where(off_ok, tot, jnp.int64(1) << 60)
        s_off = jnp.where(max_off > 0,
                          jnp.argmin(tot_m, axis=1), 0).astype(jnp.int32)

        # zig-zag per-segment refinement (align.cpp:506-547)
        start_arr = jnp.broadcast_to(s_off[:, None], (B, MAXSEG))
        for it in range(MAXSEG):
            ptr = jnp.where(it % 2 == 0, it // 2,
                            seedseg - 1 - it // 2).astype(jnp.int32)
            active = (it < seedseg)
            ptr_c = jnp.clip(ptr, 0, MAXSEG - 1)
            prev = jnp.take_along_axis(
                start_arr, jnp.clip(ptr_c - 1, 0, MAXSEG - 1)[:, None],
                axis=1)[:, 0]
            nxt = jnp.take_along_axis(
                start_arr, jnp.clip(ptr_c + 1, 0, MAXSEG - 1)[:, None],
                axis=1)[:, 0]
            lo = jnp.where(ptr_c == 0, 0, prev)
            hi = jnp.where(ptr_c == seedseg - 1, max_off, nxt)
            costs = jnp.take_along_axis(
                T, ptr_c[:, None, None], axis=1)[:, 0, :]   # (B, S)
            rng_ok = (off_i[None, :] >= lo[:, None]) & \
                     (off_i[None, :] <= hi[:, None])
            costs_m = jnp.where(rng_ok, costs, jnp.int64(1) << 60)
            best = jnp.argmin(costs_m, axis=1).astype(jnp.int32)
            onehot = (n_i[None, :] == ptr_c[:, None]) & active[:, None]
            start_arr = jnp.where(onehot, best[:, None], start_arr)

        # segment ordering by bucket cost (seedindex, align.cpp:471-503)
        cost_n = jnp.take_along_axis(T, start_arr[:, :, None],
                                     axis=2)[:, :, 0]        # (B, 16)
        key = jnp.where(seg_mask, cost_n * 32 + n_i[None, :],
                        (jnp.int64(1) << 60) + n_i[None, :])
        order = (jnp.sort(key, axis=1) % 32).astype(jnp.int32)
        return start_arr, order

    start_f, order_f = chain_schedule(sf)
    start_c, order_c = chain_schedule(sc)

    # --- slot grid in discovery order: (rank, chain, phase) -----------------
    slot_rank = jnp.repeat(n_i, 2 * I)                       # (NB,)
    slot_chain = jnp.tile(jnp.repeat(jnp.arange(2, dtype=jnp.int32), I),
                          MAXSEG)
    slot_phase = jnp.tile(ph_i, 2 * MAXSEG)

    def slot_desc(start_arr, order, sarr):
        mode = order[:, slot_rank]                           # (B, NB)
        a = prof_a[mode, slot_phase[None, :]]
        st = jnp.take_along_axis(start_arr, mode, axis=1)
        k = a + st - slot_phase[None, :]
        k_c = jnp.clip(k, 0, SEEDPOS - 1)
        sv = jnp.take_along_axis(sarr, k_c, axis=1)
        h = -a + slot_phase[None, :] - st
        return sv, h

    sv_f, h_f = slot_desc(start_f, order_f, sf)
    sv_c, h_c = slot_desc(start_c, order_c, sc)
    sv = jnp.where(slot_chain[None, :] == 0, sv_f, sv_c)
    h = jnp.where(slot_chain[None, :] == 0, h_f, h_c)

    chain_ok = jnp.where(slot_chain[None, :] == 0, flag_f[:, None],
                         flag_c[:, None])
    valid = chain_ok & (slot_rank[None, :] < seedseg[:, None])
    off0 = d_offsets[sv]
    cnt = jnp.where(valid, d_offsets[sv + 1] - off0, 0)
    wcnt = d_wcounts[sv]
    cum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.cumsum(cnt, axis=1, dtype=jnp.int32)], axis=1)
    totals = cum[:, -1]
    return (qw, rw, h, off0, wcnt, cum, totals, slot_chain, slot_rank)


@functools.partial(jax.jit, static_argnames=("cfg", "C"))
def _verify_kernel(cfg: Cfg, C: int, d_catcat, d_anchors, d_sizes, d_rcoff,
                   d_locs, qw, rw, lens, budgets, read_idx,
                   h, off0, wcnt, cum, totals, slot_chain, slot_rank):
    B = qw.shape[0]
    W = cfg.W
    NB = cfg.NB
    slot = jnp.arange(C, dtype=jnp.int32)

    b = jax.vmap(lambda cu, q: jnp.searchsorted(cu, q, side="right"))(
        cum, jnp.broadcast_to(slot[None, :], (B, C))) - 1
    b = jnp.clip(b, 0, NB - 1)
    in_total = slot[None, :] < totals[:, None]
    e = slot[None, :] - jnp.take_along_axis(cum, b, axis=1)
    g_off0 = jnp.take_along_axis(off0, b, axis=1)
    g_wc = jnp.take_along_axis(wcnt, b, axis=1)
    g_h = jnp.take_along_axis(h, b, axis=1)
    chain = jnp.take_along_axis(
        jnp.broadcast_to(slot_chain[None, :], (B, NB)), b, axis=1)
    rank = jnp.take_along_axis(
        jnp.broadcast_to(slot_rank[None, :], (B, NB)), b, axis=1)

    entry = d_locs[jnp.clip(g_off0 + e, 0, d_locs.shape[0] - 1)]
    crick = e >= g_wc
    g = entry + g_h                                   # (B, C) int32

    # --- gather + phase-align the reference windows -------------------------
    wbase = (g >> 4) + jnp.where(crick, jnp.int32(W), 0)
    kk = jnp.arange(FIXELEMENT + 1, dtype=jnp.int32)
    widx = jnp.clip(wbase[:, :, None] + kk[None, None, :], 0, 2 * W - 1)
    words = d_catcat[widx]                            # (B, C, 11) u32
    z = (g & 15).astype(jnp.uint32)
    sl = (z * 2)[:, :, None]
    w_lo = words[:, :, :FIXELEMENT] << sl
    w_hi = words[:, :, 1:] >> (jnp.uint32(32) - sl)
    sref = jnp.where(sl == 0, words[:, :, :FIXELEMENT], w_lo | w_hi)

    # --- CountMismatch lanes (align.h:167-200) ------------------------------
    q = qw[jnp.arange(B)[:, None], chain]              # (B, C, 10)
    r = rw[jnp.arange(B)[:, None], chain]
    xc = ((~sref) << jnp.uint32(1)) | sref | jnp.uint32(0x55555555)
    x = ((q & xc) ^ sref) & r
    lanes = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
    wmm = jax.lax.population_count(lanes).sum(axis=-1).astype(jnp.int32)

    # --- coordinate transform + bounds (align.cpp:271-291) ------------------
    c = jnp.clip(jnp.searchsorted(d_anchors, g.ravel(),
                                  side="right").reshape(B, C) - 1,
                 0, cfg.n_chr - 1).astype(jnp.int32)
    loc_local = g - d_anchors[c]
    wloc = jnp.where(crick, d_rcoff[c] - lens[:, None] - loc_local,
                     loc_local)
    in_bounds = (wloc >= 0) & (wloc + lens[:, None] <= d_sizes[c])

    eligible = in_total & in_bounds & (wmm <= budgets[:, None])

    # --- dedup by (chr, watson_loc), first discovery wins -------------------
    key = (c.astype(jnp.int64) << 32) | wloc.astype(jnp.int64)
    skey = jnp.where(eligible, key * C + slot[None, :],
                     (jnp.int64(1) << 62) + slot[None, :])
    perm = jnp.argsort(skey, axis=1)
    sk_sorted = jnp.take_along_axis(skey, perm, axis=1)
    kpart = sk_sorted // C
    first_sorted = jnp.concatenate(
        [jnp.ones((B, 1), bool), kpart[:, 1:] != kpart[:, :-1]], axis=1)
    inv = jnp.argsort(perm, axis=1)
    first = jnp.take_along_axis(first_sorted, inv, axis=1)
    acc_pre = eligible & first

    # --- progressive-sensitivity early exit (align.cpp:445-449) -------------
    lev = jnp.where(acc_pre, wmm, BIGLEVEL)
    r_i = jnp.arange(MAXSEG, dtype=jnp.int32)
    minw_rank = jnp.stack(
        [jnp.min(jnp.where(rank == rr, lev, BIGLEVEL), axis=1)
         for rr in range(MAXSEG)], axis=1)             # (B, 16)
    prefmin = jax.lax.associative_scan(jnp.minimum, minw_rank, axis=1)
    stopped = prefmin <= r_i[None, :]
    any_stop = stopped.any(axis=1)
    s_star = jnp.where(any_stop, jnp.argmax(stopped, axis=1), MAXSEG - 1)
    accepted = acc_pre & (rank <= s_star[:, None])

    # --- per-level/chain counts ---------------------------------------------
    counts = jnp.stack(
        [jnp.stack(
            [jnp.sum(accepted & (wmm == lv) & (chain == ch), axis=1)
             for ch in range(2)], axis=1)
         for lv in range(MAXSEG)], axis=1).astype(jnp.int32)  # (B,16,2)

    lev_sums = counts.sum(axis=2)                      # (B, 16)
    found = lev_sums.sum(axis=1) > 0
    ii = jnp.argmax(lev_sums > 0, axis=1).astype(jnp.int32)
    ssum = jnp.take_along_axis(lev_sums, ii[:, None], axis=1)[:, 0]

    # --- replay detection ----------------------------------------------------
    replay = (totals > C) | (lev_sums >= cfg.max_num_hits).any(axis=1)
    if cfg.report_repeat_hits == 0:
        replay = replay | (found & (ssum > 1))

    # --- reproducible multi-hit selection (align.cpp:623-625) ---------------
    j = (_myrand_hash_jnp(read_idx, cfg.randseed)
         % jnp.maximum(ssum, 1).astype(jnp.uint32)).astype(jnp.int32)
    nfwd = jnp.take_along_axis(counts[:, :, 0], ii[:, None], axis=1)[:, 0]
    sel_chain = (j >= nfwd).astype(jnp.int32)
    target = jnp.where(sel_chain == 1, j - nfwd, j) + 1
    ind = accepted & (wmm == ii[:, None]) & (chain == sel_chain[:, None])
    rk = jnp.cumsum(ind, axis=1)
    sel = ind & (rk == target[:, None])
    sslot = jnp.argmax(sel, axis=1)[:, None]
    sel_chrp = (2 * jnp.take_along_axis(c, sslot, axis=1)
                + jnp.take_along_axis(crick, sslot, axis=1))[:, 0]
    sel_wloc = jnp.take_along_axis(wloc, sslot, axis=1)[:, 0]

    # first level-0 forward hit (hits[0][0] slot leak, see output/sam.py)
    ind0 = accepted & (wmm == 0) & (chain == 0)
    h00_found = ind0.any(axis=1)
    h00s = jnp.argmax(ind0, axis=1)[:, None]
    h00_chrp = (2 * jnp.take_along_axis(c, h00s, axis=1)
                + jnp.take_along_axis(crick, h00s, axis=1))[:, 0]
    h00_wloc = jnp.take_along_axis(wloc, h00s, axis=1)[:, 0]

    return (counts, found, ii, ssum, sel_chain, sel_chrp, sel_wloc,
            h00_found, h00_chrp, h00_wloc, replay)


def _pack(codes):
    """(B, FIXSIZE) uint8 codes -> (B, FIXELEMENT) uint32, first base in the
    top bits of each word (dbseq.cpp:71-75 layout)."""
    B = codes.shape[0]
    lanes = codes.reshape(B, FIXELEMENT, SEGLEN).astype(jnp.uint32)
    shifts = jnp.arange(SEGLEN - 1, -1, -1, dtype=jnp.uint32) * 2
    return (lanes << shifts[None, None, :]).sum(axis=-1).astype(jnp.uint32)


def _seed_array(codes, S, SEEDPOS):
    """Base-3 collapsed seed value at every read offset (align.cpp:97-105)."""
    col = jnp.where(codes == 3, jnp.uint8(1), codes).astype(jnp.int32)
    acc = jnp.zeros(codes.shape[:1] + (SEEDPOS,), dtype=jnp.int32)
    for k in range(S):
        acc = acc * 3 + col[:, k: k + SEEDPOS]
    return acc


def _myrand_hash_jnp(read_idx, randseed: int):
    """utilities.cpp:40-50 xorshift hash on device (uint64, x64 enabled)."""
    v = (read_idx.astype(jnp.uint64) + jnp.uint64(randseed * 1000000))
    v = v * jnp.uint64(3935559000370003845) + jnp.uint64(2691343689449507681)
    v = v ^ (v >> jnp.uint64(21))
    v = v ^ (v << jnp.uint64(37))
    v = v ^ (v >> jnp.uint64(4))
    v = v * jnp.uint64(4768777513237032717)
    v = v ^ (v << jnp.uint64(20))
    v = v ^ (v >> jnp.uint64(41))
    v = v ^ (v << jnp.uint64(5))
    return (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# engine front-end
# ---------------------------------------------------------------------------

class DeviceEngine:
    def __init__(self, genome: PackedGenome, index: SeedIndex, param: Param):
        if param.RRBS_flag:
            raise EngineUnsupported("device engine: RRBS handled by host "
                                    "engine in this version")
        if param.randseed == 0:
            raise EngineUnsupported("device engine needs -S != 0 "
                                    "(stateless reproducible selection)")
        self.genome = genome
        self.index = index
        self.param = param
        if param.profile is None:
            param.init_mapping()
        self.host = HostEngine(genome, index, param)  # exact replay path

        W = len(genome.refcat)
        if int(genome.anchors[-1]) >= 2 ** 31:
            raise EngineUnsupported("genome too large for int32 coordinates;"
                                    " shard it across devices")
        self.cfg = Cfg(S=param.seed_size, I=param.index_interval,
                       NB=MAXSEG * 2 * param.index_interval,
                       SEEDPOS=FIXSIZE - param.seed_size + 1,
                       chains=param.chains,
                       max_num_hits=param.max_num_hits,
                       report_repeat_hits=param.report_repeat_hits,
                       randseed=param.randseed, W=W, n_chr=genome.n_chr)
        dev = jax.devices()[0]
        put = functools.partial(jax.device_put, device=dev)
        self.d_catcat = put(jnp.asarray(
            np.concatenate([genome.refcat, genome.crefcat]),
            dtype=jnp.uint32))
        self.d_anchors = put(jnp.asarray(genome.anchors[:genome.n_chr],
                                         dtype=jnp.int32))
        self.d_sizes = put(jnp.asarray(genome.sizes, dtype=jnp.int32))
        self.d_rcoff = put(jnp.asarray(genome.rc_offsets, dtype=jnp.int32))
        self.d_offsets = put(jnp.asarray(index.offsets, dtype=jnp.int32))
        self.d_wcounts = put(jnp.asarray(index.wcounts, dtype=jnp.int32))
        self.d_locs = put(jnp.asarray(index.locs.astype(np.int64),
                                      dtype=jnp.int32))
        I = param.index_interval
        self.prof_a = put(jnp.asarray(
            [[param.profile[n][i].a for i in range(I)]
             for n in range(MAXSEG)], dtype=jnp.int32))
        rc = [int(param.alphabet[REV_CHAR[ord(param.useful_nt[c])]])
              for c in range(4)]
        self.rc_code = put(jnp.asarray(rc, dtype=jnp.uint8))
        self.rc_n_code = put(jnp.asarray(int(param.rev_alphabet[ord("N")]),
                                         dtype=jnp.uint8))
        self.n_filtered = 0
        self.n_replayed = 0

    # -- batch orchestration -------------------------------------------------

    def align_batch(self, batch: list[Read]):
        p = self.param
        results: list = [None] * len(batch)
        live_idx = []
        budgets = []
        for i, rd in enumerate(batch):
            filtered, budget = filter_read(rd, p)
            if filtered:
                results[i] = SEResult(filtered=True)
                self.n_filtered += 1
            else:
                live_idx.append(i)
                budgets.append(budget)

        for lo in range(0, len(live_idx), DEV_BATCH):
            chunk = live_idx[lo: lo + DEV_BATCH]
            self._align_chunk(batch, chunk,
                              budgets[lo: lo + DEV_BATCH], results)
        return results

    def _align_chunk(self, batch, chunk, budgets, results):
        p = self.param
        n = len(chunk)
        B = DEV_BATCH if n > DEV_BATCH // 2 else _round_pow2(n)
        codes = np.zeros((B, FIXSIZE), dtype=np.uint8)
        regs = np.zeros((B, FIXSIZE), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        buds = np.zeros(B, dtype=np.int32)
        ridx = np.zeros(B, dtype=np.uint64)
        rsets = np.zeros(B, dtype=np.int32)
        for t, i in enumerate(chunk):
            rd = batch[i]
            sb = np.frombuffer(rd.seq.encode("latin1"), dtype=np.uint8)
            L = len(sb)
            codes[t, :L] = p.alphabet[sb]
            regs[t, :L] = REG_ALPHABET[sb]
            lens[t] = L
            buds[t] = budgets[t]
            ridx[t] = rd.index
            rsets[t] = rd.readset

        (qw, rw, h, off0, wcnt, cum, totals, slot_chain, slot_rank) = \
            _schedule_kernel(self.cfg, self.prof_a, self.d_offsets,
                             self.d_wcounts, self.rc_code,
                             jnp.asarray(codes), jnp.asarray(regs),
                             jnp.asarray(lens), jnp.asarray(buds),
                             jnp.asarray(rsets), self.rc_n_code)

        tot_np = np.asarray(totals)
        C = CAP_CLASSES[-1]
        for cc in CAP_CLASSES:
            if tot_np[:n].max(initial=0) <= cc:
                C = cc
                break

        out = _verify_kernel(self.cfg, C, self.d_catcat, self.d_anchors,
                             self.d_sizes, self.d_rcoff, self.d_locs,
                             qw, rw, jnp.asarray(lens), jnp.asarray(buds),
                             jnp.asarray(ridx), h, off0, wcnt, cum,
                             totals, slot_chain, slot_rank)
        (counts, found, ii, ssum, sel_chain, sel_chrp, sel_wloc,
         h00_found, h00_chrp, h00_wloc, replay) = [np.asarray(x) for x in out]

        for t, i in enumerate(chunk):
            if replay[t]:
                results[i] = self.host.run_align(batch[i], budgets[t])
                self.n_replayed += 1
            else:
                results[i] = DeviceView(
                    counts[t], int(buds[t]), bool(found[t]), int(ii[t]),
                    int(ssum[t]), int(sel_chain[t]),
                    (int(sel_chrp[t]), int(sel_wloc[t])),
                    bool(h00_found[t]), (int(h00_chrp[t]), int(h00_wloc[t])))

    def format_batch(self, batch: list[Read], fmt) -> str:
        results = self.align_batch(batch)
        out = []
        for rd, res in zip(batch, results):
            if isinstance(res, DeviceView):
                out.append(fmt.emit_device(rd, res))
            else:
                out.append(fmt.string_align(rd, res))
        return "".join(out)


class DeviceView:
    """Per-read result of the device fast path, duck-typing the fields the
    output formatter needs (SEResult-compatible subset + preselected hit)."""

    filtered = False

    def __init__(self, counts, budget, found, level, ssum, chain, hit,
                 h00_found, h00):
        self.n_hit = counts[:, 0]
        self.n_chit = counts[:, 1]
        self.read_max_snp_num = budget
        self.found = found
        self.level = level
        self.ssum = ssum
        self.chain = chain
        self.hit = hit
        self.h00_found = h00_found
        self.h00 = h00


def _round_pow2(n: int) -> int:
    b = 64
    while b < n:
        b *= 2
    return b
