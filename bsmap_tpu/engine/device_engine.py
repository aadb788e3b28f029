"""Vectorized JAX alignment engine — the TPU-native fast path.

Design (TPU-first rather than a port of align.cpp):

  * The genome lives on device as one uint32 array ``catcat`` =
    refcat ++ crefcat (2-bit packed, 16 bases/word) plus the CSR seed index.
    All large arrays are runtime buffers (never baked into the program).
  * Stage 1 (read axis): pack both read chains, compute per-position seed
    values and bucket costs, and run the full seed schedule
    (ReorderSeed/AdjustSeedStartArray/seedindex, align.cpp:454-577).  The
    reference's CountSeeds sums turn out to be *sliding-window sums* of the
    per-position bucket costs (the probed positions for segment n are the
    I consecutive offsets [n*S, n*S+I)), so the whole cost table is two
    cumsums — no gathers.
  * Stage 2 (candidate axis): all reads' bucket entries are laid out on one
    global candidate axis (total work proportional to the actual number of
    candidate loci, load-balanced across the power-law bucket sizes), in
    exact reference discovery order (read, segment rank, chain, phase,
    bucket entry).  Each candidate gathers its 11 reference words, gets
    phase-aligned with two shifts, and is scored by the bitwise XOR/popcount
    CountMismatch lane math (align.h:167-200).  Dedup, the
    progressive-sensitivity early exit (align.cpp:445-449), per-level
    counts and reproducible multi-hit selection are sort/scan/scatter ops
    on the candidate axis.

Exactness: the fast path assumes a static mismatch threshold (no bucket-cap
tightening) and no -r 0 abort.  Reads where those sequential semantics could
change anything are detected (level count >= max_num_hits, candidate
overflow, -r 0 multi-hits) and replayed on the exact host engine — a tiny
fraction, preserving bit parity at batch throughput.
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

import os as _os

# Persistent XLA compilation cache: the fused aligner compiles once per
# (shape-class, config) and is reused across processes — first-run compile
# on TPU is tens of seconds, cached runs start instantly.
if not jax.config.jax_compilation_cache_dir:
    _cache = _os.environ.get(
        "BSMAP_TPU_XLA_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "bsmap_tpu",
                      "xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

MAXSEG = MAXSNPS + 1          # max seed segments per read
# reads per device dispatch / candidate capacity per dispatch (fixed shapes:
# one compiled program, no mid-chunk host sync); env-overridable so CPU test
# runs can use small, fast-to-compile shapes.
DEV_BATCH = int(_os.environ.get("BSMAP_TPU_DEV_BATCH", 16384))
CANDS_FIXED = int(_os.environ.get("BSMAP_TPU_CANDS", 1 << 17))
BIGLEVEL = 99


class EngineUnsupported(ImportError):
    """Raised when the device fast path cannot handle this configuration;
    callers fall back to the exact host engine."""


class Cfg(NamedTuple):
    """Static (compile-time) configuration of the kernels."""

    S: int
    I: int
    NB: int
    POSMAX: int            # seed positions considered (<= FIXSIZE - S + 1)
    chains: int
    max_num_hits: int
    report_repeat_hits: int
    randseed: int
    W: int                 # words per catcat half
    n_chr: int


# ---------------------------------------------------------------------------
# stage 1: read-axis pack + schedule
# ---------------------------------------------------------------------------

def _schedule_kernel_impl(cfg: Cfg, prof_a, d_kmer_tab, rc_code,
                          rc_n_code, codes, regs, lens, budgets, readsets):
    B = codes.shape[0]
    S, I, P = cfg.S, cfg.I, cfg.POSMAX
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

    sf = _seed_array(codes, S, P)           # (B, P) int32 seed values
    sc = _seed_array(ccodes, S, P)

    seedseg = jnp.minimum((lens - I + 1) // S, budgets + 1)
    seedseg = jnp.maximum(seedseg, 0)
    max_off = (lens - I + 1) % S

    flag_f = (readsets < 2) | bool(cfg.chains)
    flag_c = (readsets == 2) | bool(cfg.chains)

    n_i = jnp.arange(MAXSEG, dtype=jnp.int32)
    off_i = jnp.arange(S, dtype=jnp.int32)

    def chain_schedule(sarr):
        # per-position bucket data: the only random-access gathers of stage 1
        # (one 16-byte row per position: offset/count/wcount packed together)
        rows = d_kmer_tab[sarr]              # (B, P, 4) int32
        o0 = rows[..., 0]
        cnt = rows[..., 1]
        wc = rows[..., 2]
        # reference cost includes the +2 CSR header slots (dbseq.cpp:381).
        # All cost sums are WRAPPING uint32 like the reference's bit32_t
        # totals (align.cpp:455,507) — also keeps the TPU program int64-free.
        cost = jnp.where(cnt > 0, cnt + 2, 0).astype(jnp.uint32)

        # CountSeeds(n, off) = sum of cost over positions [n*S+off,
        # n*S+off+I): a sliding-window sum (see module docstring).
        WLEN = MAXSEG * S + I
        cost_p = jnp.zeros((B, WLEN + 1), jnp.uint32)
        cost_p = cost_p.at[:, 1: P + 1].set(cost)
        cs = jnp.cumsum(cost_p, axis=1)
        Ws = cs[:, I:] - cs[:, :-I]          # (B, MAXSEG*S); W[k]=sum k..k+I-1
        T = Ws[:, : MAXSEG * S].reshape(B, MAXSEG, S)

        BIGU = jnp.uint32(0xFFFFFFFF)
        seg_mask = (n_i[None, :] < seedseg[:, None])
        tot = jnp.where(seg_mask[:, :, None], T, 0).sum(axis=1,
                                                        dtype=jnp.uint32)
        off_ok = off_i[None, :] < max_off[:, None]
        tot_m = jnp.where(off_ok, tot, BIGU)
        s_off = jnp.where(max_off > 0,
                          jnp.argmin(tot_m, axis=1), 0).astype(jnp.int32)

        # zig-zag per-segment refinement (align.cpp:506-547)
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
                T, ptr_c[:, None, None], axis=1)[:, 0, :]   # (B, S)
            rng_ok = (off_i[None, :] >= lo[:, None]) & \
                     (off_i[None, :] <= hi[:, None])
            costs_m = jnp.where(rng_ok, costs, BIGU)
            best = jnp.argmin(costs_m, axis=1).astype(jnp.int32)
            onehot = (n_i[None, :] == ptr_c[:, None]) & active[:, None]
            return jnp.where(onehot, best[:, None], start_arr)

        start_arr = jnp.broadcast_to(s_off[:, None], (B, MAXSEG))
        start_arr = jax.lax.fori_loop(0, MAXSEG, zig_body, start_arr)

        # segment ordering by bucket cost (seedindex, align.cpp:471-503).
        # std::sort on pair<int,int>: cost compared as SIGNED int, ties by
        # segment id.  Two-key sort without int64: sort (cost, n) packed as
        # (cost^sign-flip) * 32 + n in uint64-free fashion — sort n as the
        # low 5 bits of a uint32 only when cost < 2^26; larger (wrapped)
        # costs are astronomically repetitive seeds, ordered by a second
        # masked pass.  Simpler: lexicographic via two stable sorts.
        cost_n = jnp.take_along_axis(T, start_arr[:, :, None],
                                     axis=2)[:, :, 0]        # (B, 16) uint32
        # signed compare: flip the sign bit to order as int32
        cost_s = cost_n ^ jnp.uint32(0x80000000)
        key_hi = jnp.where(seg_mask, cost_s, BIGU)
        # stable sort by (key_hi, n): sort indices n (already ascending) by
        # key_hi with a stable sort
        order = jnp.argsort(key_hi, axis=1, stable=True).astype(jnp.int32)
        return start_arr, order, o0, cnt, wc

    start_f, order_f, o0_f, cnt_f, wc_f = chain_schedule(sf)
    start_c, order_c, o0_c, cnt_c, wc_c = chain_schedule(sc)

    # --- slot grid in discovery order: (rank, chain, phase) -----------------
    slot_rank = jnp.repeat(n_i, 2 * I)                       # (NB,)
    slot_chain = jnp.tile(jnp.repeat(jnp.arange(2, dtype=jnp.int32), I),
                          MAXSEG)
    slot_phase = jnp.tile(jnp.arange(I, dtype=jnp.int32), 2 * MAXSEG)

    def slot_desc(start_arr, order, o0_p, cnt_p, wc_p):
        mode = order[:, slot_rank]                           # (B, NB)
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
    wcnt = jnp.where(is_c, wcc, wcf)
    h = jnp.where(is_c, hc, hf)

    chain_ok = jnp.where(is_c, flag_c[:, None], flag_f[:, None])
    valid = chain_ok & (slot_rank[None, :] < seedseg[:, None])
    cnt = jnp.where(valid, cnt, 0)
    cum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.cumsum(cnt, axis=1, dtype=jnp.int32)], axis=1)
    totals = cum[:, -1]
    # int32 cumsum may wrap for absurdly repetitive batches; the host checks
    # the exact total and falls back before the verify stage in that case.
    read_cum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(totals, dtype=jnp.int32)])
    return qw, rw, h, off0, wcnt, cum, totals, read_cum


# ---------------------------------------------------------------------------
# stage 2: candidate-axis enumerate + verify + control-flow emulation
# ---------------------------------------------------------------------------

def _verify_kernel_impl(cfg: Cfg, CANDS: int, d_catcat, d_anchors, d_sizes,
                        d_rcoff, d_locs, qw, rw, lens, budgets, read_idx,
                        h, off0, wcnt, cum, totals, read_cum):
    B = qw.shape[0]
    W = cfg.W
    NB = cfg.NB
    sidx = jnp.arange(CANDS, dtype=jnp.int32)

    rid = (jnp.searchsorted(read_cum, sidx, side="right") - 1).astype(
        jnp.int32)
    rid = jnp.clip(rid, 0, B - 1)
    live = sidx < read_cum[-1]
    local = (sidx - read_cum[rid]).astype(jnp.int32)

    # local slot -> bucket: binary search over this read's bucket cumsum,
    # with flat single-element gathers (row gathers are slow on TPU).
    cum_flat = cum.reshape(-1)
    row = rid * (NB + 1)
    lo = jnp.zeros(CANDS, jnp.int32)
    hi = jnp.full((CANDS,), NB, jnp.int32)
    nsteps = int(np.ceil(np.log2(NB + 1)))
    for _ in range(nsteps):
        mid = (lo + hi + 1) // 2
        v = cum_flat[row + mid]
        take = local >= v
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid - 1)
    b = jnp.clip(lo, 0, NB - 1)
    e = local - cum_flat[row + b]
    flat = rid * NB + b
    g_off0 = off0.reshape(-1)[flat]
    g_wc = wcnt.reshape(-1)[flat]
    g_h = h.reshape(-1)[flat]
    I = cfg.I
    chain = (b // I) % 2
    rank = b // (2 * I)

    entry = d_locs[jnp.clip(g_off0 + e, 0, d_locs.shape[0] - 1)]
    crick = e >= g_wc
    g = entry + g_h                                     # (CANDS,) int32

    # --- gather + phase-align the reference windows -------------------------
    wbase = (g >> 4) + jnp.where(crick, jnp.int32(W), 0)
    kk = jnp.arange(FIXELEMENT + 1, dtype=jnp.int32)
    widx = jnp.clip(wbase[:, None] + kk[None, :], 0, 2 * W - 1)
    words = d_catcat[widx]                              # (CANDS, 11) u32
    z = (g & 15).astype(jnp.uint32)
    sl = (z * 2)[:, None]
    w_lo = words[:, :FIXELEMENT] << sl
    w_hi = words[:, 1:] >> (jnp.uint32(32) - sl)
    sref = jnp.where(sl == 0, words[:, :FIXELEMENT], w_lo | w_hi)

    # --- CountMismatch lanes (align.h:167-200) ------------------------------
    q = qw[rid, chain]                                  # (CANDS, 10)
    r = rw[rid, chain]
    xc = ((~sref) << jnp.uint32(1)) | sref | jnp.uint32(0x55555555)
    x = ((q & xc) ^ sref) & r
    lanes = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
    wmm = jax.lax.population_count(lanes).sum(axis=-1).astype(jnp.int32)

    # --- coordinate transform + bounds (align.cpp:271-291) ------------------
    c = jnp.clip(jnp.searchsorted(d_anchors, g, side="right") - 1,
                 0, cfg.n_chr - 1).astype(jnp.int32)
    llen = lens[rid]
    loc_local = g - d_anchors[c]
    wloc = jnp.where(crick, d_rcoff[c] - llen - loc_local, loc_local)
    in_bounds = (wloc >= 0) & (wloc + llen <= d_sizes[c])

    eligible = live & in_bounds & (wmm <= budgets[rid])

    # --- dedup by (read, chr, watson_loc): first discovery wins -------------
    # lexicographic (rid, chr, wloc) grouping via three stable int32 sorts
    # (least-significant key first); ties stay in discovery order.  Avoiding
    # int64 sort keys keeps the TPU program fast to compile and run.
    kc = jnp.where(eligible, c, -1)
    kw = jnp.where(eligible, wloc, sidx)
    perm = jnp.argsort(kw, stable=True)
    perm = perm[jnp.argsort(kc[perm], stable=True)]
    perm = perm[jnp.argsort(rid[perm], stable=True)]
    r_s, c_s, w_s = rid[perm], kc[perm], kw[perm]
    first_sorted = jnp.concatenate(
        [jnp.ones((1,), bool),
         (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
         | (w_s[1:] != w_s[:-1])])
    first = jnp.zeros(CANDS, bool).at[perm].set(first_sorted)
    acc_pre = eligible & first & (kc >= 0)

    # --- progressive-sensitivity early exit (align.cpp:445-449) -------------
    lev = jnp.where(acc_pre, wmm, BIGLEVEL)
    minw_rank = jnp.full((B, MAXSEG), BIGLEVEL, jnp.int32).at[
        rid, rank].min(lev)
    prefmin = jax.lax.associative_scan(jnp.minimum, minw_rank, axis=1)
    r_i = jnp.arange(MAXSEG, dtype=jnp.int32)
    stopped = prefmin <= r_i[None, :]
    any_stop = stopped.any(axis=1)
    s_star = jnp.where(any_stop, jnp.argmax(stopped, axis=1), MAXSEG - 1)
    accepted = acc_pre & (rank <= s_star[rid])

    # --- per-level/chain counts ---------------------------------------------
    label = jnp.where(accepted, wmm * 2 + chain, 2 * MAXSEG)
    counts_flat = jnp.zeros((B, 2 * MAXSEG + 1), jnp.int32).at[
        rid, label].add(1)
    counts = counts_flat[:, : 2 * MAXSEG].reshape(B, MAXSEG, 2)

    lev_sums = counts.sum(axis=2)                       # (B, 16)
    found = lev_sums.sum(axis=1) > 0
    ii = jnp.argmax(lev_sums > 0, axis=1).astype(jnp.int32)
    ssum = jnp.take_along_axis(lev_sums, ii[:, None], axis=1)[:, 0]

    # --- replay detection ----------------------------------------------------
    replay = (lev_sums >= cfg.max_num_hits).any(axis=1)
    if cfg.report_repeat_hits == 0:
        replay = replay | (found & (ssum > 1))

    # --- reproducible multi-hit selection (align.cpp:623-625) ---------------
    j = (_myrand_hash_jnp(read_idx, cfg.randseed)
         % jnp.maximum(ssum, 1).astype(jnp.uint32)).astype(jnp.int32)
    nfwd = jnp.take_along_axis(counts[:, :, 0], ii[:, None], axis=1)[:, 0]
    sel_chain = (j >= nfwd).astype(jnp.int32)
    target = jnp.where(sel_chain == 1, j - nfwd, j) + 1
    ind = accepted & (wmm == ii[rid]) & (chain == sel_chain[rid])
    cs = jnp.cumsum(ind.astype(jnp.int32))
    start_pos = jnp.clip(read_cum[rid], 0, CANDS - 1)
    base = jnp.where(read_cum[rid] > 0, cs[start_pos - 1], 0)
    local_rank = cs - base
    sel = ind & (local_rank == target[rid])
    chrp = 2 * c + crick.astype(jnp.int32)
    sel_sidx = jnp.full((B,), CANDS, jnp.int32).at[rid].min(
        jnp.where(sel, sidx, CANDS))
    safe_sel = jnp.clip(sel_sidx, 0, CANDS - 1)
    sel_chrp = chrp[safe_sel]
    sel_wloc = wloc[safe_sel]

    # first level-0 forward hit (hits[0][0] slot leak, see output/sam.py)
    ind0 = accepted & (wmm == 0) & (chain == 0)
    h00_sidx = jnp.full((B,), CANDS, jnp.int32).at[rid].min(
        jnp.where(ind0, sidx, CANDS))
    h00_found = h00_sidx < CANDS
    safe = jnp.clip(h00_sidx, 0, CANDS - 1)
    h00_chrp = chrp[safe]
    h00_wloc = wloc[safe]

    # one packed int32 output array -> a single device-to-host transfer
    extras = jnp.stack(
        [found.astype(jnp.int32), ii, ssum, sel_chain, sel_chrp, sel_wloc,
         h00_found.astype(jnp.int32), h00_chrp, h00_wloc,
         replay.astype(jnp.int32), totals], axis=1)
    return jnp.concatenate([counts.reshape(B, 2 * MAXSEG), extras], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "CANDS"))
def _align_fused_kernel(cfg: Cfg, CANDS: int, prof_a, d_kmer_tab, rc_code,
                        rc_n_code, d_catcat, d_anchors, d_sizes, d_rcoff,
                        d_locs, codes, regs, lens, budgets, readsets,
                        read_idx):
    """Single-dispatch chunk: schedule + verify fused.  Candidate capacity is
    fixed; reads in chunks whose candidates overflow are detected from the
    returned totals and replayed on the host."""
    (qw, rw, h, off0, wcnt, cum, totals, read_cum) = _schedule_kernel_impl(
        cfg, prof_a, d_kmer_tab, rc_code, rc_n_code, codes, regs, lens,
        budgets, readsets)
    return _verify_kernel_impl(cfg, CANDS, d_catcat, d_anchors, d_sizes,
                               d_rcoff, d_locs, qw, rw, lens, budgets,
                               read_idx, h, off0, wcnt, cum, totals,
                               read_cum)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _totals_kernel(cfg: Cfg, prof_a, d_kmer_tab, rc_code, rc_n_code,
                   codes, regs, lens, budgets, readsets):
    """Candidate-count pre-pass: stage 1 with every output but ``totals``
    dead-code-eliminated.  The host uses the totals to cut candidate-budgeted
    chunks of a *fixed* compiled shape — overflow retries (and their
    recompiles) never happen."""
    out = _schedule_kernel_impl(cfg, prof_a, d_kmer_tab, rc_code, rc_n_code,
                                codes, regs, lens, budgets, readsets)
    return out[6]


def _pack(codes):
    """(B, FIXSIZE) uint8 codes -> (B, FIXELEMENT) uint32, first base in the
    top bits of each word (dbseq.cpp:71-75 layout)."""
    B = codes.shape[0]
    lanes = codes.reshape(B, FIXELEMENT, SEGLEN).astype(jnp.uint32)
    shifts = jnp.arange(SEGLEN - 1, -1, -1, dtype=jnp.uint32) * 2
    return (lanes << shifts[None, None, :]).sum(axis=-1).astype(jnp.uint32)


def _seed_array(codes, S, P):
    """Base-3 collapsed seed value at every read offset (align.cpp:97-105)."""
    col = jnp.where(codes == 3, jnp.uint8(1), codes).astype(jnp.int32)
    acc = jnp.zeros(codes.shape[:1] + (P,), dtype=jnp.int32)
    for k in range(S):
        acc = acc * 3 + col[:, k: k + P]
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
        if int(genome.anchors[-1]) >= 2 ** 31 or genome.n_chr >= 1 << 15:
            raise EngineUnsupported("genome too large for single-device "
                                    "int32 coordinates; shard across devices")
        self.W = W
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
        # combined (offset, count, wcount, 0) rows: one 16B gather per seed
        # position in the scheduler instead of three scattered ones
        tk = index.total_kmers
        kmer_tab = np.zeros((tk, 4), dtype=np.int32)
        kmer_tab[:, 0] = index.offsets[:-1]
        kmer_tab[:, 1] = np.diff(index.offsets)
        kmer_tab[:, 2] = index.wcounts
        self.d_kmer_tab = put(jnp.asarray(kmer_tab))
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
        self.B = DEV_BATCH             # reads per device dispatch
        self.CANDS = CANDS_FIXED       # candidate capacity per dispatch
        self.n_filtered = 0
        self.n_replayed = 0

    def _cfg(self, posmax: int) -> Cfg:
        p = self.param
        return Cfg(S=p.seed_size, I=p.index_interval,
                   NB=MAXSEG * 2 * p.index_interval, POSMAX=posmax,
                   chains=p.chains, max_num_hits=p.max_num_hits,
                   report_repeat_hits=p.report_repeat_hits,
                   randseed=p.randseed, W=self.W, n_chr=self.genome.n_chr)

    # -- batch orchestration -------------------------------------------------

    def _filter_batch(self, batch: list[Read], results):
        """Trim/filter; returns (live indices, budgets).  When no trimming is
        configured (no adapters, -q 0) the filter is pure arithmetic;
        otherwise per-read (FilterReads align.cpp:579-589)."""
        p = self.param
        live_idx, budgets = [], []
        if not p.adapters and p.qual_threshold == 0:
            for i, rd in enumerate(batch):
                L = len(rd.seq)
                rd.raw_len = L
                if L < p.min_read_size:
                    results[i] = SEResult(filtered=True)
                    continue
                sb = np.frombuffer(rd.seq.encode("latin1"), dtype=np.uint8)
                if int((REG_ALPHABET[sb] == 0).sum()) > p.max_ns:
                    results[i] = SEResult(filtered=True)
                    continue
                live_idx.append(i)
                budgets.append((p.max_snp_num + 1) * (L - 1) // L)
            self.n_filtered += len(batch) - len(live_idx)
            return live_idx, budgets
        for i, rd in enumerate(batch):
            filtered, budget = filter_read(rd, p)
            if filtered:
                results[i] = SEResult(filtered=True)
                self.n_filtered += 1
            else:
                live_idx.append(i)
                budgets.append(budget)
        return live_idx, budgets

    def _pack_host(self, batch, idxs, budgets):
        """Encode reads into padded fixed-shape numpy arrays (C11 analogue of
        ConvertBinaySeq's host half; the packing itself runs on device)."""
        p = self.param
        n = len(idxs)
        codes = np.zeros((n, FIXSIZE), dtype=np.uint8)
        regs = np.zeros((n, FIXSIZE), dtype=np.uint8)
        lens = np.zeros(n, dtype=np.int32)
        ridx = np.zeros(n, dtype=np.uint64)
        rsets = np.zeros(n, dtype=np.int32)
        buds = np.asarray(budgets, dtype=np.int32)
        seqs = [batch[i].seq for i in idxs]
        if n and len(set(map(len, seqs))) == 1:
            L = len(seqs[0])
            sb = np.frombuffer("".join(seqs).encode("latin1"),
                               dtype=np.uint8).reshape(n, L)
            codes[:, :L] = p.alphabet[sb]
            regs[:, :L] = REG_ALPHABET[sb]
            lens[:] = L
        else:
            for t, s in enumerate(seqs):
                sb = np.frombuffer(s.encode("latin1"), dtype=np.uint8)
                codes[t, :len(sb)] = p.alphabet[sb]
                regs[t, :len(sb)] = REG_ALPHABET[sb]
                lens[t] = len(sb)
        ridx[:] = [batch[i].index for i in idxs]
        rsets[:] = [batch[i].readset for i in idxs]
        return codes, regs, lens, buds, rsets, ridx

    def _pad_to(self, arrs, lo, hi, B):
        out = []
        for a in arrs:
            pad = np.zeros((B,) + a.shape[1:], dtype=a.dtype)
            pad[: hi - lo] = a[lo:hi]
            out.append(jnp.asarray(pad))
        return out

    def _stripe_shape(self, n: int):
        """(stripes per dispatch, reads per stripe, candidate capacity per
        stripe).  The sharded engine overrides this: one stripe per device."""
        B = self.B if n > 2048 else min(self.B, _round_pow2(n))
        return 1, B, self.CANDS

    def _run_totals(self, cfg, padded):
        c_, r_, l_, b_, s_ = padded
        return _totals_kernel(cfg, self.prof_a, self.d_kmer_tab,
                              self.rc_code, self.rc_n_code,
                              c_, r_, l_, b_, s_)

    def _run_fused(self, cfg, padded):
        c_, r_, l_, b_, s_, x_ = padded
        return _align_fused_kernel(
            cfg, self.CANDS, self.prof_a, self.d_kmer_tab, self.rc_code,
            self.rc_n_code, self.d_catcat, self.d_anchors, self.d_sizes,
            self.d_rcoff, self.d_locs, c_, r_, l_, b_, s_, x_)

    def _pad_stripes(self, arrs, stripes, B_loc, NS):
        """Stack stripe ranges into (NS*B_loc)-row padded device arrays."""
        out = []
        for a in arrs:
            pad = np.zeros((NS * B_loc,) + a.shape[1:], dtype=a.dtype)
            for s, (lo, hi) in enumerate(stripes):
                pad[s * B_loc: s * B_loc + hi - lo] = a[lo:hi]
            out.append(jnp.asarray(pad))
        return out

    def align_batch(self, batch: list[Read]):
        results: list = [None] * len(batch)
        live_idx, budgets = self._filter_batch(batch, results)
        n = len(live_idx)
        if n == 0:
            return results
        arrs = self._pack_host(batch, live_idx, budgets)
        codes, regs, lens, buds, rsets, ridx = arrs
        maxlen = int(lens.max()) if n else self.param.seed_size
        posmax = min(FIXSIZE - self.param.seed_size + 1,
                     _round16(maxlen - self.param.seed_size + 1))
        cfg = self._cfg(posmax)
        NS, B_loc, C_loc = self._stripe_shape(n)
        W = NS * B_loc

        # pre-pass: per-read candidate totals (cheap; windows pipelined)
        pend = []
        for lo in range(0, n, W):
            hi = min(lo + W, n)
            padded = self._pad_to(arrs[:5], lo, hi, W)
            pend.append(self._run_totals(cfg, padded))
        totals = np.concatenate([np.asarray(t) for t in pend])[:n]
        totals = totals.astype(np.int64)

        # cut [lo, hi) stripes so each fits one stripe's candidate capacity
        stripes = []
        lo = 0
        while lo < n:
            if totals[lo] > C_loc:
                # single over-capacity read: exact host replay
                i = live_idx[lo]
                results[i] = self.host.run_align(batch[i], int(buds[lo]))
                self.n_replayed += 1
                lo += 1
                continue
            acc = 0
            hi = lo
            while (hi < n and hi - lo < B_loc
                   and acc + totals[hi] <= C_loc):
                acc += totals[hi]
                hi += 1
            stripes.append((lo, hi))
            lo = hi
        chunks = [stripes[i: i + NS] for i in range(0, len(stripes), NS)]

        # 1-deep software pipeline: dispatch chunk k+1 before collecting
        # chunk k (device work and host post-processing overlap).
        pending = None
        for ch in chunks:
            padded = self._pad_stripes(arrs, ch, B_loc, NS)
            out = self._run_fused(cfg, padded)
            if pending is not None:
                self._collect_chunk(batch, live_idx, budgets, *pending,
                                    B_loc, results)
            pending = (ch, out)
        if pending is not None:
            self._collect_chunk(batch, live_idx, budgets, *pending, B_loc,
                                results)
        return results

    def _collect_chunk(self, batch, live_idx, budgets, stripes, out, B_loc,
                       results):
        packed = np.asarray(out)
        counts = packed[:, : 2 * MAXSEG].reshape(-1, MAXSEG, 2)
        (found, ii, ssum, sel_chain, sel_chrp, sel_wloc,
         h00_found, h00_chrp, h00_wloc, replay,
         totals) = packed[:, 2 * MAXSEG:].T

        for s, (lo, hi) in enumerate(stripes):
            for k in range(hi - lo):
                t = s * B_loc + k
                i = live_idx[lo + k]
                if replay[t]:
                    results[i] = self.host.run_align(batch[i],
                                                     budgets[lo + k])
                    self.n_replayed += 1
                else:
                    results[i] = DeviceView(
                        counts[t], int(budgets[lo + k]), bool(found[t]),
                        int(ii[t]), int(ssum[t]), int(sel_chain[t]),
                        (int(sel_chrp[t]), int(sel_wloc[t])),
                        bool(h00_found[t]),
                        (int(h00_chrp[t]), int(h00_wloc[t])))

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


def _round16(n: int) -> int:
    return max(16, ((n + 15) // 16) * 16)
