"""Cold-start warmup overlapped with genome/index load (r4 verdict item 10).

The platform compiles remotely and caches BUILT programs by fingerprint:
measured on-chip, a second identical program first-executes in ~0.1 s after
the first paid the full 6-400 s build.  Every array SHAPE the kernels
specialize on is knowable from the uncompressed cache npz headers alone —
so when the packed-genome and index caches exist, a background thread
compiles and first-executes ZERO-ARRAY twins of the run's programs while
the real genome/index load on the main thread.  A cold `--index-cache` run
then pays max(load, compile) instead of their sum.

Pure prefetch: any failure is swallowed and the run proceeds as before.
"""

from __future__ import annotations

import numpy as np


def cache_shapes(gen_npz: str, idx_npz: str):
    """(W, n_chr, total_locs, watson_locs) from npz headers + one cheap
    mmap pass over wcounts (no bulk data is read)."""
    from ..index import _mmap_npz
    gz = _mmap_npz(gen_npz)
    iz = _mmap_npz(idx_npz)
    W = len(gz["refcat"])
    n_chr = len(gz["sizes"])
    total = int(iz["offsets"][-1])
    wl = int(iz["wcounts"].sum()) if len(iz["wcounts"]) else 0
    return W, n_chr, total, wl


def warmup_from_caches(gen_npz: str, idx_npz: str, param, pe: bool = False,
                       bsp: bool = False, nw: int = 7) -> None:
    try:
        _warmup_from_caches(gen_npz, idx_npz, param, pe, bsp, nw)
    except Exception:   # pure prefetch — never take the run down
        pass


def _warmup_from_caches(gen_npz, idx_npz, param, pe, bsp, nw):
    import jax
    import jax.numpy as jnp

    from . import device_engine as de

    W, n_chr, total, wl = cache_shapes(gen_npz, idx_npz)
    if param.profile is None:
        param.init_mapping()
    MS = min(de.MAXSNPS, param.max_snp_num) + 1
    B = de.DEV_BATCH
    tiers = sorted({de.CANDS_PER_READ * B,
                    max(de.CANDS_BIG_PER_READ, de.CANDS_PER_READ) * B})
    tk = 3 ** param.seed_size
    I = param.index_interval
    rc, rc_n = de.rc_tuple_of(param)

    z32 = jnp.int32
    args = (
        jnp.zeros((de.MAXSNPS + 1, I), z32),            # prof_a
        jnp.zeros((tk, 4), z32),                        # d_kmer_tab
        jnp.zeros((1,), z32),                           # d_kcnt
        jnp.asarray(np.asarray(rc, np.uint8)),          # rc_code
        jnp.asarray(np.uint8(rc_n)),                    # rc_n_code
        jnp.zeros((2 * W,), jnp.uint32),                # d_catcat
        jnp.zeros((n_chr,), jnp.uint32),                # d_anchors
        jnp.zeros((n_chr,), z32),                       # d_sizes
        jnp.zeros((n_chr,), z32),                       # d_rcoff
        jnp.zeros((max(wl, 1),), jnp.uint32),           # d_wlocs
        jnp.zeros((max(total - wl, 1),), jnp.uint32),   # d_clocs
        jnp.zeros((1,), z32),                           # d_tags
        jnp.zeros((1,), jnp.uint32),                    # d_sites
        jnp.zeros((n_chr + 1,), z32),                   # d_site_off
        jnp.zeros((1,), z32),                           # d_tag_off
    )
    width = 2 * nw + 4
    packed = np.zeros((B, width), dtype=np.int32)
    packed[:, width - 4] = min(100, 16 * nw)
    packed[:, width - 3] = min(param.max_snp_num, de.MAXSNPS)
    d_packed = jnp.asarray(packed)

    jobs = []
    if pe:
        from .pair_device import PAIR_HITS_K
        for mode in (("b",) if param.chains else ("f", "r")):
            cfg = de.make_cfg(param, W, n_chr, mode, MS, nw=nw)._replace(
                pe=True, hits_k=PAIR_HITS_K)
            jobs += [(cfg, cap) for cap in tiers]
    else:
        lean = not bsp
        cfg = de.make_cfg(param, W, n_chr,
                          "b" if param.chains else "f", MS,
                          lean=lean, nw=nw)
        jobs += [(cfg, cap) for cap in tiers]
        if lean:
            jobs.append((cfg._replace(fixed=True), tiers[0]))
        jobs.append((cfg._replace(probe=True, lean=False, hits_k=0), 1))

    fn = jax.jit(de._align_fused_kernel.__wrapped__,
                 static_argnames=("cfg", "CANDS"))
    outs = [fn(cfg, cap, *args, d_packed) for cfg, cap in jobs]
    de._fetch_all(outs)  # force (concurrently): server builds land in cache
