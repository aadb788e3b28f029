"""Data-parallel alignment over a device mesh (SURVEY.md §7 phase A).

Each device runs the complete fused schedule+verify step on its own stripe
of reads against a replicated genome + seed index; results are bit-exact
(reads are independent; the per-read myrand selection is stateless).  A
``psum`` over the mesh merges per-chunk aggregate counters so the program
contains the cross-device reduction that phase B (sharded index, cross-
device best-hit merge) will extend.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..engine.device_engine import (Cfg, DeviceEngine, MAXSEG,
                                    _align_fused_kernel, _totals_kernel,
                                    _round_pow2)
from ..index import SeedIndex
from ..params import Param
from ..reference import PackedGenome


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cands_loc", "mesh", "axis"))
def _sharded_fused(cfg: Cfg, cands_loc: int, mesh: Mesh, axis: str,
                   prof_a, d_kmer_tab, rc_code, rc_n_code, d_catcat,
                   d_anchors, d_sizes, d_rcoff, d_locs,
                   codes, regs, lens, buds, rsets, ridx):
    """shard_map over the read axis: every device aligns its stripe against
    the replicated index; one psum merges the aligned-read counters."""

    def step(prof_a, d_kmer_tab, rc_code, rc_n_code, d_catcat, d_anchors,
             d_sizes, d_rcoff, d_locs, codes, regs, lens, buds, rsets,
             ridx):
        out = _align_fused_kernel(
            cfg, cands_loc, prof_a, d_kmer_tab, rc_code, rc_n_code,
            d_catcat, d_anchors, d_sizes, d_rcoff, d_locs,
            codes, regs, lens, buds, rsets, ridx)
        # cross-device aggregate: total aligned reads this chunk (the
        # collective the phase-B sharded-index merge will generalize)
        n_aligned = jax.lax.psum(out[:, 2 * MAXSEG].sum(), axis)
        return out, n_aligned[None]

    rep = P()
    shd = P(axis)
    fn = shard_map(step, mesh=mesh,
                   in_specs=(rep,) * 9 + (shd,) * 6,
                   out_specs=(shd, P(axis)))
    return fn(prof_a, d_kmer_tab, rc_code, rc_n_code, d_catcat, d_anchors,
              d_sizes, d_rcoff, d_locs, codes, regs, lens, buds, rsets,
              ridx)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def _sharded_totals(cfg: Cfg, mesh: Mesh, axis: str, prof_a, d_kmer_tab,
                    rc_code, rc_n_code, codes, regs, lens, buds, rsets):
    def step(prof_a, d_kmer_tab, rc_code, rc_n_code, codes, regs, lens,
             buds, rsets):
        return _totals_kernel(cfg, prof_a, d_kmer_tab, rc_code, rc_n_code,
                              codes, regs, lens, buds, rsets)

    rep = P()
    shd = P(axis)
    fn = shard_map(step, mesh=mesh, in_specs=(rep,) * 4 + (shd,) * 5,
                   out_specs=shd)
    return fn(prof_a, d_kmer_tab, rc_code, rc_n_code, codes, regs, lens,
              buds, rsets)


class ShardedDeviceEngine(DeviceEngine):
    """DeviceEngine scaled over a mesh: stripes of reads per device."""

    def __init__(self, genome: PackedGenome, index: SeedIndex, param: Param,
                 mesh: Mesh | None = None, b_loc: int | None = None,
                 cands_loc: int | None = None):
        super().__init__(genome, index, param)
        from .mesh import make_mesh
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.ndev = self.mesh.devices.size
        self.B_loc = b_loc if b_loc is not None else self.B
        self.C_loc = cands_loc if cands_loc is not None else self.CANDS
        rep = NamedSharding(self.mesh, P())
        # replicate the genome + index over every device in the mesh
        for name in ("d_catcat", "d_anchors", "d_sizes", "d_rcoff",
                     "d_locs", "d_kmer_tab", "d_offsets", "d_wcounts",
                     "prof_a", "rc_code", "rc_n_code"):
            setattr(self, name, jax.device_put(getattr(self, name), rep))
        self._shd = NamedSharding(self.mesh, P(self.axis))
        self.last_n_aligned = 0

    def _stripe_shape(self, n: int):
        per_dev = max(1, -(-n // self.ndev))
        b = self.B_loc if per_dev > 2048 else min(self.B_loc,
                                                  _round_pow2(per_dev))
        return self.ndev, b, self.C_loc

    def _place(self, padded):
        return [jax.device_put(a, self._shd) for a in padded]

    def _run_totals(self, cfg, padded):
        c_, r_, l_, b_, s_ = self._place(padded)
        return _sharded_totals(cfg, self.mesh, self.axis, self.prof_a,
                               self.d_kmer_tab, self.rc_code, self.rc_n_code,
                               c_, r_, l_, b_, s_)

    def _run_fused(self, cfg, padded):
        c_, r_, l_, b_, s_, x_ = self._place(padded)
        out, n_aligned = _sharded_fused(
            cfg, self.C_loc, self.mesh, self.axis, self.prof_a,
            self.d_kmer_tab, self.rc_code, self.rc_n_code, self.d_catcat,
            self.d_anchors, self.d_sizes, self.d_rcoff, self.d_locs,
            c_, r_, l_, b_, s_, x_)
        self.last_n_aligned = n_aligned
        return out
