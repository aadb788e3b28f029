"""bsmap_tpu — a TPU-native bisulfite short-read alignment framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of BSMAP
v2.6 (the classic C++ bisulfite mapper): asymmetric C->T-aware ungapped
alignment of WGBS/RRBS reads against the four converted reference strands
(BSW/BSWC/BSC/BSCC), single- and pair-end mapping, adapter/quality trimming,
unique/random multi-hit reporting with reproducible selection, SAM/BSP output,
and downstream per-cytosine methylation-ratio calling.

Architecture (TPU-first, not a port):
  * packed 2-bit genome + base-3 seed CSR index, device resident
    (replicated or sharded over a jax.sharding.Mesh)
  * batched reads verified by a vectorized bitwise XOR/popcount extension
    kernel over (reads x candidate-loci) tiles
  * an exact host "oracle" engine replicates the reference's sequential
    control flow for the rare reads where bucket caps / repeat-abort
    semantics matter, guaranteeing bit-identical output.

Reference semantics are cited throughout as ``file:line`` into the BSMAP
source tree (e.g. ``align.cpp:168``) so parity can be audited.
"""

import os as _os

import jax as _jax

# The device compute path is pure 32-bit (TPUs have no native int64; XLA
# emulates it with int32 pairs).  64-bit math — genome coordinates during
# index build, the reproducible xorshift myrand hash (utilities.cpp:40-50) —
# lives host-side in numpy, which is independent of this flag.
_jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: kernel shapes are stable across runs, so
# paying the (slow, remote on some TPU setups) compile once is enough.
# NOT on CPU by default: XLA's CPU AOT results are machine-feature-pinned
# (different XLA flags across processes change the pin set and reloading
# warns of possible SIGILL).  Test/CI subprocesses opt in with
# BSMAP_TPU_CPU_JIT_CACHE=1 — they run many short-lived CLI processes with
# IDENTICAL flags, so the cache is safe there and cuts re-verification from
# a per-process recompile to a disk load; the cache directory is suffixed
# with a hash of the XLA flags so differently-pinned entries never mix.
_cache_dir = _os.environ.get("BSMAP_TPU_JIT_CACHE",
                             _os.path.expanduser("~/.cache/bsmap_tpu_jit"))
try:
    _is_cpu = _os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    _cpu_opt_in = _os.environ.get("BSMAP_TPU_CPU_JIT_CACHE") == "1"
    if not _is_cpu or _cpu_opt_in:
        if _is_cpu:
            import hashlib as _hl
            _tag = _hl.sha1(
                _os.environ.get("XLA_FLAGS", "").encode()).hexdigest()[:10]
            _cache_dir = _cache_dir + "_cpu_" + _tag
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is best-effort
    pass

__version__ = "0.1.0"
