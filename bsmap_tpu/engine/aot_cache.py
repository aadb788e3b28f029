"""Disk cache of compiled XLA executables (AOT serialization).

The XLA persistent compilation cache does not cover this platform's
remote-compile path (every fresh process pays a 30-400 s compile per kernel
program, measured in PERF.md).  ``jax.experimental.serialize_executable``
does work here, so this module caches the *compiled executable* itself:
first-ever compile serializes to disk; every later process deserializes in
~1 s.  The reference has no analogue (it JITs nothing), but this is the
checkpoint/resume discipline of SURVEY.md §5 applied to compilation state.

Keys include the jax/backend versions, the device kind + count, a content
hash of the kernel source files, the static config repr, and every argument
shape/dtype — any mismatch falls back to a fresh compile (and re-caches).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

import jax

_DIR = os.environ.get("BSMAP_TPU_AOT_CACHE",
                      os.path.expanduser("~/.cache/bsmap_tpu_aot"))
_LOCK = threading.Lock()
_SRC_HASH: str | None = None


def _src_hash() -> str:
    """Content hash of the kernel sources: code changes invalidate caches."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.sha256()
        dirn = os.path.dirname(os.path.abspath(__file__))
        for fn in ("device_engine.py", "pair_device.py"):
            path = os.path.join(dirn, fn)
            if os.path.exists(path):
                with open(path, "rb") as fh:
                    h.update(fh.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _spec(x) -> str:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return f"{tuple(x.shape)}:{x.dtype}"
    return repr(x)


def cache_key(tag: str, statics, args) -> str:
    d = jax.devices()[0]
    parts = [jax.__version__, d.platform, getattr(d, "device_kind", "?"),
             str(jax.device_count()), _src_hash(), tag, repr(statics)]
    parts += [_spec(a) for a in jax.tree_util.tree_leaves(args)]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:32]


def get_compiled(tag: str, jitted, statics: tuple, args: tuple,
                 kwargs: dict | None = None):
    """Compiled executable for ``jitted(*statics-bound args)``.

    ``jitted`` must be a jax.jit-wrapped function whose static args come
    first; ``args`` are the dynamic (array) arguments used only for their
    shapes/dtypes.  Returns a callable taking the dynamic args.
    """
    kwargs = kwargs or {}
    if jax.devices()[0].platform == "cpu":
        # CPU AOT results are machine-feature-pinned (not portable across
        # processes with different XLA flags) and CPU compiles are fast:
        # no disk cache
        return jitted.lower(*statics, *args, **kwargs).compile()
    key = cache_key(tag, statics, (args, sorted(kwargs))) + ".exe"
    path = os.path.join(_DIR, key)
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            from jax.experimental.serialize_executable import (
                deserialize_and_load)
            return deserialize_and_load(payload, in_tree, out_tree)
        except Exception:  # stale/incompatible cache: recompile below
            pass
    compiled = jitted.lower(*statics, *args, **kwargs).compile()
    try:
        from jax.experimental.serialize_executable import serialize
        payload, in_tree, out_tree = serialize(compiled)
        with _LOCK:
            os.makedirs(_DIR, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            os.replace(tmp, path)
    except Exception:  # serialization is best-effort
        pass
    return compiled
