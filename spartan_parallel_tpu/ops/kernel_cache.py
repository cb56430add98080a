"""AOT kernel registry: disk-cached jax.export artifacts.

The prover's device kernels are few, but their limb-arithmetic graphs are
large (thousands of primitives), and on a small host Python tracing plus
MLIR lowering costs seconds per kernel per process — which dominated
end-to-end prove time (a 2^6 NIZK spent >60 s in trace/lower/compile and
microseconds in compute). The XLA persistent cache only skips the final
backend compile; tracing and lowering re-run every process because the
cache key is derived from the lowered HLO.

This module closes the gap: every registered kernel is traced + lowered
ONCE per (backend, shapes, dtypes, statics, source-hash) and the
serialized StableHLO artifact is written to disk. A warm process
deserializes in milliseconds and calls the artifact directly — no
tracing, no lowering, and the backend compile hits the XLA persistent
cache.

Usage:
    @cached_kernel(static_argnames=("mode",))
    def my_kernel(x, y, mode: int): ...

Set SPARTAN_NO_AOT_CACHE=1 to fall back to plain jax.jit (e.g. when
debugging with eager numerics or running under explicit Mesh shardings —
exported artifacts pin the sharding they were traced with).
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading

import jax
import numpy as np

_DISABLED = bool(os.environ.get("SPARTAN_NO_AOT_CACHE"))

_CACHE_DIR = os.environ.get(
    "SPARTAN_AOT_CACHE_DIR",
    os.path.expanduser("~/.cache/spartan_parallel_tpu/export"))

_LOCK = threading.Lock()
_MEM: dict = {}
_FILE_HASHES: dict = {}

# Every device kernel bottoms out in these leaf modules; a kernel's disk
# key hashes its OWN defining module plus this core set, so adding or
# editing an unrelated module no longer invalidates every artifact on a
# host where re-tracing costs minutes (1-core machine).
_CORE_DEPS = ("limbs.py", "fq.py", "fp.py", "curve.py")

# HISTORY (rounds 1-4, resolved round 5): this module used to carry an
# eager-execution fallback for tiny CPU shapes, a per-kernel
# persistent-cache denylist, and a scoped cache-off context — all
# treating symptoms of what looked like XLA:CPU compiler/serializer
# bugs (segfaults in backend_compile / executable.serialize /
# deserialize_executable; multi-minute "compiles"). The actual root
# cause was the image's remote-TPU PJRT plugin, which sitecustomize
# injects into every interpreter and whose background runtime
# non-deterministically wedges (and evidently corrupts) XLA:CPU
# execution — a plain device_get of jnp.ones().reshape() stalls
# minutes/forever with the plugin present and takes ~3 s without it
# (spartan_parallel_tpu/envfix.py). CPU runs now strip the plugin
# (tests/conftest.py re-exec; dryrun/bench subprocess env), and all
# three workarounds are gone: every kernel compiles and persists
# normally on every backend.


def _file_hash(path: str) -> str:
    h = _FILE_HASHES.get(path)
    if h is None:
        hasher = hashlib.sha256()
        try:
            with open(path, "rb") as f:
                hasher.update(f.read())
        except OSError:
            pass
        h = _FILE_HASHES[path] = hasher.hexdigest()[:16]
    return h


def _src_hash(fn) -> str:
    """Hash of the kernel's defining module, its direct in-package ops
    imports, and the core limb/field/curve modules (+ jax version):
    edits to any of those invalidate its disk cache. Without the
    direct-import scan, editing e.g. ops/transcript_dev.py silently
    left ops/zk_round.py's exported scans stale."""
    import re
    import sys

    pkg = os.path.dirname(__file__)
    own = os.path.join(pkg, "kernel_cache.py")  # infra, not codegen
    paths = {os.path.join(pkg, dep) for dep in _CORE_DEPS}

    def scan(path):
        if path in paths or path == own or not os.path.exists(path):
            return
        paths.add(path)
        try:
            with open(path) as f:
                src = f.read()
        except OSError:
            return
        for grp in re.findall(
                r"^\s*from\s+\.+(?:ops\.)?(\w+)\s+import|"
                r"^\s*from\s+\.+(?:ops)?\s+import\s+([\w ,]+)",
                src, re.M):
            for names in grp:
                for part in (names or "").split(","):
                    name = part.strip().split(" ")[0]
                    if name:
                        scan(os.path.join(pkg, name + ".py"))

    mod = sys.modules.get(getattr(fn, "__module__", None))
    mod_file = getattr(mod, "__file__", None)
    if mod_file:
        scan(mod_file)
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(_file_hash(p).encode())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def _abstractify(a):
    if isinstance(a, (int, np.integer)):
        return f"i:{np.asarray(a).dtype}"
    x = np.asarray(a) if not hasattr(a, "shape") else a
    return f"{x.dtype}{tuple(x.shape)}"


def cached_kernel(static_argnames: tuple = (), name: str | None = None):
    """Decorator: jit + AOT-export the function, cached on disk."""

    def deco(fn):
        fn_name = name or fn.__name__
        src_hash_cell: list = []

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            statics = {k: kwargs.pop(k) for k in list(kwargs)
                       if k in static_argnames}
            backend = jax.default_backend()
            if _DISABLED:
                jitted = jax.jit(functools.partial(fn, **statics),
                                 keep_unused=True)
                return jitted(*args, **kwargs)
            assert not kwargs, f"non-static kwargs unsupported: {kwargs}"
            if not src_hash_cell:
                src_hash_cell.append(_src_hash(fn))
            # The carry implementation is env-selectable codegen
            # (SPARTAN_CARRY_IMPL) — key it when it differs from the
            # backend default so a forced run can't poison the cache
            # (tag omitted for the default to keep existing keys valid).
            from .limbs import _carry_impl

            carry = _carry_impl()
            parts = [fn_name, backend, src_hash_cell[0]]
            if carry != ("scan" if backend == "cpu" else "ks"):
                parts.append(f"carry={carry}")
            key_str = "|".join(parts + [
                ",".join(f"{k}={statics[k]}" for k in sorted(statics)),
                ",".join(_abstractify(a) for a in args),
            ])
            key = hashlib.sha256(key_str.encode()).hexdigest()[:24]
            with _LOCK:
                call = _MEM.get(key)
            if call is None:
                path = os.path.join(_CACHE_DIR, f"{fn_name}_{key}.bin")
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        exp = jax.export.deserialize(f.read())
                else:
                    # keep_unused: argument DCE changes the exported
                    # calling convention and exp.call then rejects the
                    # full arg list ("Too many leaves for PyTreeDef")
                    jitted = jax.jit(functools.partial(fn, **statics),
                                     keep_unused=True)
                    exp = jax.export.export(jitted)(*args)
                    data = exp.serialize()
                    os.makedirs(_CACHE_DIR, exist_ok=True)
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, path)
                # jit the call wrapper: bare Exported.call re-processes
                # args every invocation (~1 ms/call); the jitted wrapper
                # dispatches through jax's C++ fast path (~0.02 ms) —
                # sumcheck makes thousands of small eager calls per prove.
                call = jax.jit(exp.call)
                with _LOCK:
                    _MEM[key] = call
            return call(*args)

        wrapper.__wrapped_fn__ = fn
        return wrapper

    return deco
