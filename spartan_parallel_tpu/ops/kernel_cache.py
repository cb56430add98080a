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

# XLA:CPU segfaults on (de)serializing some executables compiled from
# the scatter-add SpMV family at tiny classed shapes (reproduced on this
# image: crash in LoadedExecutable.serialize() inside compilation_cache.
# put_executable_and_time during tests/test_driver.py's mem fixture, and
# in backend.deserialize_executable() on the cache READ once an entry
# exists). The executables RUN fine — only persisting them crashes — so
# these kernels bypass the XLA persistent cache entirely (read AND
# write; they pay one backend recompile per process, and their StableHLO
# AOT artifacts still cache the tracing/lowering). Registry lives here,
# outside the disk-key source hash, so changing it never invalidates
# existing artifacts.
_NO_PERSIST_KERNELS = frozenset(filter(None, os.environ.get(
    "SPARTAN_NO_PERSIST_KERNELS",
    "spmv_batched,eval_table,sparse_eval").split(",")))

# Deeper XLA:CPU failure, same image: the backend COMPILER itself
# segfaults (memory corruption — the crash surfaces variously in
# backend_compile_and_load, executable.serialize(), and
# deserialize_executable across runs) on some fully-degenerate tiny
# shapes, e.g. the phase-2 p-round step at Z=(8,1,1,16) from the
# counter_mem fixture (tests/test_snark_mem.py, tests/test_driver.py).
# For the small stateless kernel families below — pure limb arithmetic,
# no transcript/commitment work — eager execution at those sizes costs
# well under a second, so on CPU any call whose largest array argument
# is <= SPARTAN_CPU_EAGER_MAX_ELEMS elements runs EAGERLY (bit-identical
# integer math) and never reaches the broken compile path. KS carries
# are forced inside the context: the limb-axis lax.scan re-traces per
# iteration under disable_jit (~1000x cost).
_CPU_EAGER_TINY_KERNELS = frozenset(filter(None, os.environ.get(
    "SPARTAN_CPU_EAGER_KERNELS",
    "spmv_batched,eval_table,sparse_eval,"
    "p1_evals,p1_bind,p1_step,p2_evals,p2_bind,p2_step,"
    "pc_evals,pc_bind,pc_step,eq_fold").split(",")))
# (fold_chain excluded: its fori_loop body calls i.astype, which only
# exists on traced index values — it breaks under disable_jit, and it
# was never implicated in the XLA:CPU crashes.)


def _cpu_eager_max_elems() -> int:
    return int(os.environ.get("SPARTAN_CPU_EAGER_MAX_ELEMS", "8192"))


def _tiny_args(args) -> bool:
    m = 0
    for a in args:
        if hasattr(a, "shape"):
            n = 1
            for d in a.shape:
                n *= int(d)
            m = max(m, n)
    return m <= _cpu_eager_max_elems()


def _mesh_active() -> bool:
    """True when a prover_mesh is active: sharded arrays + disable_jit
    is an untested combination, and the multi-chip dryrun must stay on
    the compiled path (its shapes compile fine — the crash class above
    has only been seen on unsharded single-host programs)."""
    try:
        from ..parallel.context import current_mesh

        return current_mesh() is not None
    except Exception:
        return False


def _run_eager_ks(fn, args, statics):
    saved = os.environ.get("SPARTAN_CARRY_IMPL")
    os.environ["SPARTAN_CARRY_IMPL"] = "ks"
    try:
        with jax.disable_jit():
            return fn(*args, **statics)
    finally:
        if saved is None:
            os.environ.pop("SPARTAN_CARRY_IMPL", None)
        else:
            os.environ["SPARTAN_CARRY_IMPL"] = saved


class _no_persist_writes:
    """Scoped: disable the XLA persistent compilation cache (read+write)
    for compiles triggered inside the context.

    Two subtleties: the config State alone is NOT enough — jax caches
    the is_cache_used decision once per process, so the flag must be
    flipped together with compilation_cache.reset_cache() on both enter
    and exit (disk entries are untouched; the next compile outside the
    context re-initializes the cache from the same dir). Uses
    config.update rather than the State context manager because
    reset_cache() must bracket the flag flips."""

    def __enter__(self):
        from jax._src import compilation_cache as _cc
        from jax._src import config as _jc

        self._saved = _jc.enable_compilation_cache.value
        jax.config.update("jax_enable_compilation_cache", False)
        _cc.reset_cache()
        return self

    def __exit__(self, *exc):
        from jax._src import compilation_cache as _cc

        jax.config.update("jax_enable_compilation_cache", self._saved)
        _cc.reset_cache()
        return False


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
            if (fn_name in _CPU_EAGER_TINY_KERNELS and _tiny_args(args)
                    and jax.default_backend() == "cpu"
                    and not _mesh_active()):
                assert not kwargs, f"non-static kwargs unsupported: {kwargs}"
                return _run_eager_ks(fn, args, statics)
            if _DISABLED:
                jitted = jax.jit(functools.partial(fn, **statics),
                                 keep_unused=True)
                if (fn_name in _NO_PERSIST_KERNELS
                        and jax.default_backend() == "cpu"):
                    with _no_persist_writes():
                        return jitted(*args, **kwargs)
                return jitted(*args, **kwargs)
            assert not kwargs, f"non-static kwargs unsupported: {kwargs}"
            backend = jax.default_backend()
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
            # the serialize() crash is XLA:CPU-specific; on TPU the same
            # executables persist fine (and remote recompiles are costly)
            if fn_name in _NO_PERSIST_KERNELS and backend == "cpu":
                with _no_persist_writes():
                    return call(*args)
            return call(*args)

        wrapper.__wrapped_fn__ = fn
        return wrapper

    return deco
