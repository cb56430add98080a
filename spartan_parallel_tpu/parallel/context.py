"""Prover sharding context: distribute the proof over a jax Mesh.

The reference is single-process (SURVEY.md §2.3); the TPU-native scale-out
shards the prover's BIG tensors — eq tables, Az/Bz/Cz, z, ABC, MSM points
— over a device mesh and lets XLA insert the ICI collectives (psum for the
round contractions, collective-permute for the roll-based folds). All
arithmetic is exact integer limb math, so reduction order cannot perturb
the Fiat-Shamir transcript: a sharded prove is bit-identical to a
single-device prove for any device count (tested in tests/test_sharding).

Usage:
    with prover_mesh(mesh):         # e.g. make_mesh(8)
        proof = NIZK.prove(...)

Inside the context, model code calls `shard_big(x, axis)` on its large
tensors; with no active mesh this is the identity, so the single-chip
path pays nothing. AOT-cached kernels pin the sharding they were traced
with, so the context also disables the export cache and uses plain jit
(XLA's persistent cache still applies).
"""

from __future__ import annotations

import contextlib
import threading

_STATE = threading.local()


def current_mesh():
    return getattr(_STATE, "mesh", None)


def shard_axis_name():
    """Axis name(s) big tensors shard over: a single name, or a tuple for
    a multi-axis (host, chip) mesh — PartitionSpec flattens the tuple, so
    one tensor dim spans all devices with chips fastest-varying."""
    axis = getattr(_STATE, "axis", None)
    if axis is not None:
        return axis
    mesh = current_mesh()
    if mesh is None:
        return "q"
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


@contextlib.contextmanager
def prover_mesh(mesh, axis=None, min_shard_elems: int = 1):
    """Activate data-parallel sharding for proves inside the context.

    axis: mesh axis name (or tuple) to shard over; default = every mesh
    axis, so a two-axis (host, chip) mesh shards over both."""
    from ..ops import kernel_cache

    prev = (getattr(_STATE, "mesh", None), getattr(_STATE, "axis", None),
            getattr(_STATE, "min", 1))
    prev_disabled = kernel_cache._DISABLED
    _STATE.mesh = mesh
    _STATE.axis = axis
    _STATE.min = min_shard_elems
    kernel_cache._DISABLED = True  # exports pin shardings; use plain jit
    try:
        yield
    finally:
        _STATE.mesh, _STATE.axis, _STATE.min = prev
        kernel_cache._DISABLED = prev_disabled


def shard_big(x, axis: int):
    """Constrain `x` to be sharded along dim `axis` over the active mesh
    (identity when no mesh is active or the axis doesn't divide)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    if x.shape[axis] % n_dev or x.shape[axis] < getattr(_STATE, "min", 1):
        return x
    spec = [None] * x.ndim
    spec[axis] = shard_axis_name()
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
