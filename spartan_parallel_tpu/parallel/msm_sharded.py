"""Multi-chip Pippenger MSM: points sharded across the mesh.

Each chip runs the full local bucket pipeline on its point slice
(ops/msm.py) inside shard_map, producing per-chip window sums; the
(32, B) window-sum points are then all-gathered (a few KB) and tree-added
locally — point addition is not a psum-able reduction, but the per-chip
partials are tiny, so one all_gather over ICI plus log(D) batched adds
costs microseconds against the O(N) bucket work (SURVEY.md §2.3).

Fiat-Shamir determinism: all arithmetic is exact integer limb math, so
the combination order cannot change the result — proofs are bit-identical
for any device count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.edwards import RistrettoPoint
from ..ops import curve, msm


def _local_window_sums(points, digits):
    """points (n_local, 4, 16), digits (32, B, n_local) ->
    (32, B, 4, 16): the sort + prefix-scan window pipeline (ops/msm.py)
    on this chip's slice."""

    def window_body(_, keys_bn):
        sums = jax.vmap(
            lambda k: msm._window_sum_sorted(points, k))(keys_bn)
        return None, sums

    _, out = jax.lax.scan(window_body, None, digits)
    return out


def msm_sharded(mesh: Mesh, points_dev, scalar_limbs) -> list:
    """Batched MSM with the point axis sharded over `mesh` (axis "q").

    points_dev: (N, 4, 16); scalar_limbs: (B, N, 16) canonical limbs.
    Returns B host RistrettoPoints, bit-identical to ops.msm.msm.
    """
    from jax.experimental.shard_map import shard_map

    single = scalar_limbs.ndim == 2
    if single:
        scalar_limbs = scalar_limbs[None]
    digits = msm.digits_from_limbs(jnp.asarray(scalar_limbs))  # (B, N, 32)
    digits = jnp.moveaxis(digits, -1, 0)  # (32, B, N)

    n_dev = mesh.devices.size
    assert points_dev.shape[0] % n_dev == 0, "pad points to device multiple"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("q"), P(None, None, "q")),
        out_specs=P("q"))
    def per_chip(pts_local, digits_local):
        sums = _local_window_sums(pts_local, digits_local)
        return sums[None]  # leading device axis

    pts = jax.device_put(
        jnp.asarray(points_dev),
        NamedSharding(mesh, P("q")))
    dg = jax.device_put(digits, NamedSharding(mesh, P(None, None, "q")))
    partials = per_chip(pts, dg)  # (D, 32, B, 4, 16)
    wins = curve.tree_reduce(partials, axis=0)  # (32, B, 4, 16)

    wins_host = curve.decode_points(
        np.asarray(jax.device_get(wins)).reshape(-1, 4, 16))
    b = scalar_limbs.shape[0]
    out = []
    for row in range(b):
        acc = RistrettoPoint.identity()
        for w in range(msm.NUM_WINDOWS - 1, -1, -1):
            for _ in range(msm.WINDOW_BITS):
                acc = acc.double()
            acc = acc + wins_host[w * b + row]
        out.append(acc)
    return out
