"""Multi-chip Pippenger MSM: points sharded across the mesh.

TPU-native scale-out of the reference's ONE parallel site — the rayon
Hyrax row-commitment MSM (src/dense_mlpoly.rs:183-212). Each chip runs
the full sort + prefix-scan bucket pipeline (ops/msm.py) on its slice of
the point/scalar arrays inside shard_map; the per-chip (B, 4, 16) partial
results then cross ICI once (an all_gather of a few KB) and tree-add.

Why this decomposition is exact: an MSM is a group sum, point addition is
associative, and ristretto compression is canonical (one byte encoding
per group element), so ANY split of the points across chips yields
byte-identical commitments and an unchanged Fiat-Shamir transcript
(asserted in tests/test_msm_sharded.py and the sharded-prove tests).

Wired into the prover via models/commitments.py: every bulk commit
(witness polycommit, Hyrax openings) routes here automatically when a
`prover_mesh` context is active.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve, msm


def _mesh_axes(mesh: Mesh):
    """All mesh axis names as one flattened PartitionSpec dim (a 2-axis
    (host, chip) mesh splits points over hosts, then chips within)."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


@functools.cache
def _per_chip_fn(mesh: Mesh):
    from jax.experimental.shard_map import shard_map

    ax = _mesh_axes(mesh)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(ax), P(None, ax, None)),
        out_specs=P(ax))
    def per_chip(pts_local, limbs_local):
        out = msm._msm_sorted.__wrapped_fn__(
            pts_local, limbs_local,
            wbits=msm._pick_wbits(limbs_local.shape[0],
                                  limbs_local.shape[1]))
        return out[None]  # leading device axis

    return per_chip


def msm_sharded_dev(mesh: Mesh, points_dev, scalar_limbs) -> jnp.ndarray:
    """Batched MSM with the point axis sharded over `mesh` (axis "q").

    points_dev: (N, 4, 16); scalar_limbs: (B, N, 16) canonical limbs.
    Returns a (B, 4, 16) device array of extended-Edwards points whose
    group values are identical to ops.msm.msm_dev's.
    """
    scalar_limbs = jnp.asarray(scalar_limbs)
    if scalar_limbs.ndim == 2:
        scalar_limbs = scalar_limbs[None]
    n_dev = mesh.devices.size
    assert points_dev.shape[0] % n_dev == 0, "pad points to device multiple"

    ax = _mesh_axes(mesh)
    pts = jax.device_put(jnp.asarray(points_dev), NamedSharding(mesh, P(ax)))
    lm = jax.device_put(scalar_limbs, NamedSharding(mesh, P(None, ax, None)))
    partials = _per_chip_fn(mesh)(pts, lm)  # (D, B, 4, 16)
    return curve.tree_reduce(partials, axis=0)  # (B, 4, 16)


def msm_sharded(mesh: Mesh, points_dev, scalar_limbs) -> list:
    """Host-side variant: returns B RistrettoPoints (cf. ops.msm.msm)."""
    out = msm_sharded_dev(mesh, points_dev, scalar_limbs)
    return curve.decode_points(np.asarray(jax.device_get(out)))
