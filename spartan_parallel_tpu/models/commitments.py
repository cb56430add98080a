"""Pedersen multi-commitments (reference: src/commitments.rs).

Generators are derived exactly as the reference does (shake256 of
label || compressed basepoint, read in 64-byte chunks through the ristretto
one-way map, commitments.rs:15-33) so commitments are bit-compatible.

The commit operation itself is an MSM: tiny commits (sigma protocols,
unipoly commits — a handful of points) run on the host; bulk commits
(witness rows, Hyrax openings) run through the device Pippenger engine,
batched so many rows share one kernel launch.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from ..core.edwards import RistrettoPoint, multiscalar_mul
from ..core.field import Scalar
from ..ops import curve, fq, limbs as lb, msm

import os

_HOST_MSM_CACHE: dict = {}


def _host_msm_max() -> int:
    """Total-work threshold below which the native host Straus MSM beats
    a device launch (and avoids per-shape jit compiles). Backend-aware:
    on XLA:CPU there is no accelerator to win back the compile cost, so
    the C host path takes everything but the explicitly-device tests
    (2^22 covers every suite/dryrun shape); on TPU the device engine
    takes over at 8192. An ACTIVE prover mesh overrides this entirely —
    see commit_rows/_bulk_msm. Tunable via SPARTAN_HOST_MSM_MAX."""
    v = _HOST_MSM_CACHE.get("max")
    if v is None:
        env = os.environ.get("SPARTAN_HOST_MSM_MAX")
        if env is not None:
            v = int(env)
        else:
            import jax

            v = (1 << 22) if jax.default_backend() == "cpu" else 8192
        _HOST_MSM_CACHE["max"] = v
    return v


def _mesh_active() -> bool:
    from ..parallel.context import current_mesh

    mesh = current_mesh()
    return mesh is not None and mesh.devices.size > 1


class MultiCommitGens:
    __slots__ = ("n", "G", "h", "_dev", "_comb")

    def __init__(self, n: int, label: bytes, _raw=None):
        if _raw is not None:
            self.n, self.G, self.h = _raw
        else:
            shake = hashlib.shake_256()
            shake.update(label)
            shake.update(RistrettoPoint.basepoint().compress())
            stream = shake.digest(64 * (n + 1))
            gens = [
                RistrettoPoint.from_uniform_bytes(stream[64 * i : 64 * i + 64])
                for i in range(n + 1)
            ]
            self.n = n
            self.G = gens[:n]
            self.h = gens[n]
        self._dev = None
        self._comb = None

    def split_at(self, mid: int):
        return (
            MultiCommitGens(0, b"", _raw=(mid, self.G[:mid], self.h)),
            MultiCommitGens(0, b"", _raw=(self.n - mid, self.G[mid:], self.h)),
        )

    def scale(self, s: Scalar) -> "MultiCommitGens":
        return MultiCommitGens(
            0, b"", _raw=(self.n, [g * s for g in self.G], self.h)
        )

    def device_points(self):
        """(n+1, 4, 16) device array: G ++ [h]."""
        if self._dev is None:
            self._dev = jnp.asarray(curve.encode_points(self.G + [self.h]))
        return self._dev


def _bulk_msm(points_dev, limbs) -> list:
    """Device MSM for bulk commits; under an active prover_mesh the point
    axis shards across chips (parallel/msm_sharded.py — the TPU analog of
    the reference's rayon Hyrax commit, dense_mlpoly.rs:183-212)."""
    from ..parallel.context import current_mesh

    mesh = current_mesh()
    n = int(points_dev.shape[0])
    if (mesh is not None and mesh.devices.size > 1
            and n % mesh.devices.size == 0 and n >= 2 * mesh.devices.size):
        from ..parallel.msm_sharded import msm_sharded

        return msm_sharded(mesh, points_dev, limbs)
    return msm.msm(points_dev, limbs)


def _to_int_rows(values) -> np.ndarray:
    """list[Scalar]/ints or (B, n) object array -> (B, n) object ints."""
    if isinstance(values, np.ndarray) and values.dtype == object:
        return values if values.ndim == 2 else values[None]
    row = np.array([int(v) for v in values], dtype=object)
    return row[None]


def commit(values, blind, gens: MultiCommitGens) -> RistrettoPoint:
    """<values, G[..len]> + blind*h (commitments.rs:70-91)."""
    return commit_rows(_to_int_rows(values), [blind], gens)[0]


def commit_scalar(x, blind, gens: MultiCommitGens) -> RistrettoPoint:
    assert gens.n >= 1
    return gens.G[0] * int(x) + gens.h * int(blind)


def commit_rows(rows: np.ndarray, blinds, gens: MultiCommitGens):
    """Batched commit of B rows sharing generators: returns list of points.

    rows: (B, n) object-int array (canonical scalars); blinds: length-B.
    """
    rows = _to_int_rows(rows)
    b, n = rows.shape
    assert gens.n >= n
    scal = np.empty((b, n + 1), dtype=object)
    scal[:, :n] = rows
    scal[:, n] = [int(x) for x in blinds]
    # Dispatch on TOTAL work (the device kernel batches all rows in one
    # launch — the Hyrax shape), not per-row size. An active prover mesh
    # pins the threshold low so bulk commits exercise the collective MSM
    # even at dryrun shapes (tiny sigma commits stay host either way).
    if b * (n + 1) <= (8192 if _mesh_active() else _host_msm_max()):
        pts = gens.G[:n] + [gens.h]
        return [multiscalar_mul(list(r), pts) for r in scal]
    limbs_arr = lb.ints_to_limbs(list(scal.reshape(-1))).reshape(b, n + 1, 16)
    pts_dev = gens.device_points()
    idx = list(range(n)) + [gens.n]  # G[:n] ++ [h]
    return _bulk_msm(pts_dev[np.array(idx)], limbs_arr)


def commit_rows_device(rows_mont, blinds, gens: MultiCommitGens):
    """Batched commit of device-resident Montgomery rows (B, n, 16)."""
    b, n, _ = rows_mont.shape
    assert gens.n >= n
    if b * (n + 1) <= (8192 if _mesh_active() else _host_msm_max()):
        import jax

        # fq.decode expects Montgomery limbs and applies R^-1 itself
        vals = fq.decode(np.asarray(
            jax.device_get(jnp.asarray(rows_mont))).reshape(-1, 16))
        pts = gens.G[:n] + [gens.h]
        out = []
        for i in range(b):
            row = vals[i * n : (i + 1) * n] + [int(blinds[i])]
            out.append(multiscalar_mul(row, pts))
        return out
    canon = fq.to_canonical(jnp.asarray(rows_mont))
    pts_dev = gens.device_points()
    if all(int(x) == 0 for x in blinds):
        # zero blinds (the fork passes None for every witness poly):
        # 0*h = identity, so the h column can be dropped — keeps N a
        # power of two for the MSM kernel and skips the blind upload.
        return _bulk_msm(pts_dev[:n], canon)
    blind_limbs = jnp.asarray(
        lb.ints_to_limbs([int(x) for x in blinds]).reshape(b, 1, 16)
    )
    scal = jnp.concatenate([canon, blind_limbs], axis=1)
    idx = np.concatenate([np.arange(n), [gens.n]])
    return _bulk_msm(pts_dev[idx], scal)
