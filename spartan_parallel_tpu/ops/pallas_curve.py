"""Pallas-fused curve kernels (EXPERIMENTAL — not yet wired into msm.py).

The XLA path in ops/curve.py expresses one point addition as ~10 field
muls, each ~50 elementwise limb ops; XLA fuses some chains but still
materializes large intermediates in HBM, which makes the MSM bucket
pipeline bandwidth-bound. These kernels run the SAME jnp limb code
(ops/fp.py, ops/limbs.py) inside a single pallas_call, so the whole
addition stays in VMEM per tile — one read of each operand tile, one
write of the result.

STATUS: the current Mosaic build rejects the limb-shift concatenates on
the lane (minor) dimension of the (TILE, ..., 16) layout
("result/input offset mismatch on non-concat dimension" on
tpu.concatenate dim=1). Making this lower requires a limbs-on-sublanes
(16, TILE) internal layout with shifts on the sublane axis — the planned
next iteration of this kernel. Until then the MSM pipeline uses the XLA
path; these entry points fall back automatically off-TPU and are kept
for that follow-up work.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import curve, fp

_TILE = 256

# packed array constants handed to kernels as an input (pallas kernels may
# not close over or inline non-scalar constants): rows = P, 2P, 2d
_CONSTS = np.zeros((3, 17), np.uint32)
_CONSTS[0, :16] = fp.P_LIMBS
_CONSTS[1] = fp.P2_LIMBS
_CONSTS[2, :16] = curve.D2_LIMBS


@contextlib.contextmanager
def _swapped_consts(c):
    """Temporarily rebind the fp/curve module constants to traced slices so
    the shared jnp limb code references kernel inputs, not host arrays."""
    saved = fp.P_LIMBS, fp.P2_LIMBS, curve.D2_LIMBS
    fp.P_LIMBS = c[0, :16]
    fp.P2_LIMBS = c[1]
    curve.D2_LIMBS = c[2, :16]
    try:
        yield
    finally:
        fp.P_LIMBS, fp.P2_LIMBS, curve.D2_LIMBS = saved


def _use_pallas() -> bool:
    if os.environ.get("SPARTAN_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _add_kernel(c_ref, p_ref, q_ref, o_ref):
    with _swapped_consts(c_ref[:]):
        o_ref[:] = curve.point_add(p_ref[:], q_ref[:])


def _combine_kernel(c_ref, pv_ref, pf_ref, qv_ref, qf_ref, ov_ref, of_ref):
    """Segmented-scan combine: out_v = qv if qf else pv+qv; out_f = pf|qf."""
    with _swapped_consts(c_ref[:]):
        s = curve.point_add(pv_ref[:], qv_ref[:])
    qf = qf_ref[:]
    ov_ref[:] = jnp.where((qf != 0)[:, :, None], qv_ref[:], s)
    of_ref[:] = pf_ref[:] | qf


@jax.jit
def point_add(p, q):
    """(N, 4, 16) x (N, 4, 16) -> (N, 4, 16), fused in VMEM."""
    from jax.experimental import pallas as pl

    n = p.shape[0]
    if n % _TILE != 0 or p.ndim != 3:
        return curve.point_add(p, q)
    grid = (n // _TILE,)
    cspec = pl.BlockSpec((3, 17), lambda i: (0, 0))
    spec = pl.BlockSpec((_TILE, 4, 16), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _add_kernel,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        grid=grid,
        in_specs=[cspec, spec, spec],
        out_specs=spec,
    )(jnp.asarray(_CONSTS), p, q)


@jax.jit
def scan_combine(pv, pf, qv, qf):
    """Fused segmented-scan combine over (N, 4, 16) values + (N,) flags."""
    from jax.experimental import pallas as pl

    n = pv.shape[0]
    if n % _TILE != 0 or pv.ndim != 3:
        s = curve.point_add(pv, qv)
        return curve.point_select(qf, qv, s), pf | qf

    pf8 = pf.astype(jnp.uint32).reshape(n, 1)
    qf8 = qf.astype(jnp.uint32).reshape(n, 1)
    grid = (n // _TILE,)
    cspec = pl.BlockSpec((3, 17), lambda i: (0, 0))
    pspec = pl.BlockSpec((_TILE, 4, 16), lambda i: (i, 0, 0))
    fspec = pl.BlockSpec((_TILE, 1), lambda i: (i, 0))
    ov, of = pl.pallas_call(
        _combine_kernel,
        out_shape=(jax.ShapeDtypeStruct(pv.shape, pv.dtype),
                   jax.ShapeDtypeStruct((n, 1), jnp.uint32)),
        grid=grid,
        in_specs=[cspec, pspec, fspec, pspec, fspec],
        out_specs=(pspec, fspec),
    )(jnp.asarray(_CONSTS), pv, pf8, qv, qf8)
    return ov, of.reshape(n) != 0
