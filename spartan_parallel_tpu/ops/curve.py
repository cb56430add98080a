"""Batched curve25519 point arithmetic on device (extended Edwards, a=-1).

Points are (..., 4, 16) uint32 tensors: coordinates (X, Y, Z, T) as
base-field limb vectors. The addition law is the unified complete formula
(valid for all inputs including doubling and identity, since a=-1 is square
and d is not), so kernels are branch-free — exactly what XLA/TPU wants.
Replaces the reference's dependence on curve25519-dalek (src/group.rs).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.consts import EDWARDS_D2, P
from ..core.edwards import RistrettoPoint
from . import fp
from . import limbs as lb

D2_LIMBS = fp.const(EDWARDS_D2)


# --------------------------------------------------------------------------
# Host codecs
# --------------------------------------------------------------------------
def encode_points(points) -> np.ndarray:
    """list[RistrettoPoint] -> (n, 4, 16) uint32."""
    out = np.empty((len(points), 4, 16), dtype=np.uint32)
    for i, pt in enumerate(points):
        out[i, 0] = lb.int_to_limbs(pt.X)
        out[i, 1] = lb.int_to_limbs(pt.Y)
        out[i, 2] = lb.int_to_limbs(pt.Z)
        out[i, 3] = lb.int_to_limbs(pt.T)
    return out


def decode_points(arr) -> list:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, 4, 16)
    return [
        RistrettoPoint(
            lb.limbs_to_int(c[0]),
            lb.limbs_to_int(c[1]),
            lb.limbs_to_int(c[2]),
            lb.limbs_to_int(c[3]),
        )
        for c in flat
    ]


def identity(shape=()) -> np.ndarray:
    """Identity points (0,1,1,0) with given batch shape."""
    pt = np.zeros((4, 16), dtype=np.uint32)
    pt[1, 0] = 1
    pt[2, 0] = 1
    return np.broadcast_to(pt, tuple(shape) + (4, 16)).copy()


# --------------------------------------------------------------------------
# Device kernels
# --------------------------------------------------------------------------
def point_add(p, q):
    """Unified complete addition (add-2008-hwcd-3, a=-1): 9 field muls."""
    x1, y1, z1, t1 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    x2, y2, z2, t2 = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    a = fp.mul(fp.sub(y1, x1), fp.sub(y2, x2))
    b = fp.mul(fp.add(y1, x1), fp.add(y2, x2))
    c = fp.mul(fp.mul_const(t1, D2_LIMBS), t2)
    d = fp.add(fp.mul(z1, z2), fp.mul(z1, z2))
    e = fp.sub(b, a)
    f = fp.sub(d, c)
    g = fp.add(d, c)
    h = fp.add(b, a)
    return jnp.stack(
        [fp.mul(e, f), fp.mul(g, h), fp.mul(f, g), fp.mul(e, h)], axis=-2
    )


def point_double(p):
    """dbl-2008-hwcd specialized for a=-1."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    a = fp.square(x1)
    b = fp.square(y1)
    zz = fp.square(z1)
    c = fp.add(zz, zz)
    d = fp.neg(a)
    xy = fp.add(x1, y1)
    e = fp.sub(fp.sub(fp.square(xy), a), b)
    g = fp.add(d, b)
    f = fp.sub(g, c)
    h = fp.sub(d, b)
    return jnp.stack(
        [fp.mul(e, f), fp.mul(g, h), fp.mul(f, g), fp.mul(e, h)], axis=-2
    )


def point_select(cond, p, q):
    """cond over batch dims: where(cond, p, q)."""
    return jnp.where(cond[..., None, None], p, q)


def point_neg(p):
    return jnp.stack(
        [fp.neg(p[..., 0, :]), p[..., 1, :], p[..., 2, :], fp.neg(p[..., 3, :])],
        axis=-2,
    )


def tree_reduce(points, axis: int = 0):
    """Sum points along an axis by halving tree (log2 n batched adds)."""
    pts = jnp.moveaxis(points, axis, 0)
    n = pts.shape[0]
    while n > 1:
        half = n // 2
        if n % 2:
            rest, odd = pts[: 2 * half], pts[2 * half :]
            pts = jnp.concatenate(
                [point_add(rest[:half], rest[half : 2 * half]), odd], axis=0
            )
        else:
            pts = point_add(pts[:half], pts[half:])
        n = pts.shape[0]
    return pts[0]


# --------------------------------------------------------------------------
# Uniform-scalar ladders (one host-known scalar, many points)
# --------------------------------------------------------------------------
import jax

from ..core.consts import L as _L_MOD

_SCALAR_BITS = 253


def _bits_array(k: int):
    k %= _L_MOD
    return jnp.asarray(
        np.array([(k >> i) & 1 for i in range(_SCALAR_BITS)], dtype=np.uint32)
    )


@jax.jit
def _scale_scan(pts, bits):
    """bits (253,) uint32 -> sum bits_i * 2^i * P for each point P."""
    ident = jnp.asarray(identity(pts.shape[:-2]))

    def body(carry, bit):
        acc, add = carry
        sel = jnp.broadcast_to(bit > 0, acc.shape[:-2])
        acc = point_select(sel, point_add(acc, add), acc)
        return (acc, point_double(add)), None

    (acc, _), _ = jax.lax.scan(body, (ident, pts), bits)
    return acc


@jax.jit
def _fold_scan(pts_l, pts_r, bits_l, bits_r):
    """bits_l * P_l + bits_r * P_r batched (the bullet generator fold)."""
    ident = jnp.asarray(identity(pts_l.shape[:-2]))

    def body(carry, bb):
        acc, add_l, add_r = carry
        bl, br = bb
        acc = point_select(
            jnp.broadcast_to(bl > 0, acc.shape[:-2]), point_add(acc, add_l), acc
        )
        acc = point_select(
            jnp.broadcast_to(br > 0, acc.shape[:-2]), point_add(acc, add_r), acc
        )
        return (acc, point_double(add_l), point_double(add_r)), None

    (acc, _, _), _ = jax.lax.scan(body, (ident, pts_l, pts_r), (bits_l, bits_r))
    return acc


def scale_points(pts_dev, k: int):
    """k*P for every point in pts_dev (..., 4, 16); k is host-known."""
    return _scale_scan(pts_dev, _bits_array(k))


def fold_points(pts_l, pts_r, k_l: int, k_r: int):
    """k_l*P_l + k_r*P_r elementwise (one jitted scan per shape)."""
    return _fold_scan(pts_l, pts_r, _bits_array(k_l), _bits_array(k_r))
