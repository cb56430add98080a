"""Limb-SUBLANE big-integer primitives: limbs on axis -2, lanes on -1.

The limb-last layout (ops/limbs.py, shape (..., N, 16)) wastes 8x HBM on
TPU: XLA tiles the last two dims (8, 128), padding the 16-limb lane axis
to 128. Storing big tables as (..., 16, N) instead puts the 16 limbs on
SUBLANES (16 = 2 tiles of 8) and the long data axis on lanes — zero
padding, which is the difference between a 2^20-constraint prover
fitting in HBM (it OOM'd at 17.5 GB padded) and sweeping 8x less memory
per sumcheck round. This is the "limbs must move to sublanes" rule from
the TPU kernel playbook.

All functions mirror ops/limbs.py with the limb axis parametric
(default -2). Same exactness bounds: 16x16-bit limbs in uint32 lanes,
schoolbook products exact in uint32, column sums < 2^21.

Carry resolution: Kogge-Stone (whole-array boolean rounds) by default —
the natural TPU form; a lax.scan variant (limb axis moved to front) is
kept for XLA:CPU, whose optimizer is slow/fragile on wide KS graphs.
Selection mirrors ops/limbs.py (SPARTAN_CARRY_IMPL env override).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .limbs import MASK, _carry_impl

NLIMBS = 16
LIMB_BITS = 16


def _pad_ax(a, before: int, after: int, axis: int):
    cfg = [(0, 0)] * a.ndim
    cfg[axis % a.ndim] = (before, after)
    return jnp.pad(a, cfg)


def _take(a, start: int, stop: int, axis: int):
    return jax.lax.slice_in_dim(a, start, stop, axis=axis)


def _shift_up(x, d: int, axis: int, fill: int = 0):
    """Shift limbs toward higher indices by d along `axis`."""
    if d == 0:
        return x
    kept = _take(x, 0, x.shape[axis % x.ndim] - d, axis)
    if fill:
        ones = jnp.ones(kept.shape[: axis % x.ndim] + (d,)
                        + kept.shape[axis % x.ndim + 1:], x.dtype)
        return jnp.concatenate([ones, kept], axis=axis)
    return _pad_ax(kept, d, 0, axis)


def _resolve_unit_carries(s, axis: int):
    """Exact Kogge-Stone resolution for limbs s <= 2^16 along `axis`."""
    n = s.shape[axis % s.ndim]
    g = (s >> LIMB_BITS).astype(jnp.uint32)
    p = (s & MASK) == MASK
    gk, pk = g, p
    d = 1
    while d < n:
        gl = _shift_up(gk, d, axis)
        pl = _shift_up(pk.astype(jnp.uint32), d, axis, fill=1) != 0
        gk = gk | jnp.where(pk, gl, 0)
        pk = pk & pl
        d *= 2
    cin = _shift_up(gk, 1, axis)
    out = (s + cin) & MASK
    carry_out = _take(gk, n - 1, n, axis)
    return out, carry_out


def _carry_prop_ks(c, axis: int):
    x = (c & MASK) + _shift_up(c >> LIMB_BITS, 1, axis)
    s = (x & MASK) + _shift_up(x >> LIMB_BITS, 1, axis)
    out, _ = _resolve_unit_carries(s, axis)
    return out


def _carry_prop_scan(c, axis: int):
    cols = jnp.moveaxis(c, axis, 0)

    def body(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & MASK

    _, ys = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return jnp.moveaxis(ys, 0, axis)


def carry_prop(c, out_limbs: int, axis: int = -2):
    n = c.shape[axis % c.ndim]
    if n < out_limbs:
        c = _pad_ax(c, 0, out_limbs - n, axis)
    elif n > out_limbs:
        raise ValueError("carry_prop cannot shrink the limb count")
    if _carry_impl() == "scan":
        return _carry_prop_scan(c, axis)
    return _carry_prop_ks(c, axis)


def mul_wide(a, b, axis: int = -2):
    """Full product: (..., 16, X) x (..., 16, X) -> (..., 32, X)."""
    ax = axis % max(a.ndim, b.ndim)
    shape = list(jnp.broadcast_shapes(a.shape, b.shape))
    shape[ax] = 2 * NLIMBS
    acc = jnp.zeros(shape, jnp.uint32)
    for j in range(NLIMBS):
        p = a * _take(b, j, j + 1, axis)  # exact in uint32
        acc = acc + _pad_ax(p & MASK, j, NLIMBS - j, axis)
        acc = acc + _pad_ax(p >> LIMB_BITS, j + 1, NLIMBS - 1 - j, axis)
    return carry_prop(acc, 2 * NLIMBS, axis)


def mul_lo(a, b, axis: int = -2):
    """Truncated product mod 2^256 -> (..., 16, X)."""
    ax = axis % max(a.ndim, b.ndim)
    shape = list(jnp.broadcast_shapes(a.shape, b.shape))
    shape[ax] = NLIMBS
    acc = jnp.zeros(shape, jnp.uint32)
    for j in range(NLIMBS):
        w = NLIMBS - j
        p = _take(a, 0, w, axis) * _take(b, j, j + 1, axis)
        acc = acc + _pad_ax(p & MASK, j, 0, axis)
        if w > 1:
            acc = acc + _pad_ax(
                _take(p >> LIMB_BITS, 0, w - 1, axis), j + 1, 0, axis)
    return carry_prop(acc, NLIMBS, axis)


def add_limbs(a, b, out_limbs: int, axis: int = -2):
    ax = axis % max(a.ndim, b.ndim)
    n = max(a.shape[ax % a.ndim], b.shape[ax % b.ndim])
    return carry_prop(
        _pad_ax(a, 0, n - a.shape[ax % a.ndim], axis)
        + _pad_ax(b, 0, n - b.shape[ax % b.ndim], axis),
        out_limbs, axis)


def _borrow_sub_ks(a, b, axis: int):
    u = a + (MASK - b)
    one_shape = list(u.shape)
    one_shape[axis % u.ndim] = 1
    one = _pad_ax(jnp.ones(one_shape, jnp.uint32), 0,
                  u.shape[axis % u.ndim] - 1, axis)
    u = u + one
    hi = u >> LIMB_BITS
    s = (u & MASK) + _shift_up(hi, 1, axis)
    out, carry = _resolve_unit_carries(s, axis)
    n = u.shape[axis % u.ndim]
    carry_out = carry + _take(hi, n - 1, n, axis)
    return out, carry_out == 0


def _borrow_sub_scan(a, b, axis: int):
    an = jnp.moveaxis(a, axis, 0)
    bn = jnp.moveaxis(jnp.broadcast_to(b, a.shape), axis, 0)

    def body(borrow, ab):
        v = ab[0] - ab[1] - borrow
        return (v >> 31) & 1, v & MASK

    borrow, ys = jax.lax.scan(
        body, jnp.zeros_like(an[0]), jnp.stack([an, bn], axis=1))
    return jnp.moveaxis(ys, 0, axis), jnp.expand_dims(
        borrow == 1, axis % a.ndim)


def _borrow_sub(a, b, axis: int = -2):
    if _carry_impl() == "scan":
        return _borrow_sub_scan(a, b, axis)
    return _borrow_sub_ks(a, b, axis)


def sub_limbs_nonneg(a, b, axis: int = -2):
    """a - b with a >= b guaranteed."""
    out, _ = _borrow_sub(a, b, axis)
    return out


def ge_limbs(a, m, axis: int = -2):
    """a >= m -> bool with the limb axis reduced to length 1."""
    _, under = _borrow_sub(a, m, axis)
    return ~under


def cond_sub(a, m, axis: int = -2):
    """a mod m for a < 2m: subtract m where a >= m."""
    diff, under = _borrow_sub(a, m, axis)
    return jnp.where(under, a, diff)
