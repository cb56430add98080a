"""Pippenger multi-scalar multiplication on TPU.

TPU-native equivalent of the reference's `VartimeMultiscalarMul`
(src/group.rs:89, which delegates to curve25519-dalek's CPU Straus/Pippenger)
— the cost center of every Pedersen commitment, Hyrax opening, and bullet
reduction round.

Design (vs. the sequential CPU bucket method):
  * scalars -> 32 windows of 8-bit digits (digit extraction is a cheap limb
    re-slice, done on device so device-resident scalars never round-trip);
  * per window: sort points by digit, then a *segmented* inclusive scan
    whose combine op is the complete Edwards addition — an associative op,
    so `lax.associative_scan` evaluates the whole bucket accumulation in
    O(log N) batched rounds of point adds (never a data-dependent loop);
  * bucket sums -> weighted window sum via the standard suffix-accumulation
    recurrence, a 255-step `lax.scan` batched across all MSM rows;
  * the 32 per-window sums are combined on the host (248 doublings —
    negligible, and it keeps the device graph free of tiny sequential tails).

Supports batched MSM (B rows sharing one point set) which is the shape of
Hyrax polynomial commitments (sqrt(N) row MSMs over the same generators).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.edwards import RistrettoPoint
from . import curve

WINDOW_BITS = 8
NUM_WINDOWS = 32  # 256 bits / 8
NUM_BUCKETS = 1 << WINDOW_BITS


def digits_from_limbs(limbs):
    """(..., 16) canonical 16-bit limbs -> (..., 32) 8-bit window digits."""
    lo = limbs & jnp.uint32(0xFF)
    hi = (limbs >> 8) & jnp.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(limbs.shape[:-1] + (32,))


def _segmented_point_scan(pts, starts):
    """Inclusive segmented prefix-sum of points along axis 0."""

    def comb(x, y):
        xv, xf = x
        yv, yf = y
        v = curve.point_select(yf, yv, curve.point_add(xv, yv))
        return v, jnp.logical_or(xf, yf)

    v, _ = jax.lax.associative_scan(comb, (pts, starts), axis=0)
    return v


def _window_sum(keys, points, identity_row):
    """One window, one MSM row: keys (N,), points (N,4,16) -> (4,16).

    Every stage is log-depth: sort -> work-efficient segmented scan ->
    suffix scan over buckets -> tree reduce. No data-dependent or
    255-step sequential tails (those starve the VPU)."""
    order = jnp.argsort(keys)
    ks = keys[order]
    ps = points[order]
    starts = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    ends = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    scanned = _segmented_point_scan(ps, starts)
    # scatter segment totals into their buckets; non-ends dropped
    idx = jnp.where(ends, ks, NUM_BUCKETS)
    buckets = identity_row.at[idx].set(scanned, mode="drop")[:NUM_BUCKETS]
    # weighted sum over buckets: sum_v v * B_v = sum_v S_v with
    # S_v = sum_{u >= v} B_u — a reversed inclusive scan + tree reduce.
    suffix = jax.lax.associative_scan(
        curve.point_add, buckets[1:], axis=0, reverse=True)
    return curve.tree_reduce(suffix, axis=0)


@functools.partial(jax.jit, static_argnames=())
def _msm_device(points, digits):
    """points (N,4,16), digits (32, B, N) -> window sums (32, B, 4, 16)."""
    b = digits.shape[1]
    identity_row = jnp.asarray(curve.identity((NUM_BUCKETS + 1,)))

    def window_body(_, keys_bn):
        sums = jax.vmap(lambda k: _window_sum(k, points, identity_row))(keys_bn)
        return None, sums

    _, out = jax.lax.scan(window_body, None, digits)
    return out


def msm(points_dev, scalar_limbs) -> list:
    """Batched Pippenger MSM.

    points_dev: (N, 4, 16) device points.
    scalar_limbs: (B, N, 16) or (N, 16) canonical (non-Montgomery) limbs,
        device or host.
    Returns a list of B RistrettoPoint results (host).
    """
    single = scalar_limbs.ndim == 2
    if single:
        scalar_limbs = scalar_limbs[None]
    digits = digits_from_limbs(jnp.asarray(scalar_limbs))  # (B, N, 32)
    digits = jnp.moveaxis(digits, -1, 0)  # (32, B, N)
    wins = _msm_device(jnp.asarray(points_dev), digits)
    wins_host = curve.decode_points(np.asarray(jax.device_get(wins)))
    b = scalar_limbs.shape[0]
    out = []
    for row in range(b):
        acc = RistrettoPoint.identity()
        for w in range(NUM_WINDOWS - 1, -1, -1):
            for _ in range(WINDOW_BITS):
                acc = acc.double()
            acc = acc + wins_host[w * b + row]
        out.append(acc)
    return out


def msm_single(points_dev, scalar_limbs) -> RistrettoPoint:
    return msm(points_dev, scalar_limbs)[0]
