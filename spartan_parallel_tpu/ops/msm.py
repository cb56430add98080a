"""Pippenger multi-scalar multiplication on TPU.

TPU-native equivalent of the reference's `VartimeMultiscalarMul`
(src/group.rs:89, which delegates to curve25519-dalek's CPU Straus/Pippenger)
— the cost center of every Pedersen commitment, Hyrax opening, and bullet
reduction round.

Design: sort + prefix-scan bucket accumulation.

The classic Pippenger bucket loop is a scatter — hostile to a lockstep
vector machine (per-lane addressing does not exist on the VPU, and XLA:TPU
scatter serializes; a scatter-in-scan prototype measured latency-bound at
~75k points/s). Instead we exploit that curve points form a GROUP:
negation is free (negate X and T), so bucket sums are DIFFERENCES of an
inclusive prefix scan over digit-sorted points:

  * scalars -> 32 windows of 8-bit digits (a cheap limb re-slice);
  * per window: argsort the digits (XLA bitonic sort, vectorized), gather
    points into sorted order, then ONE work-efficient
    `jax.lax.associative_scan` of point adds (~2N batched adds, log depth);
  * bucket_b = prefix[end_b] - prefix[start_b] with the boundaries from a
    vectorized searchsorted — 256 gathers + 256 point-subs;
  * the weighted bucket sum via a reversed associative_scan
    (sum_v v*B_v = sum_v S_v with S_v the suffix sums);
  * window results combine on device with 8 doublings per window (Horner).

Every stage is a full-width batched tensor op — no scatter, no
data-dependent loops, no step whose operand is smaller than the array.
Batched MSM (B rows sharing one generator set — the Hyrax polycommit
shape, dense_mlpoly.rs:183-197) vmaps rows, so a whole polycommit is ONE
kernel launch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.edwards import RistrettoPoint
from . import curve
from .kernel_cache import cached_kernel

WINDOW_BITS = 8
NUM_WINDOWS = 32  # 256 bits / 8
NUM_BUCKETS = 1 << WINDOW_BITS


def digits_from_limbs(limbs):
    """(..., 16) canonical 16-bit limbs -> (..., 32) 8-bit window digits."""
    lo = limbs & jnp.uint32(0xFF)
    hi = (limbs >> 8) & jnp.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(limbs.shape[:-1] + (32,))


def _window_sum_sorted(points, digits):
    """One window, one MSM row: digits (N,), points (N,4,16) -> (4,16)."""
    n = points.shape[0]
    order = jnp.argsort(digits)
    ds = digits[order]
    ps = jnp.take(points, order, axis=0)
    # inclusive prefix sums of sorted points: work-efficient, log depth
    prefix = jax.lax.associative_scan(curve.point_add, ps, axis=0)
    # bucket_b = prefix[end_b - 1] - prefix[start_b - 1]; prepend identity
    prefix_ext = jnp.concatenate(
        [jnp.asarray(curve.identity((1,))), prefix], axis=0)
    bounds = jnp.searchsorted(
        ds, jnp.arange(1, NUM_BUCKETS + 1, dtype=ds.dtype),
        side="left")  # (256,): bounds[b-1] = start of bucket b
    ends = jnp.concatenate([bounds[1:], jnp.full((1,), n, bounds.dtype)])
    hi = jnp.take(prefix_ext, ends, axis=0)  # (256, 4, 16)
    lo = jnp.take(prefix_ext, bounds, axis=0)
    buckets = curve.point_add(hi, curve.point_neg(lo))  # buckets 1..256?
    # buckets[i] is bucket value i+1 for i in 0..254; last entry is the
    # (empty) range [start_256, n) = identity — drop it.
    buckets = buckets[: NUM_BUCKETS - 1]  # values 1..255
    suffix = jax.lax.associative_scan(
        curve.point_add, buckets, axis=0, reverse=True)
    return curve.tree_reduce(suffix, axis=0)


@cached_kernel()
def _msm_sorted(points, limbs):
    """points (N, 4, 16); limbs (B, N, 16) -> (B, 4, 16)."""
    def win_body(_, w):
        limb_idx = w >> 1
        shift = (w & 1) << 3
        digits = (limbs[..., limb_idx] >> shift) & jnp.uint32(0xFF)  # (B,N)
        win = jax.vmap(lambda d: _window_sum_sorted(points, d))(digits)
        return None, win  # (B, 4, 16)

    _, wins = jax.lax.scan(win_body, None,
                           jnp.arange(NUM_WINDOWS, dtype=jnp.uint32))

    # Horner combine from the top window: acc = 256*acc + win[w], as a
    # scan (one traced body) rather than 248 unrolled point ops.
    def comb_body(acc, win):
        for _ in range(WINDOW_BITS):
            acc = curve.point_double(acc)
        return curve.point_add(acc, win), None

    acc, _ = jax.lax.scan(comb_body, wins[NUM_WINDOWS - 1],
                          wins[: NUM_WINDOWS - 1], reverse=True)
    return acc


def msm_dev(points_dev, scalar_limbs):
    """Batched Pippenger MSM, result left on device.

    points_dev: (N, 4, 16) device points (shared by all rows).
    scalar_limbs: (B, N, 16) or (N, 16) canonical (non-Montgomery) limbs.
    Returns (B, 4, 16) device array of extended-Edwards points.
    """
    scalar_limbs = jnp.asarray(scalar_limbs)
    if scalar_limbs.ndim == 2:
        scalar_limbs = scalar_limbs[None]
    return _msm_sorted(jnp.asarray(points_dev), scalar_limbs)


def msm(points_dev, scalar_limbs) -> list:
    """Batched Pippenger MSM; returns a list of B RistrettoPoint (host)."""
    out = msm_dev(points_dev, scalar_limbs)
    return curve.decode_points(np.asarray(jax.device_get(out)))


def msm_single(points_dev, scalar_limbs) -> RistrettoPoint:
    return msm(points_dev, scalar_limbs)[0]
