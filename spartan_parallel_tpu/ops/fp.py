"""Batched base-field arithmetic mod P = 2^255 - 19 on device.

Canonical-residue representation ((..., 16) uint32 limbs of 16 bits, value
< P after every op). The pseudo-Mersenne shape of P makes reduction two
cheap folds (2^256 = 38 mod P) — no Montgomery machinery needed. This field
underlies the curve kernels in ops/curve.py (the reference delegates this
layer to curve25519-dalek; we build it TPU-native)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.consts import P
from . import limbs as lb

P_LIMBS = lb.int_to_limbs(P)
P2_LIMBS = lb.int_to_limbs(2 * P, 17)


def encode(xs) -> np.ndarray:
    return lb.ints_to_limbs([int(x) % P for x in xs])


def decode(a) -> list:
    return lb.limbs_to_ints(np.asarray(a))


def const(x: int) -> np.ndarray:
    return lb.int_to_limbs(int(x) % P)


def _fold(t):
    """(..., 32) canonical limbs -> (..., 16), canonical residue < P."""
    lo = t[..., :16]
    hi = t[..., 16:]
    h38 = lb.mul_small(hi, 38, 17)  # < 38 * 2^256 < 2^262
    x = lb.add_limbs(lo, h38, 17)  # < 2^256 + 2^262 < 2^263
    # second fold: hi part is x[..., 16] < 2^(263-256) = 2^7
    h2 = x[..., 16:17] * jnp.uint32(38)  # < 2^13
    # add h2 at limb 0 (pad instead of .at[]: pallas-lowerable)
    pad_cfg = [(0, 0)] * (h2.ndim - 1) + [(0, 15)]
    cols = x[..., :16] + jnp.pad(h2, pad_cfg)
    y = lb.carry_prop(cols, 17)  # value < 2^256 + 2^13
    # canonicalize: subtract 2P then P conditionally (2P = 2^256 - 38)
    y = lb.cond_sub(y, P2_LIMBS)
    return lb.cond_sub(y[..., :16], P_LIMBS, a_hi=y[..., 16])


def mul(a, b):
    return _fold(lb.mul_wide(a, b))


def square(a):
    return mul(a, a)


def add(a, b):
    s = lb.carry_prop(a + b, 16)  # a+b < 2P < 2^256
    return lb.cond_sub(s, P_LIMBS)


def sub(a, b):
    t = lb.add_limbs(a, jnp.asarray(P_LIMBS, jnp.uint32), 16)  # a + P < 2^256
    d = lb.sub_limbs_nonneg(t, b)
    return lb.cond_sub(d, P_LIMBS)


def neg(a):
    return sub(jnp.zeros_like(a), a)


def mul_const(a, c_limbs):
    """Multiply by a host constant (16,) limb array."""
    return mul(a, jnp.broadcast_to(jnp.asarray(c_limbs, jnp.uint32), a.shape))


def select(cond, a, b):
    return jnp.where(cond[..., None], a, b)
