"""Device ristretto255 ENCODE + fixed-base Pedersen commits.

Companions to the device transcript (ops/transcript_dev.py): a ZK sumcheck
round must commit each round polynomial / claim and absorb the COMPRESSED
point, so latency-free Fiat-Shamir needs compression and the tiny
fixed-generator MSMs on device too.

- compress: RFC 9496 section 4.3.2 over ops/fp.py canonical limbs, with the
  (p-5)/8 exponentiation as the standard curve25519 addition chain
  (sequences of fori_loop squarings). Mirrors core/edwards.py:128-146.
- comb tables: per-generator 4-bit fixed-base windows T[w][v] = (v*16^w)*G,
  precomputed once on host (generators are long-lived protocol state), so a
  commitment is 64 table gathers + a tree reduce per generator — no
  doublings, no data-dependent branches.

Reference: commitments.rs:15-43 commits via curve25519-dalek's
vartime_multiscalar_mul; same math, TPU layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.consts import INVSQRT_A_MINUS_D, P, SQRT_M1
from . import curve, fp, fq

SQRT_M1_LIMBS = fp.const(SQRT_M1)
INVSQRT_A_MINUS_D_LIMBS = fp.const(INVSQRT_A_MINUS_D)


# --------------------------------------------------------------------------
# x^((P-5)/8) = x^(2^252 - 3): curve25519 pow22523 addition chain
# --------------------------------------------------------------------------
def _nsquare(x, n: int):
    # Loop form deliberately kept: fully unrolling the ~254-square chain
    # SIGKILLed the remote TPU compile helper (6.4 MB MLIR body) and
    # segfaulted XLA:CPU. The device ZK-round tail costs ~0.5 s/round
    # (probe: the table sweep is 0.1 ms/round) — the suspect is the
    # dynamic-pos STROBE absorb/squeeze machinery, to be profiled next.
    return jax.lax.fori_loop(0, n, lambda _, v: fp.square(v), x)


def pow_p58(x):
    # standard chain (ref10 pow22523):
    t0 = fp.square(x)                      # x^2
    t1 = fp.square(fp.square(t0))          # x^8
    t1 = fp.mul(x, t1)                     # x^9
    t0 = fp.mul(t0, t1)                    # x^11
    t0 = fp.square(t0)                     # x^22
    t0 = fp.mul(t1, t0)                    # x^31 = x^(2^5 - 1)
    t1 = _nsquare(t0, 5)                   # x^(2^10 - 2^5)
    t0 = fp.mul(t1, t0)                    # x^(2^10 - 1)
    t1 = _nsquare(t0, 10)
    t1 = fp.mul(t1, t0)                    # x^(2^20 - 1)
    t2 = _nsquare(t1, 20)
    t1 = fp.mul(t2, t1)                    # x^(2^40 - 1)
    t1 = _nsquare(t1, 10)
    t0 = fp.mul(t1, t0)                    # x^(2^50 - 1)
    t1 = _nsquare(t0, 50)
    t1 = fp.mul(t1, t0)                    # x^(2^100 - 1)
    t2 = _nsquare(t1, 100)
    t1 = fp.mul(t2, t1)                    # x^(2^200 - 1)
    t1 = _nsquare(t1, 50)
    t0 = fp.mul(t1, t0)                    # x^(2^250 - 1)
    t0 = _nsquare(t0, 2)                   # x^(2^252 - 4)
    return fp.mul(t0, x)                   # x^(2^252 - 3)


def _is_neg(x):
    """x canonical (..., 16) limbs -> (...,) bool, LSB test."""
    return (x[..., 0] & jnp.uint32(1)) == 1


def _ct_abs(x):
    return fp.select(_is_neg(x), fp.sub(jnp.zeros_like(x), x), x)


def _eq(a, b):
    """Canonical-limb equality -> (...,) bool."""
    return jnp.all(a == b, axis=-1)


def sqrt_ratio_m1(u, v):
    """(was_square, r): RFC 9496 section 4.2 (core/edwards.py:46-62)."""
    v3 = fp.mul(fp.square(v), v)
    v7 = fp.mul(fp.square(v3), v)
    r = fp.mul(fp.mul(u, v3), pow_p58(fp.mul(u, v7)))
    check = fp.mul(v, fp.square(r))
    neg_u = fp.sub(jnp.zeros_like(u), u)
    correct_sign = _eq(check, u)
    flipped_sign = _eq(check, neg_u)
    flipped_sign_i = _eq(check, fp.mul_const(neg_u, SQRT_M1_LIMBS))
    r = fp.select(flipped_sign | flipped_sign_i,
                  fp.mul_const(r, SQRT_M1_LIMBS), r)
    r = _ct_abs(r)
    return correct_sign | flipped_sign, r


def compress(pt):
    """(..., 4, 16) extended point -> (..., 32) uint32 bytes.

    Ristretto ENCODE, mirroring core/edwards.py:128-146."""
    X = pt[..., 0, :]
    Y = pt[..., 1, :]
    Z = pt[..., 2, :]
    T = pt[..., 3, :]
    u1 = fp.mul(fp.add(Z, Y), fp.sub(Z, Y))
    u2 = fp.mul(X, Y)
    one = jnp.zeros_like(u1).at[..., 0].set(1)
    _, invsqrt = sqrt_ratio_m1(one, fp.mul(u1, fp.square(u2)))
    den1 = fp.mul(invsqrt, u1)
    den2 = fp.mul(invsqrt, u2)
    z_inv = fp.mul(fp.mul(den1, den2), T)
    ix0 = fp.mul_const(X, SQRT_M1_LIMBS)
    iy0 = fp.mul_const(Y, SQRT_M1_LIMBS)
    enchanted = fp.mul_const(den1, INVSQRT_A_MINUS_D_LIMBS)
    rotate = _is_neg(fp.mul(T, z_inv))
    x = fp.select(rotate, iy0, X)
    y = fp.select(rotate, ix0, Y)
    den_inv = fp.select(rotate, enchanted, den2)
    y = fp.select(_is_neg(fp.mul(x, z_inv)),
                  fp.sub(jnp.zeros_like(y), y), y)
    s = _ct_abs(fp.mul(den_inv, fp.sub(Z, y)))
    # (..., 16) 16-bit limbs -> (..., 32) LE bytes
    lo = s & jnp.uint32(0xFF)
    hi = (s >> jnp.uint32(8)) & jnp.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(s.shape[:-1] + (32,))


# --------------------------------------------------------------------------
# Fixed-base 4-bit comb tables
# --------------------------------------------------------------------------
def make_comb_tables(gens) -> np.ndarray:
    """list of n RistrettoPoint -> (n, 64, 16, 4, 16) uint32 host array.

    T[g, w, v] = (v * 16^w) * G_g; scalar-mul then becomes 64 gathers +
    adds per generator, with T[g, w, 0] = identity."""
    n = len(gens)
    out = np.empty((n, 64, 16, 4, 16), dtype=np.uint32)
    for g, G in enumerate(gens):
        base = G
        for w in range(64):
            row = [None] * 16
            acc = None
            for v in range(16):
                if v == 0:
                    row[v] = curve.identity()
                else:
                    acc = base if acc is None else acc + base
                    row[v] = curve.encode_points([acc])[0]
            out[g, w] = np.stack(row)
            base = acc + base  # 16^(w+1) * G  (acc = 15*base here)
    return out


def comb_commit(tables, scalars_mont):
    """tables: (n, 64, 16, 4, 16) device; scalars_mont: (n, 16) Montgomery.

    -> one (4, 16) point = sum_g scalars[g] * G_g."""
    canon = fq.to_canonical(scalars_mont)  # (n, 16) 16-bit limbs
    # limb i -> nibbles 4i..4i+3 (LE): digit[w] for w = 4i + j
    sh = jnp.asarray(np.array([0, 4, 8, 12], np.uint32))
    digits = ((canon[..., None] >> sh) & jnp.uint32(0xF))  # (n, 16, 4)
    digits = digits.reshape(canon.shape[0], 64)
    picked = jnp.take_along_axis(
        tables, digits[:, :, None, None, None].astype(jnp.int32), axis=2
    )[:, :, 0]  # (n, 64, 4, 16)
    return curve.tree_reduce(picked.reshape(-1, 4, 16), axis=0)
