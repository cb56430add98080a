"""Limb-SUBLANE round kernels for the disjoint-rounds sumchecks.

Same math as ops/sumcheck.py (fixed-shape buffers, dynamic n_half live
markers, dense zero-padding), but the tables carry their limbs on the
SUBLANE axis:

    phase 1:  B/C/D  (P, Q, 16, X)     eq tables  tp/tq/tx  (16, N)
    phase 2:  ABC/Z  (P, W, 16, Y)     eq table   ep        (16, P)

so the (8,128) TPU tile pads nothing (16 limbs = 2 sublane tiles, the
long axis rides the lanes) — the limb-last layout pays 8x HBM on every
buffer and sweep (see ops/limbf.py). Contractions reduce the lane axis
first (the big one), then move the small remaining axes onto the lanes.

Used by the device round scans (ops/zk_round.py); the host round loop
keeps the limb-last kernels, and the two paths are byte-identical
(tests/test_zk_round.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fqf
from .sumcheck import MODE_P, MODE_Q, MODE_W, MODE_X


def _axis_mask(t, axis: int, n_half):
    ax = axis % t.ndim
    n = t.shape[ax]
    i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    shape = [1] * t.ndim
    shape[ax] = n
    return (i < n_half).reshape(shape)


def _lohi(t, axis: int, n_half):
    mask = _axis_mask(t, axis, n_half)
    lo = jnp.where(mask, t, 0)
    hi = jnp.where(mask, jnp.roll(t, -n_half.astype(jnp.int32),
                                  axis=axis % t.ndim), 0)
    return lo, hi


def _fold_live(t, axis: int, n_half, r_b):
    """One bind: lo + r*(hi - lo); r_b pre-broadcast to limb axis -2."""
    lo, hi = _lohi(t, axis, n_half)
    return fqf.add(lo, fqf.mul(r_b, fqf.sub(hi, lo)))


def _ext2(lo, hi):
    return fqf.sub(fqf.add(hi, hi), lo)


def _ext3(e2, lo, hi):
    return fqf.add(e2, fqf.sub(hi, lo))


def _r4(r):
    """(16,) scalar -> (1, 1, 16, 1) broadcast for 4-D tables."""
    return r.reshape(1, 1, 16, 1)


def _r2(r):
    """(16,) scalar -> (16, 1) broadcast for eq tables."""
    return r.reshape(16, 1)


def eq_fold(t, r, n_half):
    """(16, N) eq table fold on lanes."""
    return _fold_live(t, -1, n_half, _r2(r))


def _contract_p1(g, tp, tq, tx_f):
    """g (P, Q, 16, X) * eq_x(16, X) * eq_q(16, Q) * eq_p(16, P) -> (16,)."""
    s = fqf.dot_lanes(g, tx_f[None, None])[..., 0]     # (P, Q, 16)
    s = jnp.moveaxis(s, 1, -1)                         # (P, 16, Q)
    s = fqf.dot_lanes(s, tq[None])[..., 0]             # (P, 16)
    s = jnp.moveaxis(s, 0, -1)                         # (16, P)
    return fqf.dot_lanes(s, tp)[..., 0]                # (16,)


def p1_evals(tp, tq, tx, B, C, D, n_half, mode: int):
    """Round-poly evals (3, 16): sublane mirror of _p1_evals_impl."""
    axis = {MODE_X: 3, MODE_Q: 1, MODE_P: 0}[mode]
    Blo, Bhi = _lohi(B, axis, n_half)
    Clo, Chi = _lohi(C, axis, n_half)
    Dlo, Dhi = _lohi(D, axis, n_half)
    eqs = {0: tp, 1: tq, 3: tx}
    elo, ehi = _lohi(eqs[axis], -1, n_half)

    def contract(g, eq_f):
        tabs = dict(eqs)
        tabs[axis] = eq_f
        return _contract_p1(g, tabs[0], tabs[1], tabs[3])

    def g_of(b, c, d):
        return fqf.sub(fqf.mul(b, c), d)

    e0 = contract(g_of(Blo, Clo, Dlo), elo)
    B2, C2, D2 = _ext2(Blo, Bhi), _ext2(Clo, Chi), _ext2(Dlo, Dhi)
    t2 = _ext2(elo, ehi)
    e2 = contract(g_of(B2, C2, D2), t2)
    B3, C3, D3 = (_ext3(B2, Blo, Bhi), _ext3(C2, Clo, Chi),
                  _ext3(D2, Dlo, Dhi))
    t3 = _ext3(t2, elo, ehi)
    e3 = contract(g_of(B3, C3, D3), t3)
    return jnp.stack([e0, e2, e3])


def p1_bind(tp, tq, tx, B, C, D, r, n_half, mode: int):
    axis = {MODE_X: 3, MODE_Q: 1, MODE_P: 0}[mode]
    rb = _r4(r)
    B = _fold_live(B, axis, n_half, rb)
    C = _fold_live(C, axis, n_half, rb)
    D = _fold_live(D, axis, n_half, rb)
    if mode == MODE_P:
        tp = eq_fold(tp, r, n_half)
    elif mode == MODE_Q:
        tq = eq_fold(tq, r, n_half)
    else:
        tx = eq_fold(tx, r, n_half)
    return tp, tq, tx, B, C, D


def _contract_p2(m, ep):
    """m (P, W, 16, Y) summed over W, Y then dotted with ep (16, P)."""
    s = fqf.sum_lanes(m)[..., 0]                       # (P, W, 16)
    s = jnp.moveaxis(s, 1, -1)                         # (P, 16, W)
    s = fqf.sum_lanes(s)[..., 0]                       # (P, 16)
    s = jnp.moveaxis(s, 0, -1)                         # (16, P)
    return fqf.dot_lanes(s, ep)[..., 0]                # (16,)


def p2_evals(ep, ABC, Z, n_half, mode: int, single_inst: bool):
    axis = {MODE_X: 3, MODE_W: 1, MODE_P: 0}[mode]
    Zlo, Zhi = _lohi(Z, axis, n_half)
    if mode == MODE_P and single_inst:
        Alo = Ahi = ABC
    else:
        Alo, Ahi = _lohi(ABC, axis, n_half)
    if mode == MODE_P:
        elo, ehi = _lohi(ep, -1, n_half)
    else:
        elo = ehi = ep

    def contract(a, z, eq_p):
        return _contract_p2(fqf.mul(a, z), eq_p)

    e0 = contract(Alo, Zlo, elo)
    A2 = Alo if (mode == MODE_P and single_inst) else _ext2(Alo, Ahi)
    Z2 = _ext2(Zlo, Zhi)
    t2 = _ext2(elo, ehi) if mode == MODE_P else elo
    e2 = contract(A2, Z2, t2)
    A3 = Alo if (mode == MODE_P and single_inst) else _ext3(A2, Alo, Ahi)
    Z3 = _ext3(Z2, Zlo, Zhi)
    t3 = _ext3(t2, elo, ehi) if mode == MODE_P else elo
    e3 = contract(A3, Z3, t3)
    return jnp.stack([e0, e2, e3])


def p2_bind(ep, ABC, Z, r, n_half, mode: int, single_inst: bool):
    axis = {MODE_X: 3, MODE_W: 1, MODE_P: 0}[mode]
    rb = _r4(r)
    Z = _fold_live(Z, axis, n_half, rb)
    if not (mode == MODE_P and single_inst):
        ABC = _fold_live(ABC, axis, n_half, rb)
    if mode == MODE_P:
        ep = eq_fold(ep, r, n_half)
    return ep, ABC, Z
