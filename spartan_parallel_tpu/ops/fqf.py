"""Scalar-field arithmetic mod L in limb-SUBLANE layout (..., 16, X).

Counterpart of ops/fq.py for the big HBM-resident sumcheck tables,
where the limb-last layout's 8x lane padding (see ops/limbf.py) both
OOM'd the chip at 2^20 constraints and multiplied every round sweep's
HBM traffic by 8. Values are Montgomery-form 16x16-bit limbs on the
SUBLANE axis (-2); the long data axes ride the lanes.

Interop: a (16,)-vector scalar is identical in both layouts;
`to_sublane`/`from_sublane` are single transposes for bulk tensors,
paid once per prove at the assembly boundary — the per-round sweeps are
what must be padding-free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import limbf as lf
from .fq import L_LIMBS, LPRIME_LIMBS, R2_LIMBS

_NL = 16


def _c(host_limbs, ndim: int):
    """(k,) host constant -> (1, .., k, 1): limbs on axis -2, broadcast
    over lanes and leading batch dims."""
    arr = np.asarray(host_limbs, np.uint32)
    return jnp.asarray(arr.reshape((1,) * max(0, ndim - 2)
                                   + (arr.shape[0], 1)))


def to_sublane(a):
    """(..., N, 16) limb-last -> (..., 16, N)."""
    return jnp.swapaxes(jnp.asarray(a), -1, -2)


def from_sublane(a):
    """(..., 16, N) -> (..., N, 16) limb-last."""
    return jnp.swapaxes(a, -1, -2)


def redc(t):
    """(..., 32, X) canonical limbs t < L*2^256 -> (..., 16, X) t/R mod L."""
    ndim = t.ndim
    t_lo = lf._take(t, 0, _NL, -2)
    m = lf.mul_lo(t_lo, _c(LPRIME_LIMBS, ndim))
    w = lf.mul_wide(m, _c(L_LIMBS, ndim))
    s = lf.carry_prop(t + w, 32)
    return lf.cond_sub(lf._take(s, _NL, 2 * _NL, -2), _c(L_LIMBS, ndim))


def mul(a, b):
    """Montgomery product on (..., 16, X) operands (broadcasting)."""
    return redc(lf.mul_wide(a, b))


def add(a, b):
    ndim = max(a.ndim, b.ndim)
    s = lf.carry_prop(a + b, _NL)
    return lf.cond_sub(s, _c(L_LIMBS, ndim))


def sub(a, b):
    ndim = max(a.ndim, b.ndim)
    t = lf.add_limbs(a, _c(L_LIMBS, ndim), _NL)
    d = lf.sub_limbs_nonneg(t, b)
    return lf.cond_sub(d, _c(L_LIMBS, ndim))


_CHUNK = 1 << 15  # lane-sum bound: 2^15 * 2^16 < 2^31 fits uint32


def _resolve(lazy):
    """(..., 16, k) uint32 lazy limb sums (< 2^15 addends) -> Montgomery.

    Value < 2^15 * L < 2^268: carry to 18 canonical limbs, widen, REDC
    (divides by R), multiply by R^2 to restore the Montgomery scaling —
    the sublane mirror of ops/fq.resolve_lazy."""
    wide = lf.carry_prop(lazy, 18)
    padded = lf._pad_ax(wide, 0, 32 - 18, -2)
    return mul(redc(padded), _c(R2_LIMBS, lazy.ndim))


def sum_lanes(a):
    """Field sum along the LANE axis: (..., 16, X) -> (..., 16, 1)."""
    out = a
    while out.shape[-1] > 1:
        n = out.shape[-1]
        c = min(_CHUNK, n)
        pad = (-n) % c
        if pad:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
        out = out.reshape(out.shape[:-1] + (-1, c))  # (..., 16, n/c, c)
        lazy = jnp.sum(out, axis=-1, dtype=jnp.uint32)  # (..., 16, n/c)
        out = _resolve(lazy)
    return out


def dot_lanes(a, b):
    """<a, b> along lanes: (..., 16, X) pairs -> (..., 16, 1)."""
    return sum_lanes(mul(a, b))
