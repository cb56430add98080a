"""Batched scalar-field arithmetic mod L on device (Montgomery form).

The TPU-resident counterpart of core/field.py for bulk tensors: sumcheck
table binding, eq-table construction, dot products, witness processing.
Values are stored in Montgomery form (x*R mod L, R = 2^256) as (..., 16)
uint32 limb tensors so a multiply is a single REDC pass
(cf. reference src/scalar/ristretto255.rs:642 montgomery_reduce; here the
reduction is re-derived for 16x16-bit limbs and vectorized over the batch).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.consts import L
from . import limbs as lb

R = (1 << 256) % L
R2 = (R * R) % L
# -L^{-1} mod 2^256
LPRIME = (-pow(L, -1, 1 << 256)) % (1 << 256)

L_LIMBS = lb.int_to_limbs(L)
R2_LIMBS = lb.int_to_limbs(R2)
ONE_LIMBS = lb.int_to_limbs(1)
LPRIME_LIMBS = lb.int_to_limbs(LPRIME)
ZERO_MONT = lb.int_to_limbs(0)
ONE_MONT = lb.int_to_limbs(R)  # 1 in Montgomery form


# --------------------------------------------------------------------------
# Host codecs
# --------------------------------------------------------------------------
def encode(xs) -> np.ndarray:
    """Python ints / core.field.Scalar list -> (n, 16) Montgomery limbs."""
    vals = [(int(x) % L) * R % L for x in xs]
    return lb.ints_to_limbs(vals)


def decode(a) -> list:
    """(..., 16) Montgomery limbs -> list of python ints (canonical)."""
    rinv = pow(R, -1, L)
    return [(v * rinv) % L for v in lb.limbs_to_ints(np.asarray(a))]


def const(x: int) -> np.ndarray:
    """Single scalar -> (16,) Montgomery limbs (host constant)."""
    return lb.int_to_limbs((int(x) % L) * R % L)


def encode_to_device(xs):
    """list of ints/Scalars (< 2^256) -> (n, 16) Montgomery DEVICE array.

    Uploads raw canonical limbs and performs the R-scaling on device
    (from_canonical = one REDC-mul by R^2, valid for any input < 2^256),
    replacing the O(n) host bigint multiply of encode() — the witness
    upload path at 2^20 variables. Limbs ship as uint16 (half the bytes
    through the remote-TPU relay) and widen on device."""
    import jax.numpy as jnp

    limbs16 = lb.ints_to_limbs([int(x) for x in xs]).astype(np.uint16)
    return from_canonical(jnp.asarray(limbs16).astype(jnp.uint32))


# --------------------------------------------------------------------------
# Device ops (all inputs/outputs Montgomery-form canonical limbs)
# --------------------------------------------------------------------------
def _redc_impl(t):
    t_lo = t[..., :16]
    m = lb.mul_lo(t_lo, jnp.asarray(LPRIME_LIMBS, jnp.uint32))
    w = lb.mul_wide(m, jnp.broadcast_to(jnp.asarray(L_LIMBS, jnp.uint32), m.shape))
    # s = t + w: low 256 bits are zero by construction; we need the carry out
    # of the low half into the high half.
    s = lb.carry_prop(t + w, 32)
    return lb.cond_sub(s[..., 16:], L_LIMBS)


def _mul_impl(a, b):
    return _redc_impl(lb.mul_wide(a, b))


def _add_impl(a, b):
    s = lb.carry_prop(a + b, 16)  # a+b < 2L < 2^256
    return lb.cond_sub(s, L_LIMBS)


def _sub_impl(a, b):
    t = lb.add_limbs(a, jnp.asarray(L_LIMBS, jnp.uint32), 16)  # a + L < 2^256
    d = lb.sub_limbs_nonneg(t, b)
    return lb.cond_sub(d, L_LIMBS)


def _eager_dispatch(impl, name):
    """Wrap an op so CONCRETE (non-traced) calls go through the AOT
    kernel cache — host-driver code sprinkles small fq calls between
    kernels, and without this each one re-traces (and on cache-miss
    re-compiles) every call. Traced calls inline into the caller's jit
    as before."""
    from jax.core import Tracer

    from .kernel_cache import cached_kernel

    cached = cached_kernel(name=name)(impl)

    def op(*args):
        if any(isinstance(a, Tracer) for a in args):
            return impl(*args)
        return cached(*args)

    op.__name__ = name
    op.__doc__ = impl.__doc__
    return op


redc = _eager_dispatch(_redc_impl, "fq_redc")
redc.__doc__ = """Montgomery reduction: (..., 32) canonical limbs
t < L*2^256 -> (..., 16) limbs of t*R^{-1} mod L."""
mul = _eager_dispatch(_mul_impl, "fq_mul")
mul.__doc__ = "Montgomery product (a*b*R^{-1}): the field multiply."
add = _eager_dispatch(_add_impl, "fq_add")
sub = _eager_dispatch(_sub_impl, "fq_sub")


def square(a):
    return mul(a, a)


def neg(a):
    z = jnp.zeros_like(a)
    return sub(z, a)


def _widen(a, to: int = 32):
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, to - a.shape[-1])])


def from_canonical(a):
    """Canonical-residue limbs -> Montgomery form (device)."""
    return mul(a, jnp.broadcast_to(jnp.asarray(R2_LIMBS, jnp.uint32), a.shape))


def to_canonical(a):
    """Montgomery form -> canonical-residue limbs (device): REDC(a)."""
    return redc(_widen(a))


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def select(cond, a, b):
    """elementwise select over batch dims; cond shape = batch dims."""
    return jnp.where(cond[..., None], a, b)


_CHUNK = 1 << 15  # column sums stay < 2^15 * 2^16 = 2^31 in uint32


def _sum_reduce_impl(a, axis: int = 0):
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    while n > _CHUNK:
        pad = (-n) % _CHUNK
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )
        a = _colsum_reduce(a.reshape((-1, _CHUNK) + a.shape[1:]), axis=1)
        n = a.shape[0]
    return _colsum_reduce(a, axis=0)


def _colsum_reduce(a, axis: int):
    return resolve_lazy(jnp.sum(a, axis=axis, dtype=jnp.uint32))


def resolve_lazy(cols):
    """Resolve lazily-accumulated Montgomery limbs back to Montgomery form.

    `cols` is an elementwise uint32 sum of up to 2^15 Montgomery-form
    (..., 16) values (each limb < 2^16, so no overflow); the total value is
    < 2^15 * L < 2^268. Used after scatter-add accumulations (SpMV) and
    column sums.
    """
    wide = lb.carry_prop(cols, 18)
    # REDC divides by R; multiply by R^2 to restore Montgomery scaling.
    return mul(redc(_widen(wide)), jnp.broadcast_to(
        jnp.asarray(R2_LIMBS, jnp.uint32), cols.shape[:-1] + (16,)
    ))


def _dot_impl(a, b, axis: int = 0):
    return _sum_reduce_impl(_mul_impl(a, b), axis=axis)


def _eager_dispatch_ax(impl, name):
    """Like _eager_dispatch but with a static trailing `axis` kwarg."""
    from jax.core import Tracer

    from .kernel_cache import cached_kernel

    cached = cached_kernel(static_argnames=("axis",), name=name)(impl)

    def op(*args, axis: int = 0):
        if any(isinstance(a, Tracer) for a in args):
            return impl(*args, axis=axis)
        return cached(*args, axis=axis)

    op.__name__ = name
    return op


sum_reduce = _eager_dispatch_ax(_sum_reduce_impl, "fq_sum_reduce")
sum_reduce.__doc__ = """Sum of field elements along an axis (Montgomery
form in/out). Lazy column accumulation (uint32 never overflows for
<= 2^15 addends), then one REDC + re-scale; larger axes chunked."""
dot = _eager_dispatch_ax(_dot_impl, "fq_dot")
dot.__doc__ = "Inner product sum(a*b) along axis."
