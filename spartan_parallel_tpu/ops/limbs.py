"""Limb-decomposed big-integer primitives for TPU (JAX, uint32 tensors).

Representation: a 256-bit integer is 16 little-endian limbs of 16 bits, each
stored in a uint32 lane (shape (..., 16)). All products of canonical limbs
fit exactly in uint32 ((2^16-1)^2 < 2^32) and column sums of a 16x16
schoolbook multiply stay < 2^21, so the entire multiplier runs on the VPU in
native 32-bit integer ops with no 64-bit emulation — the key to making
bignum arithmetic TPU-friendly (the reference uses 4x u64 limbs with
128-bit intermediate products, ristretto255.rs:20-39, which has no TPU
equivalent).

Compiler notes: carry/borrow chains are expressed as `lax.scan` over the
limb axis (one compiled body, not an unrolled scalar chain) and column
accumulation uses static pads instead of scatter — both keep XLA compile
time flat and the runtime vectorized across the batch.

All functions are shape-polymorphic over leading batch dimensions and are
pure jnp (jit/vmap/shard_map-compatible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NLIMBS = 16
LIMB_BITS = 16
MASK = 0xFFFF  # python int: inline literal, pallas-kernel safe


# --------------------------------------------------------------------------
# Host codecs (numpy, exact)
# --------------------------------------------------------------------------
def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    assert 0 <= x < (1 << (LIMB_BITS * n))
    return np.array(
        [(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(n)], dtype=np.uint32
    )


def ints_to_limbs(xs, n: int = NLIMBS) -> np.ndarray:
    """list/iterable of ints -> (len, n) uint32.

    Fast path for values < 2^(16n): serialize via int.to_bytes (C loop)
    and reinterpret as little-endian u16 — ~30x faster than per-limb
    Python bigint masking at 2^20 elements (the witness-upload hot path)."""
    try:
        nbytes = 2 * n
        buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
        a16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), n)
        return a16.astype(np.uint32)
    except OverflowError:
        pass  # some value needs > 16n bits before reduction — generic path
    arr = np.zeros((len(xs), n), dtype=np.uint32)
    cur = np.array([int(x) for x in xs], dtype=object)
    for i in range(n):
        arr[:, i] = (cur & 0xFFFF).astype(np.uint32)
        cur >>= 16
    assert not np.any(cur), "value does not fit in limbs"
    return arr


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a.reshape(-1)))


def limbs_to_ints(a) -> list:
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    if flat.dtype == np.uint32 and (flat.size == 0 or flat.max() < 0x10000):
        # canonical 16-bit limbs: one from_bytes per element (C loop)
        buf = np.ascontiguousarray(flat.astype("<u2")).tobytes()
        nb = 2 * flat.shape[1]
        return [int.from_bytes(buf[i:i + nb], "little")
                for i in range(0, len(buf), nb)]
    out = np.zeros(flat.shape[0], dtype=object)
    for i in range(flat.shape[1] - 1, -1, -1):
        out = (out << 16) + flat[:, i].astype(object)
    return list(out)


# --------------------------------------------------------------------------
# Device primitives
# --------------------------------------------------------------------------
def _pad_last(a, before: int, after: int):
    cfg = [(0, 0)] * (a.ndim - 1) + [(before, after)]
    return jnp.pad(a, cfg)


def _shift_up(x, d: int, fill: int = 0):
    """Shift limbs toward higher indices by d along the last axis."""
    shifted = _pad_last(x[..., :-d] if d else x, d, 0)
    if fill:
        ones = jnp.ones(x.shape[:-1] + (d,), x.dtype)
        shifted = jnp.concatenate([ones, x[..., :-d]], axis=-1) if d else x
    return shifted


def _resolve_unit_carries(s):
    """Exact carry resolution for limbs s <= 2^16 via Kogge-Stone
    carry-lookahead: generate g = s >> 16 (0/1), propagate p = (s == 0xFFFF),
    prefix-combined in log2(n) rounds of boolean ops — no sequential chain.
    Returns (canonical limbs, carry_out_of_top_limb)."""
    n = s.shape[-1]
    g = (s >> LIMB_BITS).astype(jnp.uint32)  # 0/1
    p = (s & MASK) == MASK
    gk, pk = g, p
    d = 1
    while d < n:
        gl = _shift_up(gk, d)
        pl = _shift_up(pk.astype(jnp.uint32), d, fill=1) != 0
        gk = gk | (jnp.where(pk, gl, 0))
        pk = pk & pl
        d *= 2
    cin = _shift_up(gk, 1)  # carry into limb k = combined generate below k
    out = (s + cin) & MASK
    carry_out = gk[..., gk.shape[-1] - 1]
    return out, carry_out


# Carry/borrow resolution has two interchangeable exact implementations:
#   * "scan":  lax.scan along the limb axis — a single tiny compiled body.
#     Fastest on CPU (the test platform), where XLA fuses the loop well.
#   * "ks":    Kogge-Stone carry-lookahead — log2(n) rounds of whole-array
#     boolean ops, no sequential chain. The TPU-friendly form (the VPU hates
#     32-deep dependent loops over tiny vectors).
# Selected once per process from the active JAX backend; override via
# SPARTAN_CARRY_IMPL={scan,ks} (tests exercise both), or scoped +
# thread-safe via forced_carry_impl() (used by the kernel cache's eager
# CPU fallback, which needs KS without touching process-global state).
import contextlib as _contextlib
import contextvars as _contextvars
import os as _os

_FORCED_CARRY: _contextvars.ContextVar = _contextvars.ContextVar(
    "spartan_forced_carry", default=None)


@_contextlib.contextmanager
def forced_carry_impl(impl: str):
    """Scoped override of the carry implementation for the current
    (thread/task) context only."""
    token = _FORCED_CARRY.set(impl)
    try:
        yield
    finally:
        _FORCED_CARRY.reset(token)


def _carry_impl() -> str:
    forced = _FORCED_CARRY.get() or _os.environ.get("SPARTAN_CARRY_IMPL")
    if forced in ("scan", "ks"):
        return forced
    # scan on CPU (ks's unrolled graphs take minutes in the XLA:CPU
    # optimizer; note scan once triggered an XLA:CPU compiler segfault on a
    # very large fused pipeline graph — run such paths eagerly instead);
    # ks on TPU (VPU-friendly, and the only form that lowers in Pallas).
    try:
        return "scan" if jax.default_backend() == "cpu" else "ks"
    except Exception:
        return "ks"


def _carry_prop_scan(c):
    cols = jnp.moveaxis(c, -1, 0)

    def body(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & MASK

    # zeros_like(cols[0]) (not jnp.zeros) so the carry inherits the input's
    # varying manual axes under shard_map (scan requires matching vma).
    _, ys = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return jnp.moveaxis(ys, 0, -1)


def _carry_prop_ks(c):
    # round 1: fold 32-bit limbs to < 2^17; round 2: to <= 2^16; then exact
    # lookahead resolution of the remaining 0/1 carries.
    x = (c & MASK) + _shift_up(c >> LIMB_BITS, 1)
    s = (x & MASK) + _shift_up(x >> LIMB_BITS, 1)
    out, _ = _resolve_unit_carries(s)
    return out


def carry_prop(c, out_limbs: int):
    """Propagate carries over the last axis; input limbs may hold up to
    32-bit values. Returns canonical 16-bit limbs (uint32 storage). The
    caller guarantees the value fits in out_limbs limbs."""
    n = c.shape[-1]
    if n < out_limbs:
        c = _pad_last(c, 0, out_limbs - n)
    elif n > out_limbs:
        raise ValueError("carry_prop cannot shrink the limb count")
    if _carry_impl() == "scan":
        return _carry_prop_scan(c)
    return _carry_prop_ks(c)


def _borrow_sub_scan(a, b):
    cols = jnp.stack([jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)], axis=1)

    def body(borrow, ab):
        v = ab[0] - ab[1] - borrow  # wraps mod 2^32
        return (v >> 31) & 1, v & MASK

    borrow, ys = jax.lax.scan(body, jnp.zeros_like(cols[0, 0]), cols)
    return jnp.moveaxis(ys, 0, -1), borrow == 1


def _borrow_sub_ks(a, b):
    # a + ~b + 1 with carry-lookahead; underflow iff no carry out.
    u = a + (MASK - b)  # <= 2^17 - 2
    # add 1 at limb 0 (expressed with pad, not .at[]: pallas-lowerable)
    one = _pad_last(jnp.ones(u.shape[:-1] + (1,), jnp.uint32), 0,
                    u.shape[-1] - 1)
    u = u + one
    hi = u >> LIMB_BITS  # 0/1 per limb
    s = (u & MASK) + _shift_up(hi, 1)  # <= 2^16
    out, carry = _resolve_unit_carries(s)
    # total carry out = first-round top carry + lookahead carry (at most one
    # of them is 1: the exact sum a + ~b + 1 < 2^(16n+1)).
    carry_out = carry + hi[..., hi.shape[-1] - 1]
    return out, carry_out == 0


def _borrow_sub(a, b):
    """(a - b) limbwise with borrow propagation; returns (diff, underflow)
    where diff is exact if a >= b (as 16-bit limbs) and underflow is a bool
    tensor (batch dims) true iff a < b. Inputs canonical, same limb count."""
    if _carry_impl() == "scan":
        return _borrow_sub_scan(a, b)
    return _borrow_sub_ks(a, b)


def mul_wide(a, b):
    """(..., 16) x (..., 16) -> (..., 32) canonical limbs of the full product."""
    acc = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (32,), jnp.uint32)
    for j in range(NLIMBS):
        p = a * b[..., j : j + 1]  # exact in uint32
        acc = acc + _pad_last(p & MASK, j, 16 - j)
        acc = acc + _pad_last(p >> LIMB_BITS, j + 1, 15 - j)
    return carry_prop(acc, 32)


def mul_lo(a, b):
    """Truncated product mod 2^256: (...,16) x (...,16) -> (...,16)."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    acc = jnp.zeros(shape + (NLIMBS,), jnp.uint32)
    for j in range(NLIMBS):
        w = NLIMBS - j
        p = a[..., :w] * b[..., j : j + 1]
        acc = acc + _pad_last(p & MASK, j, 0)
        if w > 1:
            acc = acc + _pad_last((p >> LIMB_BITS)[..., : w - 1], j + 1, 0)
    return carry_prop(acc, NLIMBS)


def mul_small(a, k: int, out_limbs: int):
    """Multiply (..., n) limbs by a small constant k (k < 2^15)."""
    p = a * jnp.uint32(k)
    acc = _pad_last(p & MASK, 0, 1) + _pad_last(p >> LIMB_BITS, 1, 0)
    return carry_prop(acc, out_limbs)


def add_limbs(a, b, out_limbs: int):
    """Exact limb addition with carry propagation (no modular reduction)."""
    n = max(a.shape[-1], b.shape[-1])
    return carry_prop(
        _pad_last(a, 0, n - a.shape[-1]) + _pad_last(b, 0, n - b.shape[-1]),
        out_limbs,
    )


def sub_limbs_nonneg(a, b):
    """a - b where the caller guarantees a >= b. Same limb count."""
    if b.shape[-1] < a.shape[-1]:
        b = _pad_last(b, 0, a.shape[-1] - b.shape[-1])
    d, _ = _borrow_sub(a, b)
    return d


def cond_sub(a, m_limbs, a_hi=None):
    """Return a - m if (a_hi*2^(16*n) + a) >= m else a, canonical limbs.

    `m_limbs` is a host numpy constant (n,). `a_hi` is an optional extra
    high limb of a (uint32 tensor) for values one limb wider than m; when
    used, a_hi must be 0 or 1 and a - m must fit back in n limbs."""
    m = jnp.broadcast_to(jnp.asarray(m_limbs, jnp.uint32), a.shape)
    d, under = _borrow_sub(a, m)
    if a_hi is not None:
        ge = jnp.logical_or(a_hi > 0, ~under)
    else:
        ge = ~under
    return jnp.where(ge[..., None], d, a)


def ge_limbs(a, m_limbs):
    """a >= m (host constant), returns bool tensor over batch dims."""
    n = a.shape[-1]
    m = jnp.broadcast_to(
        jnp.asarray(
            np.concatenate(
                [np.asarray(m_limbs, np.uint32), np.zeros(max(0, n - len(m_limbs)), np.uint32)]
            ),
            jnp.uint32,
        ),
        a.shape,
    )
    _, under = _borrow_sub(a, m)
    return ~under
