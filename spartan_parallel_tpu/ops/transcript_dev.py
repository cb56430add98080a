"""Device-side merlin transcript: Keccak-f[1600] + STROBE-128 on TPU.

The host transcript (utils/transcript.py) forces one device->host sync per
sumcheck round: the round-poly commitment must reach the host to be
absorbed before the next challenge can be squeezed. Through the remote-TPU
relay that sync costs a flat ~25 ms — at 2^20 constraints the prover spends
more time waiting on Fiat-Shamir serialization than computing.

This module removes the sync by running the transcript ON DEVICE,
byte-exactly: the same STROBE-128 subset merlin uses (utils/strobe.py,
merlin's strobe.rs), over a jnp Keccak-f[1600]. Whole sumcheck phases then
run as lax.scan with zero host round trips; the host replays the absorbs
afterwards from the fetched proof artifacts and lands in the identical
transcript state (asserted in tests).

State is a triple (st, pos, pos_begin): st is the 200-byte sponge state as
a (200,) uint32 array of byte values, pos/pos_begin are uint32 scalars.
All op lengths are static (labels and message sizes are compile-time
constants in every protocol schedule); only the state is traced, so each
op lowers to a fixed graph with one conditional permutation.

Reference chain: src/transcript.rs -> merlin crate -> STROBE-128.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import fq

STROBE_R = 166

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_M = 1 << 4
FLAG_K = 1 << 5

# --------------------------------------------------------------------------
# Keccak-f[1600] on (25,) u32 lane pairs
# --------------------------------------------------------------------------
_RC64 = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC64], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC64], dtype=np.uint32)

# rho rotation offsets, lane (x, y) at flat index x + 5*y (utils/keccak.py)
_ROT_XY = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
# rho+pi as one permutation: dst[(2x+3y)%5 * 5 + y] = rotl(src[x+5y], rot)
_PI_SRC = np.zeros(25, dtype=np.int32)
_PI_ROT = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _dst = ((2 * _x + 3 * _y) % 5) * 5 + _y
        _PI_SRC[_dst] = _x + 5 * _y
        _PI_ROT[_dst] = _ROT_XY[_x][_y]


def _rotl64(lo, hi, rot: np.ndarray):
    """Per-element rotate-left of 64-bit (lo, hi) pairs by constant rot."""
    sw = rot >= 32
    lo, hi = jnp.where(sw, hi, lo), jnp.where(sw, lo, hi)
    rr = rot % 32
    z = rr == 0
    rs = np.where(z, 1, rr).astype(np.uint32)  # avoid 32-bit shifts
    lo2 = jnp.where(z, lo, (lo << rs) | (hi >> (32 - rs)))
    hi2 = jnp.where(z, hi, (hi << rs) | (lo >> (32 - rs)))
    return lo2, hi2


def _f1600(lo, hi):
    """(25,) u32 lo/hi lane pairs -> permuted pair."""
    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)

    def round_fn(i, lanes):
        lo, hi = lanes
        # theta
        a_lo = lo.reshape(5, 5)  # [y, x]
        a_hi = hi.reshape(5, 5)
        c_lo = a_lo[0] ^ a_lo[1] ^ a_lo[2] ^ a_lo[3] ^ a_lo[4]  # (5,) by x
        c_hi = a_hi[0] ^ a_hi[1] ^ a_hi[2] ^ a_hi[3] ^ a_hi[4]
        r_lo, r_hi = _rotl64(jnp.roll(c_lo, -1), jnp.roll(c_hi, -1),
                             np.ones(5, np.int32))
        d_lo = jnp.roll(c_lo, 1) ^ r_lo
        d_hi = jnp.roll(c_hi, 1) ^ r_hi
        lo = (a_lo ^ d_lo[None, :]).reshape(25)
        hi = (a_hi ^ d_hi[None, :]).reshape(25)
        # rho + pi
        lo, hi = _rotl64(lo[_PI_SRC], hi[_PI_SRC], _PI_ROT)
        # chi
        b_lo = lo.reshape(5, 5)
        b_hi = hi.reshape(5, 5)
        lo = (b_lo ^ (~jnp.roll(b_lo, -1, 1) & jnp.roll(b_lo, -2, 1)))
        hi = (b_hi ^ (~jnp.roll(b_hi, -1, 1) & jnp.roll(b_hi, -2, 1)))
        lo = lo.reshape(25)
        hi = hi.reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ rc_lo[i])
        hi = hi.at[0].set(hi[0] ^ rc_hi[i])
        return lo, hi

    # Loop form kept — see ops/ristretto_dev._nsquare for why full
    # unrolling is not viable on either backend's compiler.
    return jax.lax.fori_loop(0, 24, round_fn, (lo, hi))


def permute(st):
    """(200,) u32 byte state -> permuted byte state."""
    b = st.reshape(25, 8)
    sh = jnp.asarray(np.array([0, 8, 16, 24], np.uint32))
    lo = (b[:, :4] << sh[None, :]).sum(axis=1, dtype=jnp.uint32)
    hi = (b[:, 4:] << sh[None, :]).sum(axis=1, dtype=jnp.uint32)
    lo, hi = _f1600(lo, hi)
    w = jnp.stack([lo, hi], axis=1).reshape(25, 2, 1)  # (25, 2, 1)
    by = (w >> sh[None, None, :]) & jnp.uint32(0xFF)
    return by.reshape(200)


# --------------------------------------------------------------------------
# STROBE-128 ops (dynamic pos, static lengths)
# --------------------------------------------------------------------------
def _run_f(st, pos, pos_begin):
    """Host _run_f (utils/strobe.py:56-62) minus the pos reset."""
    st = st.at[pos].set(st[pos] ^ pos_begin)
    st = st.at[pos + 1].set(st[pos + 1] ^ jnp.uint32(0x04))
    st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ jnp.uint32(0x80))
    return permute(st)


_OOB = jnp.uint32(1000)  # scatter/gather index that always drops


def _absorb(s, data):
    """XOR-absorb k bytes (k < STROBE_R) with at most one wrap."""
    st, pos, pos_begin = s
    k = data.shape[0]
    assert k < STROBE_R
    data = data.astype(jnp.uint32)
    i = jnp.arange(k, dtype=jnp.uint32)
    idx = pos + i
    cross = idx >= STROBE_R
    buf1 = jnp.zeros(200, jnp.uint32).at[
        jnp.where(cross, _OOB, idx)].set(
        jnp.where(cross, 0, data), mode="drop")
    st1 = st ^ buf1
    hit = (pos + k) >= STROBE_R
    stf = _run_f(st1, jnp.uint32(STROBE_R), pos_begin)
    buf2 = jnp.zeros(200, jnp.uint32).at[
        jnp.where(cross, idx - STROBE_R, _OOB)].set(
        jnp.where(cross, data, 0), mode="drop")
    st2 = stf ^ buf2
    st_out = jnp.where(hit, st2, st1)
    pos_out = jnp.where(hit, pos + k - STROBE_R, pos + k).astype(jnp.uint32)
    pb_out = jnp.where(hit, 0, pos_begin).astype(jnp.uint32)
    return st_out, pos_out, pb_out


def _squeeze(s, n: int):
    """PRF-squeeze n bytes (n < STROBE_R), zeroing as it reads."""
    st, pos, pos_begin = s
    assert n < STROBE_R
    i = jnp.arange(n, dtype=jnp.uint32)
    idx = pos + i
    cross = idx >= STROBE_R
    out1 = st[jnp.where(cross, 0, idx)]
    st1 = st.at[jnp.where(cross, _OOB, idx)].set(0, mode="drop")
    hit = (pos + n) >= STROBE_R
    stf = _run_f(st1, jnp.uint32(STROBE_R), pos_begin)
    out2 = stf[jnp.where(cross, idx - STROBE_R, 0)]
    st2 = stf.at[jnp.where(cross, idx - STROBE_R, _OOB)].set(0, mode="drop")
    out = jnp.where(cross, out2, out1)
    st_out = jnp.where(hit, st2, st1)
    pos_out = jnp.where(hit, pos + n - STROBE_R, pos + n).astype(jnp.uint32)
    pb_out = jnp.where(hit, 0, pos_begin).astype(jnp.uint32)
    return (st_out, pos_out, pb_out), out


def _begin_op(s, flags: int, more: bool):
    if more:
        return s
    st, pos, pos_begin = s
    data = jnp.stack([pos_begin, jnp.uint32(flags)])
    # pos_begin is set to pos+1 BEFORE the absorb (strobe.py:93-96)
    st, pos, pos_begin = _absorb((st, pos, (pos + 1).astype(jnp.uint32)),
                                 data)
    if flags & (FLAG_C | FLAG_K):
        force = pos != 0
        stf = _run_f(st, pos, pos_begin)
        st = jnp.where(force, stf, st)
        pos = jnp.where(force, 0, pos).astype(jnp.uint32)
        pos_begin = jnp.where(force, 0, pos_begin).astype(jnp.uint32)
    return st, pos, pos_begin


def meta_ad(s, data, more: bool):
    return _absorb(_begin_op(s, FLAG_M | FLAG_A, more), data)


def ad(s, data, more: bool):
    return _absorb(_begin_op(s, FLAG_A, more), data)


def prf(s, n: int, more: bool):
    return _squeeze(_begin_op(s, FLAG_I | FLAG_A | FLAG_C, more), n)


# --------------------------------------------------------------------------
# merlin transcript ops (utils/transcript.py)
# --------------------------------------------------------------------------
def _const_bytes(bs: bytes):
    return jnp.asarray(np.frombuffer(bs, dtype=np.uint8).astype(np.uint32))


def _u32_le(n: int):
    return _const_bytes(n.to_bytes(4, "little"))


def append_message(s, label: bytes, msg):
    """msg: (k,) traced byte array (uint32 values 0..255)."""
    s = meta_ad(s, _const_bytes(label), False)
    s = meta_ad(s, _u32_le(int(msg.shape[0])), True)
    return ad(s, msg, False)


def append_message_const(s, label: bytes, msg: bytes):
    return append_message(s, label, _const_bytes(msg))


def challenge_bytes(s, label: bytes, n: int):
    s = meta_ad(s, _const_bytes(label), False)
    s = meta_ad(s, _u32_le(n), True)
    return prf(s, n, False)


_SHIFT256 = None  # Montgomery form of 2^256 mod L, lazily built


def _shift256():
    global _SHIFT256
    if _SHIFT256 is None:
        _SHIFT256 = fq.const(1 << 256)
    return _SHIFT256


def bytes_to_limbs(by):
    """(2k,) LE bytes -> (k,) 16-bit limbs (uint32)."""
    b = by.reshape(-1, 2)
    return (b[:, 0] | (b[:, 1] << jnp.uint32(8))).astype(jnp.uint32)


def limbs_to_bytes(limbs):
    """(k,) 16-bit limbs -> (2k,) LE bytes."""
    lo = limbs & jnp.uint32(0xFF)
    hi = (limbs >> jnp.uint32(8)) & jnp.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(-1)


def challenge_scalar(s, label: bytes):
    """-> (state, (16,) Montgomery limbs) — Scalar::from_bytes_wide."""
    s, by = challenge_bytes(s, label, 64)
    lo = bytes_to_limbs(by[:32])
    hi = bytes_to_limbs(by[32:])
    val = fq.add(fq.from_canonical(lo),
                 fq.mul(fq.from_canonical(hi), jnp.asarray(_shift256())))
    return s, val


def append_scalar(s, label: bytes, mont):
    """mont: (16,) Montgomery limbs."""
    return append_message(s, label, limbs_to_bytes(fq.to_canonical(mont)))


def append_scalar_vector(s, label: bytes, monts):
    """monts: (n, 16) Montgomery limbs (src/transcript.rs:49-57)."""
    s = append_message_const(s, label, b"begin_append_vector")
    for i in range(monts.shape[0]):
        s = append_scalar(s, label, monts[i])
    return append_message_const(s, label, b"end_append_vector")


def append_point(s, label: bytes, pt_bytes):
    """pt_bytes: (32,) compressed ristretto bytes."""
    return append_message(s, label, pt_bytes)


# --------------------------------------------------------------------------
# host <-> device state transfer
# --------------------------------------------------------------------------
def from_host(transcript):
    """Snapshot a host utils/transcript.Transcript into a device state."""
    sb = transcript.strobe
    st = jnp.asarray(np.frombuffer(bytes(sb.state), np.uint8)
                     .astype(np.uint32))
    return (st, jnp.uint32(sb.pos), jnp.uint32(sb.pos_begin))


def to_host_state(s):
    """Device state -> (state bytes, pos, pos_begin) for asserts/replay."""
    st, pos, pos_begin = s
    return (bytes(np.asarray(st, dtype=np.uint8).tobytes()),
            int(pos), int(pos_begin))
