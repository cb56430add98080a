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

# Window width selection (round-5 roofline work): per window the kernel
# pays one argsort + one ~2N-add prefix scan + ~3*2^wbits bucket-stage
# adds. Doubling the window width HALVES the number of windows (16
# instead of 32 sorts and scans — the dominant cost at large N) for
# 256x the bucket-stage adds, which is the right trade once
# N >= ~2^17. 16-bit windows also make digit extraction free: window w's
# digit IS limb w of the canonical 16-bit-limb scalar. The bucket
# tensor is B * 2^wbits points, so wide windows are gated on small B
# (the flat MSM / tall-skinny Hyrax shapes; square batched commits at
# B ~ sqrt(N) stay on 8-bit windows).


def digits_from_limbs(limbs):
    """(..., 16) canonical 16-bit limbs -> (..., 32) 8-bit window digits."""
    lo = limbs & jnp.uint32(0xFF)
    hi = (limbs >> 8) & jnp.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(limbs.shape[:-1] + (32,))


# Fixed intra-chunk width for the two-level prefix scan. The compiled
# graph contains 2*log2(_CHUNK) point-add instantiations for the chunk
# scans plus O(1) for everything else — INDEPENDENT of N. (The previous
# flat associative_scan instantiated 2*log2(B*N) point-adds: ~150k HLO
# ops at 2^20, which took the 1-core XLA:CPU optimizer 10+ minutes at
# 2^8 already and OOM-killed the remote TPU compile helper at 2^20.)
_CHUNK = 256


def _hs_scan(x, reverse: bool = False):
    """Inclusive Hillis-Steele prefix point-sum along axis 0 as a
    fori_loop: ONE point_add in the graph, log2(m) iterations sweeping
    the full width (work m*log m — used only where m is small)."""
    m = x.shape[0]
    steps = max(0, (m - 1).bit_length())
    # prefix: x[j] += x[j-d] (roll +d); suffix: x[j] += x[j+d] (roll -d)
    sign = -1 if reverse else 1

    def body(i, x):
        d = (jnp.uint32(1) << i).astype(jnp.int32)
        shifted = jnp.roll(x, sign * d, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.uint32, (m,), 0)
        mask = (idx < m - d.astype(jnp.uint32)) if reverse else \
            (idx >= d.astype(jnp.uint32))
        mask = mask.reshape((m,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, curve.point_add(x, shifted), x)

    return jax.lax.fori_loop(0, steps, body, x)


def _fold_sum(x, axis: int):
    """Point sum along `axis` (power-of-2 length) by halving inside a
    fori_loop — ONE point_add instantiation (cf. curve.tree_reduce's
    log2(n) unrolled adds)."""
    x = jnp.moveaxis(x, axis, 0)
    m = x.shape[0]
    steps = (m - 1).bit_length()

    def body(i, x):
        half = (jnp.uint32(m) >> (i + jnp.uint32(1))).astype(jnp.int32)
        hi = jnp.roll(x, -half, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.uint32, (m,), 0)
        mask = (idx < half.astype(jnp.uint32)).reshape(
            (m,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, curve.point_add(x, hi), x)

    return jax.lax.fori_loop(0, steps, body, x)[0]


def _window_sum_flat(points, digits, wbits: int = WINDOW_BITS):
    """One window, B MSM rows sharing the generator set.

    digits (B, N) in [0, 2^wbits); points (N, 4, 16) -> (B, 4, 16).

    All rows sort TOGETHER under the composite key (row << 8 | digit):
    one argsort + one two-level prefix point-scan over the flat B*N axis,
    so the batched Hyrax polycommit (dense_mlpoly.rs:183-197's rayon
    site) costs the same as a single flat MSM of B*N points. Bucket
    (b, v) is a difference of two prefix values gathered at the sorted
    bucket boundaries, and the weighted bucket sum is a reversed
    Hillis-Steele scan along the v axis followed by a halving fold.

    The prefix is TWO-LEVEL to bound the compiled graph: work-efficient
    associative_scan inside fixed _CHUNK-sized chunks (full M-width
    parallel, ~2N adds) + a Hillis-Steele pass over the M chunk totals
    (1 point_add in the graph, M*log2(M) adds — ~2% of the scan work at
    _CHUNK=256). Prefix values are only materialized AT the <=2*B*256
    bucket boundaries: value(idx) = intra[idx-1] + chunk_exclusive[
    (idx-1)//_CHUNK].
    """
    b, n = digits.shape
    nbuckets = 1 << wbits
    total = b * n
    row_key = (jnp.arange(total, dtype=jnp.uint32) //
               jnp.uint32(n)) << jnp.uint32(wbits)
    key = row_key | digits.reshape(-1)
    order = jnp.argsort(key)
    ks = key[order]
    ps = jnp.take(points, order % jnp.uint32(n), axis=0)

    ch = min(_CHUNK, total)
    pad = (-total) % ch
    if pad:
        ps = jnp.concatenate(
            [ps, jnp.asarray(curve.identity((pad,)))], axis=0)
    m = (total + pad) // ch
    intra = jax.lax.associative_scan(
        curve.point_add, ps.reshape(m, ch, 4, 16), axis=1)
    intra_flat = intra.reshape(m * ch, 4, 16)
    incl = _hs_scan(intra[:, -1])  # (m, 4, 16) inclusive chunk prefixes
    excl = jnp.concatenate(
        [jnp.asarray(curve.identity((1,))), incl[:-1]], axis=0)

    def prefix_at(idx):
        """Inclusive prefix sum of the first `idx` sorted points."""
        q = jnp.maximum(idx, 1) - 1
        v = curve.point_add(jnp.take(intra_flat, q, axis=0),
                            jnp.take(excl, q // ch, axis=0))
        ident = jnp.asarray(curve.identity((1,)))
        return curve.point_select(idx > 0, v, ident)

    # bucket (b, v) = prefix(end) - prefix(start); row groups are
    # contiguous under the composite key so differences never span rows.
    starts = jnp.searchsorted(
        ks, jnp.arange(b * nbuckets, dtype=ks.dtype), side="left")
    ends = jnp.concatenate([starts[1:], jnp.full((1,), total,
                                                 starts.dtype)])
    buckets = curve.point_add(prefix_at(ends),
                              curve.point_neg(prefix_at(starts)))
    buckets = buckets.reshape(b, nbuckets, 4, 16)[:, 1:]  # v >= 1
    # weighted sum: reversed inclusive scan gives suffix sums S_v, and
    # sum_{v>=1} S_v = sum_v v*bucket_v; pad the 2^wbits - 1 sums with
    # one identity so the halving fold sees a power-of-2 axis
    suffix = jnp.moveaxis(
        _hs_scan(jnp.moveaxis(buckets, 1, 0), reverse=True), 0, 1)
    suffix = jnp.concatenate(
        [suffix, jnp.broadcast_to(jnp.asarray(curve.identity((1,))),
                                  (b, 1, 4, 16))], axis=1)
    return _fold_sum(suffix, axis=1)  # (B, 4, 16)


@cached_kernel(static_argnames=("wbits",))
def _msm_sorted(points, limbs, wbits: int = WINDOW_BITS):
    """points (N, 4, 16); limbs (B, N, 16) -> (B, 4, 16)."""
    nwin = 256 // wbits

    def win_body(_, w):
        if wbits == 16:
            digits = limbs[..., w]  # window w's digit IS limb w — (B,N)
        else:
            limb_idx = w >> 1
            shift = (w & 1) << 3
            digits = (limbs[..., limb_idx] >> shift) & jnp.uint32(0xFF)
        win = _window_sum_flat(points, digits, wbits)
        return None, win  # (B, 4, 16)

    _, wins = jax.lax.scan(win_body, None,
                           jnp.arange(nwin, dtype=jnp.uint32))

    # Horner combine from the top window: acc = 2^wbits*acc + win[w];
    # the doublings run in a fori_loop (one point_double instantiation).
    def comb_body(acc, win):
        acc = jax.lax.fori_loop(0, wbits,
                                lambda _, a: curve.point_double(a), acc)
        return curve.point_add(acc, win), None

    acc, _ = jax.lax.scan(comb_body, wins[nwin - 1],
                          wins[: nwin - 1], reverse=True)
    return acc


def _pick_wbits(b: int, n: int) -> int:
    """16-bit windows when the saved sorts/scans beat the extra bucket
    work (adds: nwin*(2bn + 3b*2^wbits) crosses over at n ~ 2^17) and
    the B*65536-point bucket tensor stays small; override with
    SPARTAN_MSM_WBITS for tests."""
    import os

    forced = os.environ.get("SPARTAN_MSM_WBITS")
    if forced in ("8", "16"):
        return int(forced)
    return 16 if (n >= (1 << 17) and b * 65536 <= (1 << 23)) else 8


def msm_dev(points_dev, scalar_limbs):
    """Batched Pippenger MSM, result left on device.

    points_dev: (N, 4, 16) device points (shared by all rows).
    scalar_limbs: (B, N, 16) or (N, 16) canonical (non-Montgomery) limbs.
    Returns (B, 4, 16) device array of extended-Edwards points.
    """
    scalar_limbs = jnp.asarray(scalar_limbs)
    if scalar_limbs.ndim == 2:
        scalar_limbs = scalar_limbs[None]
    b, n = scalar_limbs.shape[:2]
    return _msm_sorted(jnp.asarray(points_dev), scalar_limbs,
                       wbits=_pick_wbits(b, n))


def msm(points_dev, scalar_limbs) -> list:
    """Batched Pippenger MSM; returns a list of B RistrettoPoint (host)."""
    out = msm_dev(points_dev, scalar_limbs)
    return curve.decode_points(np.asarray(jax.device_get(out)))


def msm_single(points_dev, scalar_limbs) -> RistrettoPoint:
    return msm(points_dev, scalar_limbs)[0]
