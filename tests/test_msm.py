"""Pippenger MSM kernel vs host oracle."""

import random

import jax.numpy as jnp
import numpy as np

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.core.edwards import RistrettoPoint, multiscalar_mul
from spartan_parallel_tpu.ops import curve, limbs as lb, msm

rng = random.Random(42)


def test_msm_batched_matches_host():
    B0 = RistrettoPoint.basepoint()
    n, b = 16, 2
    pts = [B0.scalar_mul(rng.getrandbits(220) + 1) for _ in range(n)]
    rows = [[rng.randrange(L) for _ in range(n)] for _ in range(b)]
    # exercise edge digits: zeros, equal digits, max scalar
    rows[0][0] = 0
    rows[0][1] = L - 1
    rows[0][2] = rows[0][3] = 0x0101
    sl = np.stack([lb.ints_to_limbs(r) for r in rows])
    got = msm.msm(jnp.asarray(curve.encode_points(pts)), sl)
    for r in range(b):
        assert got[r] == multiscalar_mul(rows[r], pts), f"row {r}"


def test_msm_single_point():
    B0 = RistrettoPoint.basepoint()
    s = rng.randrange(L)
    got = msm.msm_single(
        jnp.asarray(curve.encode_points([B0])), lb.ints_to_limbs([s])
    )
    assert got == B0.scalar_mul(s)


def test_msm_wide_windows_match_host(monkeypatch):
    """16-bit window path (ops/msm.py _pick_wbits — the large-N flat-MSM
    geometry) must be bit-exact with the host oracle; forced via env at a
    small N so the test stays cheap."""
    monkeypatch.setenv("SPARTAN_MSM_WBITS", "16")
    B0 = RistrettoPoint.basepoint()
    n, b = 16, 2
    pts = [B0.scalar_mul(rng.getrandbits(220) + 1) for _ in range(n)]
    rows = [[rng.randrange(L) for _ in range(n)] for _ in range(b)]
    rows[0][0] = 0
    rows[0][1] = L - 1
    rows[1][0] = rows[1][1] = 0xFFFF  # max single-limb digit
    sl = np.stack([lb.ints_to_limbs(r) for r in rows])
    got = msm.msm(jnp.asarray(curve.encode_points(pts)), sl)
    for r in range(b):
        assert got[r] == multiscalar_mul(rows[r], pts), f"row {r}"
