"""Native C ristretto kernels vs the pure-Python exact implementation."""

import numpy as np
import pytest

from spartan_parallel_tpu.core import native
from spartan_parallel_tpu.core.consts import EDWARDS_D2, L, P
from spartan_parallel_tpu.core.edwards import (
    RistrettoPoint,
    _elligator_map,
    multiscalar_mul,
)
from spartan_parallel_tpu.core.field import Scalar

rng = np.random.default_rng(17)


def py_add(a, b):
    A = (a.Y - a.X) * (b.Y - b.X) % P
    B = (a.Y + a.X) * (b.Y + b.X) % P
    C = a.T * EDWARDS_D2 % P * b.T % P
    D = 2 * a.Z * b.Z % P
    E, F, G, H = (B - A) % P, (D - C) % P, (D + C) % P, (B + A) % P
    return RistrettoPoint(E * F, G * H, F * G, E * H)


def py_mul(p, k):
    acc = RistrettoPoint.identity()
    add = p
    while k:
        if k & 1:
            acc = py_add(acc, add)
        add = py_add(add, add)
        k >>= 1
    return acc


@pytest.fixture(scope="module")
def pts_ks():
    pts = [_elligator_map(int.from_bytes(rng.bytes(32), "little"))
           for _ in range(8)]
    ks = [int.from_bytes(rng.bytes(40), "little") % L for _ in range(8)]
    return pts, ks


def test_native_available():
    assert native.get() is not None, "C toolchain should be available"


def test_add_and_mul_match_python(pts_ks):
    pts, ks = pts_ks
    assert pts[0] + pts[1] == py_add(pts[0], pts[1])
    assert pts[0].double() == py_add(pts[0], pts[0])
    assert pts[0] * Scalar(ks[0]) == py_mul(pts[0], ks[0])
    assert pts[1] * Scalar(0) == RistrettoPoint.identity()


def test_msm_matches_python(pts_ks):
    pts, ks = pts_ks
    got = multiscalar_mul([Scalar(k) for k in ks], pts)
    want = RistrettoPoint.identity()
    for k, p in zip(ks, pts):
        want = py_add(want, py_mul(p, k))
    assert got == want


def test_compress_roundtrip_and_vector(pts_ks):
    pts, _ = pts_ks
    for p in pts[:4]:
        assert RistrettoPoint.decompress(p.compress()) == p
    assert RistrettoPoint.basepoint().compress().hex() == \
        "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"


def test_decompress_rejects_invalid():
    with pytest.raises(ValueError):
        RistrettoPoint.decompress(b"\xff" * 32)  # non-canonical
    with pytest.raises(ValueError):
        RistrettoPoint.decompress(b"\x01" + b"\x00" * 31)  # odd s


def test_from_uniform_matches_python():
    b = rng.bytes(64)
    got = RistrettoPoint.from_uniform_bytes(b)
    m = (1 << 255) - 1
    want = py_add(_elligator_map(int.from_bytes(b[:32], "little") & m),
                  _elligator_map(int.from_bytes(b[32:], "little") & m))
    assert got == want
