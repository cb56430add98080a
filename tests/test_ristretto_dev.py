"""Device ristretto compress + comb commits vs the exact host layer."""

import numpy as np
import jax.numpy as jnp

from spartan_parallel_tpu.core.edwards import RistrettoPoint, multiscalar_mul
from spartan_parallel_tpu.core.field import Scalar
from spartan_parallel_tpu.ops import curve, fq
from spartan_parallel_tpu.ops import ristretto_dev as rd


def _rand_points(rng, n):
    base = RistrettoPoint.basepoint()
    pts = []
    acc = base
    for _ in range(n):
        k = int(rng.integers(1, 1 << 60))
        acc = acc * Scalar(k)
        pts.append(acc)
    return pts


def test_compress_matches_host():
    rng = np.random.default_rng(3)
    pts = _rand_points(rng, 8)
    dev = jnp.asarray(curve.encode_points(pts))
    got = np.asarray(rd.compress(dev))
    for i, pt in enumerate(pts):
        assert bytes(got[i].astype(np.uint8).tobytes()) == pt.compress(), i


def test_compress_identity():
    dev = jnp.asarray(curve.identity((1,)))
    got = np.asarray(rd.compress(dev))[0]
    assert bytes(got.astype(np.uint8).tobytes()) == bytes(32)


def test_comb_commit_matches_host_msm():
    rng = np.random.default_rng(4)
    gens = _rand_points(rng, 5)
    tables = jnp.asarray(rd.make_comb_tables(gens))
    scalars = [Scalar(int.from_bytes(rng.bytes(32), "little"))
               for _ in range(5)]
    want = multiscalar_mul(scalars, gens).compress()
    got_pt = rd.comb_commit(tables, jnp.asarray(fq.encode(scalars)))
    got = np.asarray(rd.compress(got_pt))
    assert bytes(got.astype(np.uint8).tobytes()) == want


def test_comb_commit_zero_scalar():
    rng = np.random.default_rng(5)
    gens = _rand_points(rng, 2)
    tables = jnp.asarray(rd.make_comb_tables(gens))
    scalars = [Scalar.zero(), Scalar(7)]
    want = (gens[1] * Scalar(7)).compress()
    got_pt = rd.comb_commit(tables, jnp.asarray(fq.encode(scalars)))
    got = np.asarray(rd.compress(got_pt))
    assert bytes(got.astype(np.uint8).tobytes()) == want
