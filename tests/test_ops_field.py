"""Device limb-kernel tests: fuzz against the exact host implementation."""

import random

import numpy as np
import jax.numpy as jnp

from spartan_parallel_tpu.core.consts import L, P
from spartan_parallel_tpu.core.edwards import RistrettoPoint
from spartan_parallel_tpu.ops import curve, fp, fq, limbs as lb

rng = random.Random(1234)


def rand_mod(m, n):
    # include adversarial edge values
    edge = [0, 1, 2, m - 1, m - 2, (1 << 255) % m, (m - 1) // 2]
    vals = edge[: min(len(edge), n)]
    vals += [rng.randrange(m) for _ in range(n - len(vals))]
    return vals


class TestLimbs:
    def test_codec_roundtrip(self):
        xs = [rng.getrandbits(256) for _ in range(10)]
        assert lb.limbs_to_ints(lb.ints_to_limbs(xs)) == xs

    def test_mul_wide(self):
        xs = rand_mod(1 << 256, 16)
        ys = rand_mod(1 << 256, 16)
        a, b = lb.ints_to_limbs(xs), lb.ints_to_limbs(ys)
        got = lb.limbs_to_ints(np.asarray(lb.mul_wide(jnp.asarray(a), jnp.asarray(b))))
        assert got == [x * y for x, y in zip(xs, ys)]

    def test_mul_lo(self):
        xs = rand_mod(1 << 256, 8)
        ys = rand_mod(1 << 256, 8)
        a, b = lb.ints_to_limbs(xs), lb.ints_to_limbs(ys)
        got = lb.limbs_to_ints(np.asarray(lb.mul_lo(jnp.asarray(a), jnp.asarray(b))))
        assert got == [(x * y) % (1 << 256) for x, y in zip(xs, ys)]


class TestFq:
    def test_encode_decode(self):
        xs = rand_mod(L, 12)
        assert fq.decode(fq.encode(xs)) == xs

    def test_mul(self):
        xs, ys = rand_mod(L, 32), rand_mod(L, 32)
        got = fq.decode(fq.mul(jnp.asarray(fq.encode(xs)), jnp.asarray(fq.encode(ys))))
        assert got == [x * y % L for x, y in zip(xs, ys)]

    def test_add_sub_neg(self):
        xs, ys = rand_mod(L, 32), rand_mod(L, 32)
        a, b = jnp.asarray(fq.encode(xs)), jnp.asarray(fq.encode(ys))
        assert fq.decode(fq.add(a, b)) == [(x + y) % L for x, y in zip(xs, ys)]
        assert fq.decode(fq.sub(a, b)) == [(x - y) % L for x, y in zip(xs, ys)]
        assert fq.decode(fq.neg(a)) == [(-x) % L for x in xs]

    def test_canonical_roundtrip(self):
        xs = rand_mod(L, 8)
        canon = jnp.asarray(lb.ints_to_limbs(xs))
        assert fq.decode(fq.from_canonical(canon)) == xs
        back = lb.limbs_to_ints(np.asarray(fq.to_canonical(jnp.asarray(fq.encode(xs)))))
        assert back == xs

    def test_sum_reduce_small(self):
        xs = rand_mod(L, 100)
        got = fq.decode(fq.sum_reduce(jnp.asarray(fq.encode(xs)), axis=0)[None])
        assert got == [sum(xs) % L]

    def test_sum_reduce_chunked(self):
        n = (1 << 15) + 77  # force the chunked path
        xs = [rng.randrange(L) for _ in range(n)]
        got = fq.decode(fq.sum_reduce(jnp.asarray(fq.encode(xs)), axis=0)[None])
        assert got == [sum(xs) % L]

    def test_dot(self):
        xs, ys = rand_mod(L, 50), rand_mod(L, 50)
        got = fq.decode(
            fq.dot(jnp.asarray(fq.encode(xs)), jnp.asarray(fq.encode(ys)))[None]
        )
        assert got == [sum(x * y for x, y in zip(xs, ys)) % L]


class TestFp:
    def test_mul(self):
        xs, ys = rand_mod(P, 32), rand_mod(P, 32)
        got = fp.decode(fp.mul(jnp.asarray(fp.encode(xs)), jnp.asarray(fp.encode(ys))))
        assert got == [x * y % P for x, y in zip(xs, ys)]

    def test_add_sub(self):
        xs, ys = rand_mod(P, 32), rand_mod(P, 32)
        a, b = jnp.asarray(fp.encode(xs)), jnp.asarray(fp.encode(ys))
        assert fp.decode(fp.add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
        assert fp.decode(fp.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]


class TestCurve:
    def _rand_points(self, n):
        B = RistrettoPoint.basepoint()
        return [B.scalar_mul(rng.getrandbits(200) + 1) for i in range(n)]

    def test_codec(self):
        pts = self._rand_points(4)
        assert all(a == b for a, b in zip(curve.decode_points(curve.encode_points(pts)), pts))

    def test_add(self):
        ps, qs = self._rand_points(8), self._rand_points(8)
        got = curve.decode_points(
            curve.point_add(jnp.asarray(curve.encode_points(ps)), jnp.asarray(curve.encode_points(qs)))
        )
        for g, a, b in zip(got, ps, qs):
            assert g == a + b

    def test_add_identity_and_self(self):
        ps = self._rand_points(3)
        ids = jnp.asarray(curve.identity((3,)))
        dev = jnp.asarray(curve.encode_points(ps))
        got = curve.decode_points(curve.point_add(dev, ids))
        assert all(g == p for g, p in zip(got, ps))
        # unified formula must handle doubling: P + P == 2P
        got2 = curve.decode_points(curve.point_add(dev, dev))
        assert all(g == p.double() for g, p in zip(got2, ps))

    def test_double(self):
        ps = self._rand_points(8)
        got = curve.decode_points(curve.point_double(jnp.asarray(curve.encode_points(ps))))
        assert all(g == p.double() for g, p in zip(got, ps))

    def test_tree_reduce(self):
        for n in [1, 2, 7, 16]:
            ps = self._rand_points(n)
            acc = RistrettoPoint.identity()
            for p in ps:
                acc = acc + p
            got = curve.decode_points(
                curve.tree_reduce(jnp.asarray(curve.encode_points(ps)))[None]
            )[0]
            assert got == acc


class TestCarryImplParity:
    """The TPU path uses Kogge-Stone carry lookahead; CPU uses lax.scan.
    Both must agree exactly with the host oracle (incl. long carry/borrow
    ripples: values adjacent to the modulus and to 2^256)."""

    def _fuzz(self):
        xs = rand_mod(P, 24) + [P - 1, P - 2, 1, 0]
        ys = rand_mod(P, 24) + [1, P - 1, P - 1, 0]
        a, b = jnp.asarray(fp.encode(xs)), jnp.asarray(fp.encode(ys))
        assert fp.decode(fp.mul(a, b)) == [x * y % P for x, y in zip(xs, ys)]
        assert fp.decode(fp.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
        zs = rand_mod(L, 16)
        c = jnp.asarray(fq.encode(zs))
        assert fq.decode(fq.mul(c, c)) == [z * z % L for z in zs]

    def test_ks(self, monkeypatch):
        monkeypatch.setenv("SPARTAN_CARRY_IMPL", "ks")
        self._fuzz()

    def test_scan(self, monkeypatch):
        monkeypatch.setenv("SPARTAN_CARRY_IMPL", "scan")
        self._fuzz()
