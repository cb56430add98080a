"""Host exact-math layer tests: scalar field, keccak/strobe/merlin, ristretto."""

import hashlib
import random

import pytest

from spartan_parallel_tpu.core.consts import L, P
from spartan_parallel_tpu.core.edwards import RistrettoPoint, multiscalar_mul
from spartan_parallel_tpu.core.field import Scalar, batch_invert
from spartan_parallel_tpu.utils.keccak import sha3_256
from spartan_parallel_tpu.utils.transcript import Transcript

rng = random.Random(0xC0FFEE)


def rand_scalar():
    return Scalar(rng.getrandbits(300))


# --------------------------------------------------------------------------
# Scalar field
# --------------------------------------------------------------------------
class TestScalar:
    def test_modulus(self):
        assert L == 2**252 + 27742317777372353535851937790883648493

    def test_ring_ops(self):
        for _ in range(50):
            a, b = rand_scalar(), rand_scalar()
            assert (a + b).v == (a.v + b.v) % L
            assert (a - b).v == (a.v - b.v) % L
            assert (a * b).v == (a.v * b.v) % L
            assert a.square() == a * a

    def test_bytes_roundtrip(self):
        for _ in range(20):
            a = rand_scalar()
            assert Scalar.from_bytes(a.to_bytes()) == a
        with pytest.raises(ValueError):
            Scalar.from_bytes((L).to_bytes(32, "little"))

    def test_from_bytes_wide(self):
        b = bytes(range(64))
        assert Scalar.from_bytes_wide(b).v == int.from_bytes(b, "little") % L

    def test_invert(self):
        for _ in range(10):
            a = rand_scalar()
            if a.is_zero():
                continue
            assert a * a.invert() == Scalar.one()

    def test_batch_invert(self):
        xs = [rand_scalar() for _ in range(33)]
        invs = batch_invert(xs)
        for x, ix in zip(xs, invs):
            assert x * ix == Scalar.one()


# --------------------------------------------------------------------------
# Keccak / merlin
# --------------------------------------------------------------------------
class TestTranscript:
    def test_keccak_vs_hashlib(self):
        for msg in [b"", b"abc", bytes(1000), bytes(range(256)) * 3]:
            assert sha3_256(msg) == hashlib.sha3_256(msg).digest()

    def test_merlin_vector(self):
        # Test vector from the merlin crate (transcript.rs test
        # `equivalence_simple`).
        t = Transcript(b"test protocol")
        t.append_message(b"some label", b"some data")
        cb = t.challenge_bytes(b"challenge", 32)
        assert (
            cb.hex()
            == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
        )

    def test_challenge_scalar_in_range(self):
        t = Transcript(b"x")
        s = t.challenge_scalar(b"c")
        assert 0 <= s.v < L

    def test_determinism(self):
        def run():
            t = Transcript(b"proto")
            t.append_u64(b"n", 42)
            t.append_scalar(b"s", Scalar(7))
            return t.challenge_bytes(b"c", 48)

        assert run() == run()


# --------------------------------------------------------------------------
# Ristretto255
# --------------------------------------------------------------------------
class TestRistretto:
    def test_basepoint_encoding(self):
        # RFC 9496 appendix A: the generator's canonical encoding.
        B = RistrettoPoint.basepoint()
        assert (
            B.compress().hex()
            == "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"
        )

    def test_small_multiples(self):
        # RFC 9496 appendix A.1 small multiples of the generator.
        expected = [
            "0000000000000000000000000000000000000000000000000000000000000000",
            "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
            "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
            "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
            "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
        ]
        P_i = RistrettoPoint.identity()
        B = RistrettoPoint.basepoint()
        for i, exp in enumerate(expected):
            assert P_i.compress().hex() == exp, f"multiple {i}"
            P_i = P_i + B

    def test_decompress_roundtrip(self):
        B = RistrettoPoint.basepoint()
        Q = B.scalar_mul(rng.getrandbits(250))
        assert RistrettoPoint.decompress(Q.compress()) == Q

    def test_group_laws(self):
        B = RistrettoPoint.basepoint()
        a, b = rand_scalar(), rand_scalar()
        assert B * a + B * b == B * (a + b)
        assert (B * a).double() == B * (a + a)
        assert B * a - B * a == RistrettoPoint.identity()
        assert B * a + RistrettoPoint.identity() == B * a

    def test_scalar_mul_matches_order(self):
        B = RistrettoPoint.basepoint()
        assert B.scalar_mul(L).is_identity()

    def test_from_uniform_bytes(self):
        h = hashlib.sha512(b"Ristretto is traditionally a short shot of espresso coffee").digest()
        pt = RistrettoPoint.from_uniform_bytes(h)
        # determinism + validity
        assert RistrettoPoint.from_uniform_bytes(h) == pt
        assert RistrettoPoint.decompress(pt.compress()) == pt

    def test_msm_matches_naive(self):
        B = RistrettoPoint.basepoint()
        pts = [B.scalar_mul(i + 1) for i in range(8)]
        ss = [rand_scalar() for _ in range(8)]
        acc = RistrettoPoint.identity()
        for s, p in zip(ss, pts):
            acc = acc + p * s
        assert multiscalar_mul(ss, pts) == acc
