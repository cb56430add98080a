"""Sigma protocol + bullet reduction prove/verify roundtrips and tamper tests."""

import random

import pytest

from spartan_parallel_tpu.core.field import Scalar
from spartan_parallel_tpu.models.commitments import MultiCommitGens
from spartan_parallel_tpu.models.sigma import (
    DotProductProof,
    DotProductProofGens,
    DotProductProofLog,
    EqualityProof,
    KnowledgeProof,
    ProductProof,
    _dot,
)
from spartan_parallel_tpu.models.unipoly import UniPoly
from spartan_parallel_tpu.utils.errors import ProofVerifyError
from spartan_parallel_tpu.utils.random_tape import RandomTape
from spartan_parallel_tpu.utils.transcript import Transcript

rng = random.Random(77)


def rs():
    return Scalar(rng.getrandbits(255))


def tape():
    return RandomTape(b"proof", seed=bytes(32))


class TestUniPoly:
    def test_quad(self):
        # 2x^2 + 3x + 1 (reference unipoly.rs test vector)
        evals = [Scalar(1), Scalar(6), Scalar(15)]
        p = UniPoly.from_evals(evals)
        assert [int(c) for c in p.coeffs] == [1, 3, 2]
        assert p.evaluate(Scalar(3)) == Scalar(28)
        dec = p.compress().decompress(evals[0] + evals[1])
        assert [int(c) for c in dec.coeffs] == [1, 3, 2]

    def test_cubic(self):
        # x^3 + 2x^2 + 3x + 1
        evals = [Scalar(1), Scalar(7), Scalar(23), Scalar(55)]
        p = UniPoly.from_evals(evals)
        assert [int(c) for c in p.coeffs] == [1, 3, 2, 1]
        assert p.evaluate(Scalar(4)) == Scalar(109)
        dec = p.compress().decompress(evals[0] + evals[1])
        assert [int(c) for c in dec.coeffs] == [1, 3, 2, 1]


class TestSigma:
    def test_knowledge(self):
        gens = MultiCommitGens(1, b"test-knowledgeproof")
        x, r = rs(), rs()
        proof, C = KnowledgeProof.prove(gens, Transcript(b"example"), tape(), x, r)
        proof.verify(gens, Transcript(b"example"), C)
        with pytest.raises(ProofVerifyError):
            bad = KnowledgeProof(proof.alpha, proof.z1 + Scalar(1), proof.z2)
            bad.verify(gens, Transcript(b"example"), C)

    def test_equality(self):
        gens = MultiCommitGens(1, b"test-equalityproof")
        v = rs()
        s1, s2 = rs(), rs()
        proof, C1, C2 = EqualityProof.prove(
            gens, Transcript(b"example"), tape(), v, s1, v, s2
        )
        proof.verify(gens, Transcript(b"example"), C1, C2)

    def test_product(self):
        gens = MultiCommitGens(1, b"test-productproof")
        x, rX, y, rY, rZ = rs(), rs(), rs(), rs(), rs()
        z = x * y
        proof, X, Y, Z = ProductProof.prove(
            gens, Transcript(b"example"), tape(), x, rX, y, rY, z, rZ
        )
        proof.verify(gens, Transcript(b"example"), X, Y, Z)
        # a non-product must fail
        proof2, X2, Y2, Z2 = ProductProof.prove(
            gens, Transcript(b"example"), tape(), x, rX, y, rY, z + Scalar(1), rZ
        )
        with pytest.raises(ProofVerifyError):
            proof2.verify(gens, Transcript(b"example"), X2, Y2, Z2)

    def test_dotproduct(self):
        n = 4
        gens_1 = MultiCommitGens(1, b"test-two")
        gens_n = MultiCommitGens(n, b"test-n")
        x = [rs() for _ in range(n)]
        a = [rs() for _ in range(n)]
        y = _dot(x, a)
        proof, Cx, Cy = DotProductProof.prove(
            gens_1, gens_n, Transcript(b"example"), tape(), x, rs(), a, y, rs()
        )
        proof.verify(gens_1, gens_n, Transcript(b"example"), a, Cx, Cy)

    def test_dotproduct_log(self):
        n = 16
        gens = DotProductProofGens(n, b"test-log")
        x = [rs() for _ in range(n)]
        a = [rs() for _ in range(n)]
        y = _dot(x, a)
        proof, Cx, Cy = DotProductProofLog.prove(
            gens, Transcript(b"example"), tape(), x, rs(), a, y, rs()
        )
        proof.verify(n, gens, Transcript(b"example"), a, Cx, Cy)

    def test_dotproduct_log_wrong_y_fails(self):
        n = 8
        gens = DotProductProofGens(n, b"test-log2")
        x = [rs() for _ in range(n)]
        a = [rs() for _ in range(n)]
        y = _dot(x, a) + Scalar(1)
        proof, Cx, Cy = DotProductProofLog.prove(
            gens, Transcript(b"example"), tape(), x, rs(), a, y, rs()
        )
        with pytest.raises(ProofVerifyError):
            proof.verify(n, gens, Transcript(b"example"), a, Cx, Cy)
