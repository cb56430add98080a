"""Dense/Pqx polynomial layer vs exact host models."""

import numpy as np
import pytest

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.core.field import Scalar
from spartan_parallel_tpu.models.dense_mlpoly import (
    DensePolynomial,
    EqPolynomial,
    IdentityPolynomial,
    PolyCommitmentGens,
    PolyEvalProof,
)
from spartan_parallel_tpu.models.custom_mlpoly import DensePolynomialPqx
from spartan_parallel_tpu.ops.sumcheck import MODE_P, MODE_Q, MODE_W, MODE_X
from spartan_parallel_tpu.utils.random_tape import RandomTape
from spartan_parallel_tpu.utils.transcript import Transcript

rng = np.random.default_rng(7)


def rand_scalars(n):
    return [Scalar(int.from_bytes(rng.bytes(40), "little")) for _ in range(n)]


def eq_host(r, x_bits):
    acc = Scalar(1)
    for ri, b in zip(r, x_bits):
        acc = acc * (ri if b else Scalar(1) - ri)
    return acc


def test_eq_evals_orientation():
    r = rand_scalars(3)
    tab = EqPolynomial(r).evals()
    for i in range(8):
        bits = [(i >> (2 - j)) & 1 for j in range(3)]  # MSB <-> r[0]
        assert tab[i] == eq_host(r, bits)


def test_dense_poly_evaluate_and_bind():
    vals = rand_scalars(16)
    poly = DensePolynomial.from_scalars(vals)
    r = rand_scalars(4)
    # naive host evaluation
    expect = Scalar(0)
    for i, v in enumerate(vals):
        bits = [(i >> (3 - j)) & 1 for j in range(4)]
        expect = expect + eq_host(r, bits) * v
    assert poly.evaluate(r) == expect

    # bound_poly_var_top then evaluate remaining
    p2 = poly.clone()
    p2.bound_poly_var_top(r[0])
    assert p2.evaluate(r[1:]) == expect


def test_identity_polynomial():
    r = rand_scalars(4)
    v = IdentityPolynomial(4).evaluate(r)
    expect = Scalar(0)
    for i, ri in enumerate(r):
        expect = expect + Scalar(1 << (3 - i)) * ri
    assert v == expect


def test_poly_eval_proof_roundtrip():
    vals = rand_scalars(64)
    poly = DensePolynomial.from_scalars(vals)
    gens = PolyCommitmentGens(6, b"test gens")
    tape = RandomTape(b"tape", seed=b"\x01" * 32)
    comm, blinds = poly.commit(gens, tape)
    r = rand_scalars(6)
    Zr = poly.evaluate(r)

    tp = Transcript(b"test")
    proof, C_Zr = PolyEvalProof.prove(poly, blinds, r, Zr, None, gens, tp, tape)
    tv = Transcript(b"test")
    proof.verify(gens, tv, r, C_Zr, comm)


def test_poly_eval_proof_rejects_wrong_eval():
    vals = rand_scalars(16)
    poly = DensePolynomial.from_scalars(vals)
    gens = PolyCommitmentGens(4, b"test gens2")
    tape = RandomTape(b"tape", seed=b"\x02" * 32)
    comm, blinds = poly.commit(gens, tape)
    r = rand_scalars(4)
    Zr = poly.evaluate(r) + Scalar(1)
    tp = Transcript(b"test")
    proof, C_Zr = PolyEvalProof.prove(poly, blinds, r, Zr, None, gens, tp, tape)
    tv = Transcript(b"test")
    from spartan_parallel_tpu.utils.errors import ProofVerifyError

    with pytest.raises(ProofVerifyError):
        proof.verify(gens, tv, r, C_Zr, comm)


# --------------------------------------------------------------------------
# Host model of the reference's ragged Pqx semantics
# (custom_dense_mlpoly.rs:118-318) for differential testing.
# --------------------------------------------------------------------------
class HostPqx:
    def __init__(self, z_mat, num_proofs, max_q, num_inputs, max_x):
        # z_mat[p][q][w][x] natural order, Scalars
        self.P = len(z_mat)
        self.W = max(len(z_mat[p][0]) for p in range(self.P))
        self.max_q, self.max_x = max_q, max_x
        self.num_proofs = list(num_proofs)
        self.num_inputs = list(num_inputs)
        # dense natural grid with zeros
        self.g = {}
        for p in range(self.P):
            for q in range(len(z_mat[p])):
                for w in range(len(z_mat[p][q])):
                    for x, v in enumerate(z_mat[p][q][w]):
                        self.g[(p, q, w, x)] = v

    def val(self, p, q, w, x):
        return self.g.get((p, q, w, x), Scalar(0))

    def evaluate(self, rp, rq, rw, rx, Ppad, Wpad):
        """Multilinear eval: rq/rx given in storage-binding order, which
        binds the ORIGINAL LSB first."""
        total = Scalar(0)
        for p in range(Ppad):
            for q in range(self.max_q):
                for w in range(Wpad):
                    for x in range(self.max_x):
                        v = self.val(p, q, w, x)
                        if int(v) == 0:
                            continue
                        term = v
                        # p bits: MSB-first binding with rp
                        nb = len(rp)
                        for j in range(nb):
                            b = (p >> (nb - 1 - j)) & 1
                            term = term * (rp[j] if b else Scalar(1) - rp[j])
                        nb = len(rq)
                        for j in range(nb):
                            b = (q >> j) & 1  # LSB-first
                            term = term * (rq[j] if b else Scalar(1) - rq[j])
                        nb = len(rw)
                        for j in range(nb):
                            b = (w >> (nb - 1 - j)) & 1
                            term = term * (rw[j] if b else Scalar(1) - rw[j])
                        nb = len(rx)
                        for j in range(nb):
                            b = (x >> j) & 1
                            term = term * (rx[j] if b else Scalar(1) - rx[j])
                        total = total + term
        return total


def test_pqx_evaluate_matches_host():
    P, Qmax, W, Xmax = 3, 4, 2, 4
    num_proofs = [4, 2, 1]
    num_inputs = [4, 4, 2]
    z_mat = []
    for p in range(P):
        z_mat.append([])
        for q in range(num_proofs[p]):
            z_mat[p].append(
                [rand_scalars(num_inputs[p]) for _ in range(W)])
    pqx = DensePolynomialPqx.new_rev(z_mat, num_proofs, Qmax, num_inputs, Xmax)
    host = HostPqx(z_mat, num_proofs, Qmax, num_inputs, Xmax)

    rp = rand_scalars(2)
    rq = rand_scalars(2)
    rw = rand_scalars(1)
    rx = rand_scalars(2)
    got = pqx.evaluate(rp, rq, rw, rx)
    want = host.evaluate(rp, rq, rw, rx, 4, 2)
    assert got == want


def test_pqx_bound_modes_match_host():
    """Each single bound_poly step keeps the polynomial's evaluations
    consistent with the host multilinear model."""
    P, Qmax, W, Xmax = 2, 4, 2, 4
    num_proofs = [4, 1]
    num_inputs = [2, 4]
    z_mat = []
    for p in range(P):
        z_mat.append([])
        for q in range(num_proofs[p]):
            z_mat[p].append([rand_scalars(num_inputs[p]) for _ in range(W)])
    pqx = DensePolynomialPqx.new_rev(z_mat, num_proofs, Qmax, num_inputs, Xmax)
    host = HostPqx(z_mat, num_proofs, Qmax, num_inputs, Xmax)

    rx = rand_scalars(2)
    rw = rand_scalars(1)
    rq = rand_scalars(2)
    rp = rand_scalars(1)
    for r in rx:
        pqx.bound_poly(r, MODE_X)
    for r in rw:
        pqx.bound_poly(r, MODE_W)
    for r in rq:
        pqx.bound_poly(r, MODE_Q)
    for r in rp:
        pqx.bound_poly(r, MODE_P)
    got = pqx.index(0, 0, 0, 0)
    want = host.evaluate(rp, rq, rw, rx, 2, 2)
    assert got == want


def test_pqx_to_dense_roundtrip():
    num_proofs = [2, 1]
    num_inputs = [2, 2]
    z_mat = []
    for p in range(2):
        z_mat.append([])
        for q in range(num_proofs[p]):
            z_mat[p].append([rand_scalars(2)])
    pqx = DensePolynomialPqx.new_rev(z_mat, num_proofs, 2, num_inputs, 2)
    dense = pqx.to_dense_poly()
    vals = dense.to_scalars()
    # natural layout: (p, q, w=1, x)
    assert vals[0] == z_mat[0][0][0][0]
    assert vals[1] == z_mat[0][0][0][1]
    assert vals[2] == z_mat[0][1][0][0]
    assert vals[4] == z_mat[1][0][0][0]
