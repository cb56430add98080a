"""SPARK sparse-matrix commitment + evaluation argument."""

import numpy as np
import pytest

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.core.field import Scalar
from spartan_parallel_tpu.models.product_tree import (
    DotProductCircuit,
    ProductCircuit,
    ProductCircuitEvalProofBatched,
)
from spartan_parallel_tpu.models.dense_mlpoly import (
    DensePolynomial,
    scalars_to_mont,
)
from spartan_parallel_tpu.models.r1csinstance import (
    R1CSCommitmentGens,
    R1CSEvalProof,
    SparseMatPolynomial,
    produce_synthetic_r1cs,
    r1cs_commit,
)
from spartan_parallel_tpu.models.sparse_mlpoly import (
    SparseMatPolyCommitmentGens,
    multi_commit,
)
from spartan_parallel_tpu.utils.errors import ProofVerifyError
from spartan_parallel_tpu.utils.random_tape import RandomTape
from spartan_parallel_tpu.utils.transcript import Transcript

rng = np.random.default_rng(31)


def rand_scalars(n):
    return [Scalar(int.from_bytes(rng.bytes(40), "little")) for _ in range(n)]


def test_product_circuit_evaluate():
    vals = rand_scalars(8)
    c = ProductCircuit(DensePolynomial.from_scalars(vals))
    expect = Scalar(1)
    for v in vals:
        expect = expect * v
    assert c.evaluate() == expect


def test_product_circuit_batched_proof():
    polys = [rand_scalars(8) for _ in range(3)]
    circuits = [ProductCircuit(DensePolynomial.from_scalars(p))
                for p in polys]
    claims = [c.evaluate() for c in circuits]

    tp = Transcript(b"prodtest")
    proof, rand_prove = ProductCircuitEvalProofBatched.prove(
        circuits, [], tp)
    tv = Transcript(b"prodtest")
    claims_out, _dotp, rand_verify = proof.verify(claims, [], 8, tv)
    assert rand_prove == rand_verify
    # final claims match the bound leaf polynomials
    for i, p in enumerate(polys):
        leaf = DensePolynomial.from_scalars(p)
        assert claims_out[i] == leaf.evaluate(rand_verify)


def test_product_circuit_batched_with_dotp():
    polys = [rand_scalars(8) for _ in range(2)]
    circuits = [ProductCircuit(DensePolynomial.from_scalars(p))
                for p in polys]
    claims = [c.evaluate() for c in circuits]

    left = scalars_to_mont(rand_scalars(8))
    right = scalars_to_mont(rand_scalars(8))
    weight = scalars_to_mont(rand_scalars(8))
    d = DotProductCircuit(left, right, weight)
    d1, d2 = d.split()
    dotp_claims = [d1.evaluate(), d2.evaluate()]

    tp = Transcript(b"prodtest2")
    proof, _ = ProductCircuitEvalProofBatched.prove(circuits, [d1, d2], tp)
    tv = Transcript(b"prodtest2")
    proof.verify(claims, dotp_claims, 8, tv)


def test_spark_eval_proof_roundtrip():
    inst, _, _ = produce_synthetic_r1cs(1, [1], 16, 16, 4, seed=13)
    nnz = max(m.get_num_nz_entries()
              for m in (inst.A_list[0], inst.B_list[0], inst.C_list[0]))
    gens = R1CSCommitmentGens(b"spark_test", 1, 16, 32, nnz)
    comm, decomm = r1cs_commit(inst, gens)

    rx = rand_scalars(4)
    ry = rand_scalars(5)
    evals = inst.multi_evaluate(rx, ry)

    tape = RandomTape(b"tape", seed=b"\x07" * 32)
    tp = Transcript(b"spark")
    comm.append_to_transcript(b"comm", tp)
    proof = R1CSEvalProof.prove(decomm, rx, ry, evals, gens, tp, tape)

    tv = Transcript(b"spark")
    comm.append_to_transcript(b"comm", tv)
    proof.verify(comm, rx, ry, evals, gens, tv)


def test_spark_rejects_wrong_eval():
    inst, _, _ = produce_synthetic_r1cs(1, [1], 16, 16, 4, seed=14)
    nnz = max(m.get_num_nz_entries()
              for m in (inst.A_list[0], inst.B_list[0], inst.C_list[0]))
    gens = R1CSCommitmentGens(b"spark_test2", 1, 16, 32, nnz)
    comm, decomm = r1cs_commit(inst, gens)

    rx = rand_scalars(4)
    ry = rand_scalars(5)
    evals = inst.multi_evaluate(rx, ry)

    tape = RandomTape(b"tape", seed=b"\x08" * 32)
    tp = Transcript(b"spark")
    proof = R1CSEvalProof.prove(decomm, rx, ry, evals, gens, tp, tape)

    bad = list(evals)
    bad[0] = bad[0] + Scalar(1)
    tv = Transcript(b"spark")
    with pytest.raises((ProofVerifyError, AssertionError)):
        proof.verify(comm, rx, ry, bad, gens, tv)
