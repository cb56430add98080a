"""R1CS instance + data-parallel R1CSProof + NIZK end-to-end."""

import numpy as np
import pytest

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.core.field import Scalar
from spartan_parallel_tpu.models.nizk import NIZK, NIZKGens
from spartan_parallel_tpu.models.r1csinstance import (
    R1CSInstance,
    produce_synthetic_r1cs,
)
from spartan_parallel_tpu.models.r1csproof import (
    ProverWitnessSecInfo,
    R1CSGens,
    R1CSProof,
    VerifierWitnessSecInfo,
)
from spartan_parallel_tpu.utils.errors import ProofVerifyError
from spartan_parallel_tpu.utils.random_tape import RandomTape
from spartan_parallel_tpu.utils.transcript import Transcript

rng = np.random.default_rng(11)


def check_sat(inst, vars_mat, inputs_mat):
    """Host satisfiability oracle (reference Instance::is_sat)."""
    for p in range(inst.get_num_instances()):
        A, B, C = inst.A_list[p], inst.B_list[p], inst.C_list[p]
        for q in range(len(vars_mat[p])):
            nv = len(vars_mat[p][q])
            z = list(vars_mat[p][q]) + [1] + list(inputs_mat[p][q])
            z += [0] * (2 * nv - len(z))
            az = {}
            bz = {}
            cz = {}
            for m, acc in ((A, az), (B, bz), (C, cz)):
                for r, c, v in zip(m.rows, m.cols, m.vals):
                    acc[r] = (acc.get(r, 0) + v * z[c]) % L
            for r in range(inst.get_num_cons()):
                lhs = az.get(r, 0) * bz.get(r, 0) % L
                assert lhs == cz.get(r, 0) % L, f"unsat at p={p} q={q} row={r}"


def test_synthetic_r1cs_is_sat():
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        2, [2, 1], 16, 16, 4, seed=3)
    check_sat(inst, vars_mat, inputs_mat)


def test_multi_evaluate_matches_host():
    inst, _, _ = produce_synthetic_r1cs(1, [1], 8, 8, 2, seed=5)
    rx = [Scalar(int.from_bytes(rng.bytes(40), "little")) for _ in range(3)]
    ry = [Scalar(int.from_bytes(rng.bytes(40), "little")) for _ in range(4)]
    eA, eB, eC = inst.evaluate(rx, ry)

    def eval_host(m):
        total = Scalar(0)
        for r, c, v in zip(m.rows, m.cols, m.vals):
            term = Scalar(v)
            for j in range(3):
                b = (int(r) >> (2 - j)) & 1
                term = term * (rx[j] if b else Scalar(1) - rx[j])
            for j in range(len(ry)):
                b = (int(c) >> (len(ry) - 1 - j)) & 1
                term = term * (ry[j] if b else Scalar(1) - ry[j])
            total = total + term
        return total

    assert eA == eval_host(inst.A_list[0])
    assert eB == eval_host(inst.B_list[0])
    assert eC == eval_host(inst.C_list[0])


def _vars_io_secs(inst, vars_mat, inputs_mat, num_proofs):
    nv = inst.get_num_vars() // 2  # per-section size
    P = len(vars_mat)
    vars_sec = ProverWitnessSecInfo.from_scalars(
        [nv] * P, [[list(map(int, q)) for q in vars_mat[p]]
                   for p in range(P)])
    io_rows = []
    for p in range(P):
        io_rows.append([])
        for q in range(num_proofs[p]):
            row = [1] + [int(v) for v in inputs_mat[p][q]]
            row += [0] * (nv - len(row))
            io_rows[p].append(row)
    io_sec = ProverWitnessSecInfo.from_scalars([nv] * P, io_rows)
    return vars_sec, io_sec


def test_r1csproof_data_parallel_roundtrip():
    """The core test: P=3 ragged instances, varying proof counts."""
    num_proofs = [4, 2, 1]
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        3, num_proofs, 16, 16, 4, seed=9)
    check_sat(inst, vars_mat, inputs_mat)
    nv = inst.get_num_vars() // 2  # per-section size
    # gens must cover the largest committed witness poly: Q_max * nv
    gens = R1CSGens(b"test_r1cs", 16, 4 * nv)
    vars_sec, io_sec = _vars_io_secs(inst, vars_mat, inputs_mat, num_proofs)

    tape = RandomTape(b"proof", seed=b"\x05" * 32)
    # commit witness secs with zero blinds (as the SNARK orchestrator does)
    comms = []
    for sec in (vars_sec, io_sec):
        sec_comms = []
        for p in range(3):
            c, _ = sec.poly_w[p].commit(gens.gens_pc, None)
            sec_comms.append(c)
        comms.append(sec_comms)

    tp = Transcript(b"r1cs_test")
    proof, r = R1CSProof.prove(
        3, 4, num_proofs, nv, [nv, nv, nv], [vars_sec, io_sec], inst, gens,
        tp, tape)

    # verifier evaluates the matrices at the returned point, bound to rp
    rp, rq_rev, rx, ry_full = r
    _evals, bound = inst.multi_evaluate_bound_rp(rp, rx, ry_full)

    views = [
        VerifierWitnessSecInfo(num_proofs, [nv] * 3, comms[0]),
        VerifierWitnessSecInfo(num_proofs, [nv] * 3, comms[1]),
    ]
    tv = Transcript(b"r1cs_test")
    r_out = proof.verify(3, 4, num_proofs, nv, views, inst.get_num_cons(),
                         gens, bound, tv)
    assert r_out == r


def test_r1csproof_qclass_bit_exact_vs_dense(monkeypatch):
    """The q-size-classed prover (skewed num_proofs -> per-class tensors,
    O(sum Q_i) storage) must produce BYTE-identical proofs to the dense
    zero-padded layout under the same random tape."""
    from spartan_parallel_tpu import serialization as ser

    num_proofs = [8, 2, 1]
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        3, num_proofs, 16, 16, 4, seed=13)
    nv = inst.get_num_vars() // 2
    gens = R1CSGens(b"test_qclass", 16, 8 * nv)
    vars_sec, io_sec = _vars_io_secs(inst, vars_mat, inputs_mat, num_proofs)

    def run():
        tape = RandomTape(b"proof", seed=b"\x0b" * 32)
        tp = Transcript(b"qclass_test")
        proof, r = R1CSProof.prove(
            3, 8, num_proofs, nv, [nv] * 3, [vars_sec, io_sec], inst,
            gens, tp, tape)
        # fold in the post-prove transcript state: equal states mean the
        # whole challenge schedule matched
        return ser.serialize(proof, "R1CSProof"), r, \
            tp.challenge_scalar(b"probe")

    monkeypatch.delenv("SPARTAN_NO_QCLASS", raising=False)
    classed = run()
    monkeypatch.setenv("SPARTAN_NO_QCLASS", "1")
    dense = run()
    assert classed[1] == dense[1], "evaluation points differ"
    assert classed[2] == dense[2], "transcript states differ"
    assert classed[0] == dense[0], "proof bytes differ"


def test_nizk_roundtrip():
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(1, [1], 16, 16, 4)
    gens = NIZKGens(16, 16)
    tp = Transcript(b"nizk_example")
    proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens, tp)
    tv = Transcript(b"nizk_example")
    proof.verify(inst, inputs_mat[0][0], gens, tv)


def test_nizk_rejects_wrong_inputs():
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(1, [1], 16, 16, 4)
    gens = NIZKGens(16, 16)
    tp = Transcript(b"nizk_example")
    proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens, tp)
    bad = list(inputs_mat[0][0])
    bad[0] = (bad[0] + 1) % L
    tv = Transcript(b"nizk_example")
    with pytest.raises((ProofVerifyError, AssertionError)):
        proof.verify(inst, bad, gens, tv)


def test_nizk_rejects_tampered_proof():
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(1, [1], 16, 16, 4)
    gens = NIZKGens(16, 16)
    tp = Transcript(b"nizk_example")
    proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens, tp)
    # tamper with a sumcheck round commitment
    sc = proof.r1cs_sat_proof.sc_proof_phase1
    sc.comm_evals[0], sc.comm_evals[1] = sc.comm_evals[1], sc.comm_evals[0]
    tv = Transcript(b"nizk_example")
    with pytest.raises((ProofVerifyError, AssertionError)):
        proof.verify(inst, inputs_mat[0][0], gens, tv)


def test_spmv_segment_sum_matches_host_oracle():
    """Scatter-free SpMV kernels (ops/spmv.py, round-5 rewrite): the
    cumsum-difference segment sum must be bit-exact against host big-int
    math, including empty rows/cols between segments."""
    import jax.numpy as jnp

    from spartan_parallel_tpu.models.r1csinstance import (
        SparseMatPolynomial,
    )
    from spartan_parallel_tpu.ops import fq

    def rnd():
        return int.from_bytes(rng.bytes(40), "little") % L

    entries = [(int(rng.integers(0, 8)), int(rng.integers(0, 8)), rnd())
               for _ in range(20)]
    m = SparseMatPolynomial(3, 3, entries)
    q = 3
    zs = [[rnd() for _ in range(8)] for _ in range(q)]
    z = jnp.asarray(fq.encode([x for row in zs for x in row])
                    ).reshape(q, 8, 16)
    out = fq.decode(np.asarray(m.multiply_vec_batched(z, 8)
                               ).reshape(-1, 16))
    want = []
    for qq in range(q):
        acc = [0] * 8
        for (r, c, v) in entries:
            acc[r] = (acc[r] + v * zs[qq][c]) % L
        want += acc
    assert list(out) == want

    rx = [rnd() for _ in range(8)]
    et = fq.decode(np.asarray(m.eval_table(jnp.asarray(fq.encode(rx)), 8)))
    wt = [0] * 8
    for (r, c, v) in entries:
        wt[c] = (wt[c] + rx[r] * v) % L
    assert list(et) == wt
