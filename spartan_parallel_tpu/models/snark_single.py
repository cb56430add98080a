"""Upstream-style single-instance SNARK: SAT proof + SPARK eval proof.

The fork replaced upstream Spartan's `SNARK` (one R1CS instance, circuit
preprocessing via `encode`, verifier cost sublinear in nnz) with the
9-stage zkVM pipeline (models/snark.py).  The upstream path is still the
unit of the reference's headline profile (BASELINE §A: SNARK::prove
39.13 s at 2^20 = R1CSProof 4.44 s + R1CSEvalProof/SPARK 34.29 s,
/root/reference/README.md:130-156) and BASELINE measurement config 2
(SNARK+SPARK at 2^16), so the TPU framework provides it as a first-class
model, rebuilt from the fork's surviving components:

  encode  -> r1cs_commit            (r1csinstance.rs:717-736)
  prove   -> R1CSProof (P=Q=1, two witness sections, as models/nizk.py)
             + multi_evaluate at (rx, ry) + R1CSEvalProof
             (r1csinstance.rs:738-780 wrapping SPARK sparse_mlpoly.rs:1497)
  verify  -> SAT verify against the CLAIMED evals, then the eval proof
             checks those claims against the circuit commitment — the
             verifier never touches the matrices (unlike NIZK's
             eval_sparse_polys), which is the entire point of encode.
"""

from __future__ import annotations

from ..core.field import Scalar
from ..utils.errors import ProofVerifyError
from ..utils.random_tape import RandomTape
from ..utils.timer import Timer
from .dense_mlpoly import DensePolynomial
from .nizk import _io_sec
from .r1csinstance import (
    R1CSCommitmentGens,
    R1CSEvalProof,
    r1cs_commit,
)
from .r1csproof import (
    R1CSGens,
    R1CSProof,
    ProverWitnessSecInfo,
    VerifierWitnessSecInfo,
)

_ZERO = Scalar.zero()


class SpartanSNARKGens:
    """gens for SAT proof + SPARK commitment (upstream SNARKGens)."""

    __slots__ = ("gens_r1cs_sat", "gens_r1cs_eval")

    def __init__(self, num_cons: int, num_vars: int, num_nz_entries: int):
        self.gens_r1cs_sat = R1CSGens(b"gens_r1cs_sat", num_cons, num_vars)
        self.gens_r1cs_eval = R1CSCommitmentGens(
            b"gens_r1cs_eval", 1, num_cons, num_vars, num_nz_entries)


class SpartanSNARK:
    """Single-instance SNARK with circuit preprocessing."""

    __slots__ = ("r1cs_sat_proof", "comm_vars", "inst_evals",
                 "r1cs_eval_proof", "r")

    def __init__(self, r1cs_sat_proof, comm_vars, inst_evals,
                 r1cs_eval_proof, r):
        self.r1cs_sat_proof = r1cs_sat_proof
        self.comm_vars = comm_vars
        self.inst_evals = inst_evals
        self.r1cs_eval_proof = r1cs_eval_proof
        self.r = r

    @staticmethod
    def protocol_name() -> bytes:
        return b"Spartan SNARK proof"

    @staticmethod
    def encode(inst, gens: SpartanSNARKGens):
        """Commit to the circuit matrices (preprocessing)."""
        timer = Timer("SNARK::encode")
        comm, decomm = r1cs_commit(inst, gens.gens_r1cs_eval)
        timer.stop()
        return comm, decomm

    @staticmethod
    def prove(inst, comm, decomm, vars_, inputs, gens: SpartanSNARKGens,
              transcript, random_tape=None):
        timer = Timer("SNARK::prove")
        assert inst.get_num_instances() == 1
        num_vars = inst.get_num_vars() // 2  # per-section size
        assert len(vars_) == num_vars
        assert len(inputs) < num_vars

        transcript.append_protocol_name(SpartanSNARK.protocol_name())
        comm.comm.append_to_transcript(b"comm", transcript)

        if random_tape is None:
            random_tape = RandomTape(b"proof")

        vars_sec = ProverWitnessSecInfo.from_scalars(
            [num_vars], [[list(map(int, vars_))]])
        comm_vars, _ = vars_sec.poly_w[0].commit(
            gens.gens_r1cs_sat.gens_pc, None)
        comm_vars.append_to_transcript(b"poly_commitment", transcript)

        io = _io_sec(num_vars, inputs)
        io_sec = ProverWitnessSecInfo.from_scalars(
            [num_vars], [[[int(v) for v in io]]])
        comm_io, _ = io_sec.poly_w[0].commit(gens.gens_r1cs_sat.gens_pc,
                                             None)
        comm_io.append_to_transcript(b"poly_commitment", transcript)

        sat_proof, r = R1CSProof.prove(
            1, 1, [1], num_vars, [num_vars], [vars_sec, io_sec], inst,
            gens.gens_r1cs_sat, transcript, random_tape)

        _rp, _rq_rev, rx, ry = r
        timer_eval = Timer("eval_sparse_polys")
        eA, eB, eC = inst.evaluate(rx, ry)
        timer_eval.stop()
        for e in (eA, eB, eC):
            transcript.append_scalar(b"ABCr_claim", e)

        eval_proof = R1CSEvalProof.prove(
            decomm, rx, ry, [eA, eB, eC], gens.gens_r1cs_eval,
            transcript, random_tape)
        timer.stop()
        return SpartanSNARK(sat_proof, comm_vars, (eA, eB, eC),
                            eval_proof, r)

    def verify(self, comm, inputs, gens: SpartanSNARKGens, transcript):
        timer = Timer("SNARK::verify")
        num_vars = comm.num_vars // 2  # per-section size
        transcript.append_protocol_name(SpartanSNARK.protocol_name())
        comm.comm.append_to_transcript(b"comm", transcript)

        self.comm_vars.append_to_transcript(b"poly_commitment", transcript)
        io = _io_sec(num_vars, inputs)
        io_poly = DensePolynomial.from_scalars(io)
        comm_io, _ = io_poly.commit(gens.gens_r1cs_sat.gens_pc, None)
        comm_io.append_to_transcript(b"poly_commitment", transcript)

        vars_view = VerifierWitnessSecInfo([1], [num_vars],
                                           [self.comm_vars])
        io_view = VerifierWitnessSecInfo([1], [num_vars], [comm_io])
        timer_sat = Timer("verify_sat_proof")
        r_out = self.r1cs_sat_proof.verify(
            1, 1, [1], num_vars, [vars_view, io_view], comm.num_cons,
            gens.gens_r1cs_sat, self.inst_evals, transcript)
        timer_sat.stop()
        if r_out != self.r:
            raise ProofVerifyError("SNARK evaluation point mismatch")

        _rp, _rq_rev, rx, ry = self.r
        for e in self.inst_evals:
            transcript.append_scalar(b"ABCr_claim", e)
        timer_eval = Timer("verify_eval_proof")
        self.r1cs_eval_proof.verify(comm, rx, ry, list(self.inst_evals),
                                    gens.gens_r1cs_eval, transcript)
        timer_eval.stop()
        timer.stop()
