"""NIZK: single-instance Spartan proof without circuit preprocessing.

Reference: src/lib.rs:3884-4005 (NIZK/NIZKGens — present upstream,
commented out in the fork because R1CSProof's signature changed; the
BASELINE configs still require it). Rebuilt here on the fork's
data-parallel R1CSProof with P = 1, Q = 1 and two witness sections:

  sec 0: vars   (private, committed with blinds)
  sec 1: [1, inputs, 0...]  (public; the verifier recomputes its
         commitment deterministically with zero blinds)

so z = [vars | 1, io] matches upstream's layout (lib.rs:3919-3964) and the
matrix column space spans 2 * num_vars. As in upstream NIZK, the proof
stores the evaluation point; the verifier evaluates A/B/C itself
(eval_sparse_polys, lib.rs:3981-3984) and checks the point matches.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.field import Scalar
from ..utils.random_tape import RandomTape
from ..utils.errors import ProofVerifyError
from ..utils.timer import Timer
from .dense_mlpoly import DensePolynomial, log2, scalars_to_mont
from .r1csproof import (
    R1CSGens,
    R1CSProof,
    ProverWitnessSecInfo,
    VerifierWitnessSecInfo,
)

_ZERO = Scalar.zero()
_ONE = Scalar.one()


def instance_digest(inst) -> bytes:
    """The reference's zlib(bincode) digest (r1csinstance.rs:218-222,
    appended upstream as lib.rs:3932 R1CSInstanceDigest)."""
    return inst.get_digest()


class NIZKGens:
    __slots__ = ("gens_r1cs_sat",)

    def __init__(self, num_cons: int, num_vars: int):
        self.gens_r1cs_sat = R1CSGens(b"gens_r1cs_sat", num_cons, num_vars)


def _io_sec(num_vars: int, inputs) -> list:
    io = [_ONE] + [Scalar(int(v)) for v in inputs]
    io += [_ZERO] * (num_vars - len(io))
    return io


def _io_poly_and_comm(num_vars: int, inputs, gens_pc):
    """Sparse fast path for the public-io witness section.

    The io poly is [1, inputs..., 0...] — len(inputs)+1 live entries out
    of 2^20. Building/committing it densely cost ~22 s per prove AND per
    verify (full upload + a sqrt(N)-row Hyrax MSM whose rows are almost
    all zero). Instead: device zeros + a tiny prefix upload, and the
    structured commitment — row 0 is a small host MSM, every other row
    commits to the zero vector with a zero blind, i.e. the identity
    point. Byte-identical to the dense path."""
    from ..core.edwards import RistrettoPoint, multiscalar_mul
    from ..models.dense_mlpoly import (
        EqPolynomial,
        PolyCommitment,
        log2 as _log2,
    )
    from ..ops import fq as _fq

    prefix = [_ONE] + [Scalar(int(v)) for v in inputs]
    k = len(prefix)
    ell = _log2(num_vars)
    left, right = EqPolynomial.compute_factored_lens(ell)
    L_size, R_size = 1 << left, 1 << right
    if k > R_size:  # prefix spills past row 0: use the dense path
        return None

    pref_mont = jnp.asarray(_fq.encode(prefix))
    Zm = jnp.zeros((num_vars, 16), jnp.uint32).at[:k].set(pref_mont)

    gens_n = gens_pc.gens.gens_n
    row0 = multiscalar_mul([int(v) for v in prefix], gens_n.G[:k])
    ident = RistrettoPoint.identity().compress()
    comm = PolyCommitment([row0.compress()] + [ident] * (L_size - 1))
    return Zm, comm


class NIZK:
    __slots__ = ("r1cs_sat_proof", "comm_vars", "r")

    def __init__(self, r1cs_sat_proof, comm_vars, r):
        self.r1cs_sat_proof = r1cs_sat_proof
        self.comm_vars = comm_vars
        self.r = r

    @staticmethod
    def protocol_name() -> bytes:
        return b"Spartan NIZK proof"

    @staticmethod
    def prove(inst, vars_, inputs, gens: NIZKGens, transcript,
              random_tape=None):
        """inst: 1-instance R1CSInstance; vars_: num_vars ints;
        inputs: < num_vars ints. `random_tape` may be injected for
        reproducible proofs (sharding bit-exactness tests); default is a
        fresh OsRng-seeded tape as in the reference."""
        timer = Timer("NIZK::prove")
        assert inst.get_num_instances() == 1
        num_vars = inst.get_num_vars() // 2  # per-section size
        assert len(vars_) == num_vars
        assert len(inputs) < num_vars

        transcript.append_protocol_name(NIZK.protocol_name())
        t_dig = Timer("instance_digest")
        transcript.append_message(b"R1CSInstanceDigest", instance_digest(inst))
        t_dig.stop()

        if random_tape is None:
            random_tape = RandomTape(b"proof")

        # witness sec 0: private vars. Committed with zero row blinds, as
        # the fork does for every witness poly (lib.rs:1973 etc. pass None);
        # hiding comes from the blinded sumcheck/sigma layers.
        t_wit = Timer("witness_commit")
        vars_sec = ProverWitnessSecInfo.from_scalars(
            [num_vars], [[list(map(int, vars_))]])
        comm_vars, _blinds = vars_sec.poly_w[0].commit(
            gens.gens_r1cs_sat.gens_pc, None)
        comm_vars.append_to_transcript(b"poly_commitment", transcript)

        # witness sec 1: public io (deterministic zero-blind commitment)
        fast = _io_poly_and_comm(num_vars, inputs, gens.gens_r1cs_sat.gens_pc)
        if fast is not None:
            Zm_io, comm_io = fast
            io_sec = ProverWitnessSecInfo(
                [num_vars], [Zm_io.reshape(1, num_vars, 16)],
                [DensePolynomial(Zm_io)])
        else:
            io = _io_sec(num_vars, inputs)
            io_sec = ProverWitnessSecInfo.from_scalars(
                [num_vars], [[[int(v) for v in io]]])
            comm_io, _ = io_sec.poly_w[0].commit(
                gens.gens_r1cs_sat.gens_pc, None)
        comm_io.append_to_transcript(b"poly_commitment", transcript)
        t_wit.stop()

        proof, r = R1CSProof.prove(
            1, 1, [1], num_vars, [num_vars], [vars_sec, io_sec], inst,
            gens.gens_r1cs_sat, transcript, random_tape)
        timer.stop()
        return NIZK(proof, comm_vars, r)

    def verify(self, inst, inputs, gens: NIZKGens, transcript):
        timer = Timer("NIZK::verify")
        num_vars = inst.get_num_vars() // 2  # per-section size
        transcript.append_protocol_name(NIZK.protocol_name())
        transcript.append_message(b"R1CSInstanceDigest", instance_digest(inst))

        self.comm_vars.append_to_transcript(b"poly_commitment", transcript)
        t_io = Timer("verify_comm_io")
        fast = _io_poly_and_comm(num_vars, inputs, gens.gens_r1cs_sat.gens_pc)
        if fast is not None:
            comm_io = fast[1]
        else:
            io = _io_sec(num_vars, inputs)
            io_poly = DensePolynomial.from_scalars(io)
            comm_io, _ = io_poly.commit(gens.gens_r1cs_sat.gens_pc, None)
        comm_io.append_to_transcript(b"poly_commitment", transcript)
        t_io.stop()

        # evaluate A/B/C at the claimed point (upstream lib.rs:3981-3984)
        timer_eval = Timer("eval_sparse_polys")
        _rp, _rq_rev, rx, ry_full = self.r
        eA, eB, eC = inst.evaluate(rx, ry_full)
        timer_eval.stop()

        vars_view = VerifierWitnessSecInfo([1], [num_vars], [self.comm_vars])
        io_view = VerifierWitnessSecInfo([1], [num_vars], [comm_io])
        r_out = self.r1cs_sat_proof.verify(
            1, 1, [1], num_vars, [vars_view, io_view], inst.get_num_cons(),
            gens.gens_r1cs_sat, (eA, eB, eC), transcript)
        if r_out != self.r:
            raise ProofVerifyError("NIZK evaluation point mismatch")
        timer.stop()
