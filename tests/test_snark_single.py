"""Upstream-style single-instance SNARK (models/snark_single.py):
encode -> prove -> verify roundtrip + serialization + negative test."""

import pytest

from spartan_parallel_tpu import serialization as ser
from spartan_parallel_tpu.models.r1csinstance import produce_synthetic_r1cs
from spartan_parallel_tpu.models.snark_single import (
    SpartanSNARK,
    SpartanSNARKGens,
)
from spartan_parallel_tpu.utils.errors import ProofVerifyError
from spartan_parallel_tpu.utils.transcript import Transcript

N = 64


@pytest.fixture(scope="module")
def ctx():
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], N, N, 4, seed=3)
    gens = SpartanSNARKGens(N, N, max(
        m.get_num_nz_entries()
        for m in (inst.A_list + inst.B_list + inst.C_list)))
    comm, decomm = SpartanSNARK.encode(inst, gens)
    tp = Transcript(b"snark_single")
    proof = SpartanSNARK.prove(inst, comm, decomm, vars_mat[0][0],
                               inputs_mat[0][0], gens, tp)
    return inst, gens, comm, proof, inputs_mat[0][0]


def test_roundtrip(ctx):
    _inst, gens, comm, proof, inputs = ctx
    tv = Transcript(b"snark_single")
    proof.verify(comm, inputs, gens, tv)


def test_serialization_roundtrip(ctx):
    _inst, gens, comm, proof, inputs = ctx
    data = ser.serialize(proof)
    proof2 = ser.deserialize(data, "SpartanSNARK")
    assert ser.serialize(proof2) == data
    tv = Transcript(b"snark_single")
    proof2.verify(comm, inputs, gens, tv)
    assert ser.compressed_size(proof) > 0


def test_rejects_wrong_inputs(ctx):
    _inst, gens, comm, proof, inputs = ctx
    bad = list(inputs)
    bad[0] = (int(bad[0]) + 1)
    tv = Transcript(b"snark_single")
    with pytest.raises((ProofVerifyError, AssertionError, ValueError)):
        proof.verify(comm, bad, gens, tv)
