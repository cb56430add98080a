"""Proof serialization: bincode layout round-trip + verify-after-load.

Reference behavior: lib.rs serde derives + bincode; proof sizes reported
compressed (README.md:156)."""

import numpy as np

from spartan_parallel_tpu import serialization as ser
from spartan_parallel_tpu.models.nizk import NIZK, NIZKGens
from spartan_parallel_tpu.models.r1csinstance import produce_synthetic_r1cs
from spartan_parallel_tpu.utils.transcript import Transcript


def test_nizk_proof_roundtrip_bytes_and_verify():
    n = 16
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 4, seed=5)
    gens = NIZKGens(n, n)
    tp = Transcript(b"ser_test")
    proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens, tp)

    raw = ser.serialize(proof)
    assert isinstance(raw, bytes) and len(raw) > 500
    csize = ser.compressed_size(proof)
    assert 0 < csize <= len(raw)

    loaded = ser.deserialize(raw, "NIZK")
    # byte-identity through a full round trip
    assert ser.serialize(loaded) == raw
    # the loaded proof must still verify
    tv = Transcript(b"ser_test")
    loaded.verify(inst, inputs_mat[0][0], gens, tv)


def test_serialize_deterministic():
    n = 16
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 4, seed=6)
    gens = NIZKGens(n, n)
    tp = Transcript(b"ser_det")
    proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens, tp)
    assert ser.serialize(proof) == ser.serialize(proof)


def test_instance_digest_is_zlib_bincode():
    import zlib

    n = 16
    inst, _, _ = produce_synthetic_r1cs(1, [1], n, n, 4, seed=7)
    d = inst.get_digest()
    # zlib stream: decompresses, and the payload starts with num_instances
    payload = zlib.decompress(d)
    assert int.from_bytes(payload[:8], "little") == 1  # num_instances
    assert int.from_bytes(payload[8:16], "little") == n  # max_num_cons
