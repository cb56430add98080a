"""Multi-chip sharding: determinism vs single-device results."""

import jax
import numpy as np

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.ops import fq
from spartan_parallel_tpu.ops import sumcheck as sck
from spartan_parallel_tpu.parallel.mesh import (
    dryrun_step,
    make_mesh,
    replicate,
    shard_q,
    sharded_p1_round,
)

rng = np.random.default_rng(21)


def rand_tab(*shape):
    import jax.numpy as jnp

    n = int(np.prod(shape)) if shape else 1
    vals = [int.from_bytes(rng.bytes(40), "little") % L for _ in range(n)]
    arr = jnp.asarray(fq.encode(vals))
    return arr.reshape(*shape, 16) if shape else arr[0]


def test_sharded_round_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    P_i, Q, X = 2, 16, 8
    tp, tq, tx = rand_tab(P_i), rand_tab(Q), rand_tab(X)
    B, C, D = rand_tab(P_i, Q, X), rand_tab(P_i, Q, X), rand_tab(P_i, Q, X)
    r = rand_tab()

    # single device
    n_half = np.uint32(X // 2)
    ev1 = sck.p1_evals(tp, tq, tx, B, C, D, n_half, mode=sck.MODE_X)
    t1 = sck.p1_bind(tp, tq, tx, B, C, D, r, n_half, mode=sck.MODE_X)

    # sharded over 8 virtual devices on q
    mesh = make_mesh(8)
    args = (replicate(mesh, tp), shard_q(mesh, tq, 0),
            replicate(mesh, tx), shard_q(mesh, B), shard_q(mesh, C),
            shard_q(mesh, D), replicate(mesh, r))
    ev8, t8 = sharded_p1_round(*args, n_half, sck.MODE_X)

    assert np.array_equal(np.asarray(ev1), np.asarray(ev8)), \
        "sharded round evals must be bit-exact vs single device"
    for a, b in zip(t1, t8):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_dryrun_step_runs():
    mesh = make_mesh(8)
    evals, _ = dryrun_step(mesh)
    assert evals.shape == (3, 16)


def test_sharded_nizk_bit_exact_vs_single_device():
    """The full NIZK prover under an 8-device mesh produces byte-identical
    proofs vs one device (exact integer reductions make collective order
    irrelevant — SURVEY.md §2.3 determinism constraint)."""
    from spartan_parallel_tpu import serialization as ser
    from spartan_parallel_tpu.models.nizk import NIZK, NIZKGens
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.parallel.context import prover_mesh
    from spartan_parallel_tpu.parallel.mesh import make_mesh
    from spartan_parallel_tpu.utils.random_tape import RandomTape
    from spartan_parallel_tpu.utils.transcript import Transcript

    n = 64
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 4, seed=11)
    gens = NIZKGens(n, n)

    def prove_once():
        tape = RandomTape(b"proof", seed=b"\x07" * 32)
        tp = Transcript(b"shard_nizk")
        return NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens,
                          tp, random_tape=tape)

    single = ser.serialize(prove_once())
    with prover_mesh(make_mesh(8)):
        sharded_proof = prove_once()
    sharded = ser.serialize(sharded_proof)
    assert single == sharded, "sharded prove must be bit-exact"

    tv = Transcript(b"shard_nizk")
    sharded_proof.verify(inst, inputs_mat[0][0], gens, tv)


def test_sharded_nizk_two_axis_mesh_bit_exact():
    """Same bit-exactness over a 2x4 (host, chip) mesh: q shards over
    hosts*chips, round psums reduce chip-first (ICI) then host (DCN)."""
    from spartan_parallel_tpu import serialization as ser
    from spartan_parallel_tpu.models.nizk import NIZK, NIZKGens
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.parallel.context import prover_mesh
    from spartan_parallel_tpu.parallel.mesh import make_mesh2
    from spartan_parallel_tpu.utils.random_tape import RandomTape
    from spartan_parallel_tpu.utils.transcript import Transcript

    n = 64
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 4, seed=11)
    gens = NIZKGens(n, n)

    def prove_once():
        tape = RandomTape(b"proof", seed=b"\x07" * 32)
        tp = Transcript(b"shard_nizk")
        return NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens,
                          tp, random_tape=tape)

    single = ser.serialize(prove_once())
    with prover_mesh(make_mesh2(2, 4)):
        sharded = ser.serialize(prove_once())
    assert single == sharded, "two-axis sharded prove must be bit-exact"


def test_sharded_dp_r1csproof_bit_exact():
    """The data-parallel R1CSProof (P=4 instances, skewed Q — q-size
    classes) under an 8-device mesh is byte-identical to single-device
    (VERDICT round-2 item 4b)."""
    from spartan_parallel_tpu import serialization as ser
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.models.r1csproof import (
        ProverWitnessSecInfo,
        R1CSGens,
        R1CSProof,
    )
    from spartan_parallel_tpu.parallel.context import prover_mesh
    from spartan_parallel_tpu.utils.random_tape import RandomTape
    from spartan_parallel_tpu.utils.transcript import Transcript

    ncons = 32
    num_proofs = [8, 2, 1, 1]
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        4, num_proofs, ncons, ncons, 4, seed=13)
    nv = inst.get_num_vars() // 2
    gens = R1CSGens(b"gens_r1cs_sat", ncons, 8 * nv)
    io_mat = [[[1] + list(io) + [0] * (nv - 1 - len(io))
               for io in inputs_mat[p]] for p in range(4)]
    vars_sec = ProverWitnessSecInfo.from_scalars([nv] * 4, vars_mat)
    io_sec = ProverWitnessSecInfo.from_scalars([nv] * 4, io_mat)

    def prove_once():
        tape = RandomTape(b"proof", seed=b"\x0e" * 32)
        tp = Transcript(b"shard_dp")
        proof, _ = R1CSProof.prove(4, 8, num_proofs, nv, [nv] * 4,
                                   [vars_sec, io_sec], inst, gens, tp,
                                   tape)
        return ser.serialize(proof, "R1CSProof")

    single = prove_once()
    with prover_mesh(make_mesh(8)):
        sharded = prove_once()
    assert single == sharded, "sharded DP prove must be bit-exact"


def test_sharded_snark_counter_bit_exact():
    """The FULL 9-stage SNARK pipeline under an 8-device mesh produces
    byte-identical proofs vs single-device (VERDICT round-2 item 4b) and
    verifies."""
    from spartan_parallel_tpu import examples as ex
    from spartan_parallel_tpu import serialization as ser
    from spartan_parallel_tpu.parallel.context import prover_mesh

    args, pa = ex.build_counter_program()
    ctx = ex.setup_counter_instances(args)

    single_proof = ex.prove_counter(pa, ctx, label=b"shard_snark",
                                    tape_seed=b"\x0f" * 32)
    # instance sorting mutates block_inst; rebuild for the second prove
    args2, pa2 = ex.build_counter_program()
    ctx2 = ex.setup_counter_instances(args2)
    with prover_mesh(make_mesh(8)):
        sharded_proof = ex.prove_counter(pa2, ctx2, label=b"shard_snark",
                                         tape_seed=b"\x0f" * 32)
    assert ser.serialize(single_proof, "SNARK") == \
        ser.serialize(sharded_proof, "SNARK"), \
        "sharded SNARK prove must be bit-exact"
    ex.verify_counter(sharded_proof, pa2, ctx2, label=b"shard_snark")


def test_graft_entry():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)
