"""CLI driver: CTK/RTK bincode encode/decode round trip + end-to-end run.

The fixture is the counter program from test_snark expressed as
CompileTimeKnowledge/RunTimeKnowledge, serialized with the bincode encoder
(driver._Writer, the exact inverse of interface.rs:74-80/223-229 reads),
then re-parsed from bytes and driven through driver.run() — prove+verify
from files, exactly the interface.rs flow. A golden byte fixture pins the
wire format against regressions."""

import hashlib
import os

import jax
import pytest

from spartan_parallel_tpu.driver import (
    CompileTimeKnowledge,
    RunTimeKnowledge,
    run,
)
from spartan_parallel_tpu.core.consts import L

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def build_counter_ctk_rtk(s0=3):
    m1 = L - 1
    block0_args = [
        ([(5, 1), (3, m1), (0, m1)], [(0, 1)], []),
        ([(4, 1), (0, m1)], [(0, 1)], []),
    ]
    block1_args = [
        ([(5, 1), (3, m1), (0, L - 2)], [(0, 1)], []),
    ]
    ctk = CompileTimeKnowledge(
        block_num_instances=2,
        num_vars=8,
        num_inputs_unpadded=3,
        num_vars_per_block=[8, 8],
        block_num_phy_ops=[0, 0],
        block_num_vir_ops=[0, 0],
        max_ts_width=6,
        args=[block0_args, block1_args],
        input_liveness=[False, False, True],
        func_input_width=1,
        input_offset=1,
        input_block_num=0,
        output_offset=2,
        output_block_num=2,
    )

    s = s0
    exec_rows = []
    blocks = [0, 1, 0, 1]
    block_vars_matrix = [[], []]
    for q, b in enumerate(blocks):
        s_next = s + (1 if b == 0 else 2)
        next_block = blocks[q + 1] if q + 1 < len(blocks) else 2
        row = [1, 0, b, s % L, next_block, s_next % L, 0, 0]
        exec_rows.append(row)
        block_vars_matrix[b].append(list(row))
        s = s_next

    rtk = RunTimeKnowledge(
        block_max_num_proofs=2,
        block_num_proofs=[2, 2],
        consis_num_proofs=4,
        total_num_init_phy_mem_accesses=0,
        total_num_init_vir_mem_accesses=0,
        total_num_phy_mem_accesses=0,
        total_num_vir_mem_accesses=0,
        block_vars_matrix=block_vars_matrix,
        exec_inputs=exec_rows,
        init_phy_mems_list=[],
        init_vir_mems_list=[],
        addr_phy_mems_list=[],
        addr_vir_mems_list=[],
        addr_ts_bits_list=[],
        input=[0, 0, s0],
        input_stack=[],
        input_mem=[],
        output=s % L,
        output_exec_num=3,
    )
    return ctk, rtk


def test_ctk_rtk_bincode_roundtrip():
    ctk, rtk = build_counter_ctk_rtk()
    ctk_bytes = ctk.serialize()
    rtk_bytes = rtk.serialize()

    ctk2 = CompileTimeKnowledge.deserialize(ctk_bytes)
    rtk2 = RunTimeKnowledge.deserialize(rtk_bytes)
    assert ctk2.serialize() == ctk_bytes
    assert rtk2.serialize() == rtk_bytes
    for f in CompileTimeKnowledge.FIELDS:
        assert getattr(ctk2, f) == getattr(ctk, f), f
    for f in RunTimeKnowledge.FIELDS:
        assert getattr(rtk2, f) == getattr(rtk, f), f


def test_ctk_rtk_golden_fixture():
    """Wire format pinned: bytes produced today must match the committed
    fixture (catches accidental encoder/decoder drift)."""
    ctk, rtk = build_counter_ctk_rtk()
    for name, data in (("counter_bin.ctk", ctk.serialize()),
                       ("counter_bin.rtk", rtk.serialize())):
        path = os.path.join(FIXTURE_DIR, name)
        with open(path, "rb") as f:
            golden = f.read()
        assert hashlib.sha256(data).hexdigest() == \
            hashlib.sha256(golden).hexdigest(), f"{name} drifted"


def test_driver_run_from_files(tmp_path):
    """interface.rs end-to-end: parse files, build instances/gens, prove,
    verify (driver smoke test per the round-1 advisory)."""
    ctk_path = os.path.join(FIXTURE_DIR, "counter_bin.ctk")
    rtk_path = os.path.join(FIXTURE_DIR, "counter_bin.rtk")
    ctk = CompileTimeKnowledge.from_file(ctk_path)
    rtk = RunTimeKnowledge.from_file(rtk_path)
    run(ctk, rtk, vars_bound=64)


def build_counter_mem_ctk_rtk():
    """The memory-exercising counter (tests/test_snark_mem.py) as
    CTK/RTK: nonzero phy/vir ops, init stack/mem, ts bits — the fixture
    shape the reference's zok benchmarks use (interface.rs:198-220)."""
    from .test_snark_mem import NUM_VARS as MEM_NUM_VARS
    from .test_snark_mem import build_mem_program

    args, pa = build_mem_program()
    ctk = CompileTimeKnowledge(
        block_num_instances=2,
        num_vars=MEM_NUM_VARS,
        num_inputs_unpadded=3,
        num_vars_per_block=[MEM_NUM_VARS, MEM_NUM_VARS],
        block_num_phy_ops=pa["block_num_phy_ops"],
        block_num_vir_ops=pa["block_num_vir_ops"],
        max_ts_width=6,
        args=args,
        input_liveness=pa["input_liveness"],
        func_input_width=pa["func_input_width"],
        input_offset=pa["input_offset"],
        input_block_num=pa["input_block_num"],
        output_offset=pa["output_offset"],
        output_block_num=pa["output_block_num"],
    )
    rtk = RunTimeKnowledge(
        block_max_num_proofs=pa["block_max_num_proofs"],
        block_num_proofs=pa["block_num_proofs"],
        consis_num_proofs=pa["consis_num_proofs"],
        total_num_init_phy_mem_accesses=pa[
            "total_num_init_phy_mem_accesses"],
        total_num_init_vir_mem_accesses=pa[
            "total_num_init_vir_mem_accesses"],
        total_num_phy_mem_accesses=pa["total_num_phy_mem_accesses"],
        total_num_vir_mem_accesses=pa["total_num_vir_mem_accesses"],
        block_vars_matrix=pa["block_vars_mat"],
        exec_inputs=pa["exec_inputs_list"],
        init_phy_mems_list=pa["init_phy_mems_list"],
        init_vir_mems_list=pa["init_vir_mems_list"],
        addr_phy_mems_list=pa["addr_phy_mems_list"],
        addr_vir_mems_list=pa["addr_vir_mems_list"],
        addr_ts_bits_list=pa["addr_ts_bits_list"],
        input=pa["input_"],
        input_stack=pa["input_stack"],
        input_mem=pa["input_mem"],
        output=pa["output"],
        output_exec_num=pa["output_exec_num"],
    )
    return ctk, rtk


def test_ctk_rtk_mem_golden_fixture():
    """Memory-program wire format pinned (counter_mem_bin.{ctk,rtk})."""
    ctk, rtk = build_counter_mem_ctk_rtk()
    for name, data in (("counter_mem_bin.ctk", ctk.serialize()),
                       ("counter_mem_bin.rtk", rtk.serialize())):
        path = os.path.join(FIXTURE_DIR, name)
        with open(path, "rb") as f:
            golden = f.read()
        assert hashlib.sha256(data).hexdigest() == \
            hashlib.sha256(golden).hexdigest(), f"{name} drifted"
    ctk2 = CompileTimeKnowledge.deserialize(ctk.serialize())
    rtk2 = RunTimeKnowledge.deserialize(rtk.serialize())
    assert ctk2.serialize() == ctk.serialize()
    assert rtk2.serialize() == rtk.serialize()


def test_driver_run_mem_from_files():
    """interface.rs end-to-end on the MEMORY fixture: every mem subsystem
    (init mems, phy/vir addr traces, ts bits) drives through the full
    prove+verify from bincode files."""
    ctk = CompileTimeKnowledge.from_file(
        os.path.join(FIXTURE_DIR, "counter_mem_bin.ctk"))
    rtk = RunTimeKnowledge.from_file(
        os.path.join(FIXTURE_DIR, "counter_mem_bin.rtk"))
    run(ctk, rtk, vars_bound=64)


def test_driver_default_vars_bound_gens():
    """R1CSGens must accept the non-power-of-two TOTAL_NUM_VARS_BOUND
    (Math::log_2 rounds up; round-1 advisory crash)."""
    from spartan_parallel_tpu.models.r1csproof import R1CSGens

    R1CSGens(b"gens_r1cs_sat", 1024, 10_000_000)
