"""End-to-end SNARK pipeline with PHYSICAL and VIRTUAL memory.

Extends the counter program (tests/test_snark.py) with the memory half of
the protocol (VERDICT round-2 item 3): nonempty input_stack/input_mem
(init-mem verifier views, lib.rs:3028-3035), per-block phy/vir memory
extraction (instance.rs:456-633), mem_gen witness generation
(lib.rs:832-967), VIR_MEM_COHERE with ts-bit range decomposition
(instance.rs:889-1034), ts_bits commitments, and the 8-way pairwise
merge. Also carries the flagship tamper-rejection suite (item 10).

Program: the same 2-block counter, plus
  * a write-once stack of 2 init entries (addr 0 -> 10, addr 1 -> 20)
    that each block execution loads (phy ops);
  * one RAM cell (init addr 0 -> 5) that is loaded, overwritten with 7,
    and loaded twice more (vir ops with increasing timestamps).
"""

import copy

import pytest

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.models.instance import (
    gen_block_inst,
    gen_pairwise_check_inst,
    gen_perm_root_inst,
)
from spartan_parallel_tpu.models.r1csproof import R1CSGens
from spartan_parallel_tpu.models.snark import SNARK, SNARKGens
from spartan_parallel_tpu.utils.errors import ProofVerifyError
from spartan_parallel_tpu.utils.transcript import Transcript

NIU = 3
NUM_VARS = 16  # io (6) + 2 phy-op slots + 4 vir-op slots, padded
NUM_IOS = 8
MAX_TS_WIDTH = 6
TS_BITS = 8


def phy_trace(rows):
    """[(addr, val)] address-sorted valid accesses ->
    addr_phy_mems_list rows [v, D, addr, val] with
    D = v' * (1 - addr' + addr) (instance.rs:811-884; the prover-supplied
    helper making addr deltas {0, 1} checkable)."""
    out = []
    for q, (a, v) in enumerate(rows):
        if q + 1 < len(rows):
            vp, ap = 1, rows[q + 1][0]
        else:
            vp, ap = 0, 0  # next row is zero padding
        d = vp * (1 - ap + a) % L
        out.append([1, d, a, v])
    return out


def vir_trace(rows):
    """[(addr, data, ls, ts)] sorted by (addr, ts) ->
    (addr_vir_mems_list rows [v, D1, addr, data, ls, ts, 0, 0],
     addr_ts_bits_list rows [D2, EQ, B0..B5]) satisfying VIR_MEM_COHERE
    (instance.rs:889-1034): D1 = v'(1 - addr' + addr), D2 = D1 * ls',
    D1*(ts' - ts) = EQ + sum(B_i 2^i) with boolean EQ/B_i."""
    mems, ts_bits = [], []
    for q, (a, d, ls, ts) in enumerate(rows):
        if q + 1 < len(rows):
            vp, (ap, _dp, lsp, tsp) = 1, rows[q + 1]
        else:
            vp, ap, lsp, tsp = 0, 0, 0, 0
        d1 = vp * (1 - ap + a) % L
        mems.append([1, d1, a, d, ls, ts, 0, 0])
        d2 = d1 * lsp % L
        dts = d1 * (tsp - ts) % L
        assert dts < (1 << MAX_TS_WIDTH) + 1
        eq = 1 if dts > 0 else 0
        rem = dts - eq
        bits = [(rem >> i) & 1 for i in range(MAX_TS_WIDTH)]
        ts_bits.append([d2, eq] + bits)
    return mems, ts_bits


def build_mem_program(s0=3):
    m1 = L - 1
    # same app constraints as the counter (cols 0..5 untouched by memory)
    block0_args = [
        ([(5, 1), (3, m1), (0, m1)], [(0, 1)], []),
        ([(4, 1), (0, m1)], [(0, 1)], []),
    ]
    block1_args = [
        ([(5, 1), (3, m1), (0, L - 2)], [(0, 1)], []),
    ]
    args = [block0_args, block1_args]

    # execution trace: blocks 0, 1, 0, 1; counter s0 -> s0+6
    s = s0
    exec_rows, io_per_step = [], []
    blocks = [0, 1, 0, 1]
    for q, b in enumerate(blocks):
        s_next = s + (1 if b == 0 else 2)
        next_block = blocks[q + 1] if q + 1 < len(blocks) else 2
        row = [1, 0, b, s % L, next_block, s_next % L, 0, 0]
        exec_rows.append(row)
        io_per_step.append((b, row))
        s = s_next
    final_s = s % L

    # memory schedule (see module docstring)
    phy_ops = [(0, 10), (1, 20), (0, 10), (1, 20)]   # per exec step
    vir_ops = [(0, 5, 1, 1), (0, 7, 0, 2), (0, 7, 1, 3), (0, 7, 1, 4)]

    # per-block vars: io ++ [PA, PD] ++ [VA, VD, VL, VT] ++ zero pad
    block_vars_mat = [[], []]
    for q, (b, row) in enumerate(io_per_step):
        pa, pd = phy_ops[q]
        va, vd, vl, vt = vir_ops[q]
        vars_row = list(row[:6]) + [pa, pd, va, vd, vl, vt] + [0] * 4
        block_vars_mat[b].append(vars_row)

    input_stack = [10, 20]  # init phy mem: addr i -> input_stack[i]
    input_mem = [5]         # init vir mem: addr 0 -> 5
    init_phy = [[1, 0, i, v] for i, v in enumerate(input_stack)]
    init_vir = [[1, 0, i, v] for i, v in enumerate(input_mem)]

    # address-sorted access traces (init entries appear at ts 0 / as the
    # write-once base of each stack address)
    addr_phy = phy_trace([(0, 10), (0, 10), (0, 10),
                          (1, 20), (1, 20), (1, 20)])
    addr_vir, ts_bits = vir_trace(
        [(0, 5, 0, 0), (0, 5, 1, 1), (0, 7, 0, 2),
         (0, 7, 1, 3), (0, 7, 1, 4)])

    prove_args = dict(
        input_block_num=0,
        output_block_num=2,
        input_liveness=[False, False, True],
        func_input_width=1,
        input_offset=1,
        output_offset=2,
        input_=[0, 0, s0],
        output=final_s,
        output_exec_num=3,
        num_vars=NUM_VARS,
        num_ios=NUM_IOS,
        max_block_num_phy_ops=1,
        block_num_phy_ops=[1, 1],
        max_block_num_vir_ops=1,
        block_num_vir_ops=[1, 1],
        mem_addr_ts_bits_size=TS_BITS,
        num_inputs_unpadded=NIU,
        block_num_vars=[NUM_VARS, NUM_VARS],
        block_num_instances_bound=2,
        block_max_num_proofs=2,
        block_num_proofs=[2, 2],
        consis_num_proofs=4,
        total_num_init_phy_mem_accesses=len(init_phy),
        total_num_init_vir_mem_accesses=len(init_vir),
        total_num_phy_mem_accesses=len(addr_phy),
        total_num_vir_mem_accesses=len(addr_vir),
        block_vars_mat=block_vars_mat,
        exec_inputs_list=exec_rows,
        init_phy_mems_list=init_phy,
        init_vir_mems_list=init_vir,
        addr_phy_mems_list=addr_phy,
        addr_vir_mems_list=addr_vir,
        addr_ts_bits_list=ts_bits,
        input_stack=input_stack,
        input_mem=input_mem,
    )
    return args, prove_args


def setup_instances(args):
    (block_num_vars_total, block_num_cons, block_nnz,
     block_inst) = gen_block_inst(2, NUM_VARS, args, NIU, [1, 1], [1, 1])
    (pw_vars, pw_cons, pw_nnz, pairwise_inst) = gen_pairwise_check_inst(
        MAX_TS_WIDTH, TS_BITS)
    (pr_cons, pr_nnz, perm_root_inst) = gen_perm_root_inst(NIU, NUM_IOS)

    block_gens = SNARKGens(block_num_cons, block_num_vars_total, 2,
                           block_nnz)
    pairwise_gens = SNARKGens(pw_cons, 4 * pw_vars, 3, pw_nnz)
    perm_root_gens = SNARKGens(pr_cons, 8 * NUM_IOS, 1, pr_nnz)
    # largest committed witness poly: addr_vir (8*8) / ts_bits (8*8)
    vars_gens = R1CSGens(b"gens_r1cs_sat", block_num_cons, 64)

    block_comm_map, block_comm_list, block_decomm_list = SNARK.multi_encode(
        block_inst, block_gens)
    pairwise_comm, pairwise_decomm = SNARK.encode(pairwise_inst,
                                                  pairwise_gens)
    perm_root_comm, perm_root_decomm = SNARK.encode(perm_root_inst,
                                                    perm_root_gens)
    return dict(
        block_inst=block_inst, block_num_cons=block_num_cons,
        pairwise_inst=pairwise_inst, pw_cons=pw_cons,
        perm_root_inst=perm_root_inst, pr_cons=pr_cons,
        block_gens=block_gens, pairwise_gens=pairwise_gens,
        perm_root_gens=perm_root_gens, vars_gens=vars_gens,
        block_comm_map=block_comm_map, block_comm_list=block_comm_list,
        block_decomm_list=block_decomm_list, pairwise_comm=pairwise_comm,
        pairwise_decomm=pairwise_decomm, perm_root_comm=perm_root_comm,
        perm_root_decomm=perm_root_decomm,
    )


def _prove(pa, ctx):
    tp = Transcript(b"snark_mem")
    return SNARK.prove(
        pa["input_block_num"], pa["output_block_num"],
        pa["input_liveness"], pa["func_input_width"], pa["input_offset"],
        pa["output_offset"], pa["input_"], pa["output"],
        pa["output_exec_num"], pa["num_vars"], pa["num_ios"],
        pa["max_block_num_phy_ops"], pa["block_num_phy_ops"],
        pa["max_block_num_vir_ops"], pa["block_num_vir_ops"],
        pa["mem_addr_ts_bits_size"], pa["num_inputs_unpadded"],
        pa["block_num_vars"], pa["block_num_instances_bound"],
        pa["block_max_num_proofs"], pa["block_num_proofs"],
        ctx["block_inst"], ctx["block_comm_map"], ctx["block_comm_list"],
        ctx["block_decomm_list"], ctx["block_gens"],
        pa["consis_num_proofs"], pa["total_num_init_phy_mem_accesses"],
        pa["total_num_init_vir_mem_accesses"],
        pa["total_num_phy_mem_accesses"],
        pa["total_num_vir_mem_accesses"], ctx["pairwise_inst"],
        ctx["pairwise_comm"], ctx["pairwise_decomm"], ctx["pairwise_gens"],
        pa["block_vars_mat"], pa["exec_inputs_list"],
        pa["init_phy_mems_list"], pa["init_vir_mems_list"],
        pa["addr_phy_mems_list"], pa["addr_vir_mems_list"],
        pa["addr_ts_bits_list"], ctx["perm_root_inst"],
        ctx["perm_root_comm"], ctx["perm_root_decomm"],
        ctx["perm_root_gens"], ctx["vars_gens"], tp)


def _verify(proof, pa, ctx):
    tv = Transcript(b"snark_mem")
    proof.verify(
        pa["input_block_num"], pa["output_block_num"],
        pa["input_liveness"], pa["func_input_width"], pa["input_offset"],
        pa["output_offset"], pa["input_"], pa["input_stack"],
        pa["input_mem"], pa["output"],
        pa["output_exec_num"], pa["num_vars"], pa["num_ios"],
        pa["max_block_num_phy_ops"], pa["block_num_phy_ops"],
        pa["max_block_num_vir_ops"], pa["block_num_vir_ops"],
        pa["mem_addr_ts_bits_size"], pa["num_inputs_unpadded"],
        pa["block_num_vars"], pa["block_num_instances_bound"],
        pa["block_max_num_proofs"], pa["block_num_proofs"],
        ctx["block_num_cons"], ctx["block_comm_map"],
        ctx["block_comm_list"], ctx["block_gens"],
        pa["consis_num_proofs"], pa["total_num_init_phy_mem_accesses"],
        pa["total_num_init_vir_mem_accesses"],
        pa["total_num_phy_mem_accesses"],
        pa["total_num_vir_mem_accesses"], ctx["pw_cons"],
        ctx["pairwise_comm"], ctx["pairwise_gens"], ctx["pr_cons"],
        ctx["perm_root_comm"], ctx["perm_root_gens"], ctx["vars_gens"], tv)


@pytest.fixture(scope="module")
def mem_proof():
    args, pa = build_mem_program()
    ctx = setup_instances(args)
    proof = _prove(pa, ctx)
    return proof, pa, ctx


def test_snark_mem_roundtrip(mem_proof):
    proof, pa, ctx = mem_proof
    _verify(proof, pa, ctx)


def test_snark_mem_rejects_tampered_witness_commitment(mem_proof):
    proof, pa, ctx = mem_proof
    bad = copy.deepcopy(proof)
    from spartan_parallel_tpu.core.edwards import RistrettoPoint

    bad.block_comm_vars_list[0].C[0] = RistrettoPoint.basepoint().compress()
    with pytest.raises((ProofVerifyError, AssertionError, ValueError)):
        _verify(bad, pa, ctx)


def test_snark_mem_rejects_tampered_perm_product(mem_proof):
    proof, pa, ctx = mem_proof
    bad = copy.deepcopy(proof)
    bad.perm_poly_poly_list = list(bad.perm_poly_poly_list)
    bad.perm_poly_poly_list[0] = bad.perm_poly_poly_list[0] + \
        bad.perm_poly_poly_list[0]
    with pytest.raises((ProofVerifyError, AssertionError, ValueError)):
        _verify(bad, pa, ctx)


def test_snark_mem_rejects_inconsistent_memory_trace():
    """A block claims a phy load of (0, 99) that the address-sorted trace
    never contains: the phy grand-product equality must fail."""
    args, pa = build_mem_program()
    ctx = setup_instances(args)
    pa["block_vars_mat"][0][0][7] = 99  # PD of exec0's load (was 10)
    proof = _prove(pa, ctx)
    with pytest.raises((ProofVerifyError, AssertionError, ValueError)):
        _verify(proof, pa, ctx)
