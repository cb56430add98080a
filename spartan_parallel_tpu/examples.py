"""Hand-built example programs playing the circ_blocks frontend's role
(reference: examples/interface.rs + the zok fixtures).

The 2-block "counter" zkVM trace exercises the full 9-stage SNARK
pipeline (blocks, consistency, permutation, shift, IO proofs); used by
the multi-chip dry run (__graft_entry__.py), the sharding bit-exactness
tests, and as a template for the driver's .ctk/.rtk fixtures.
"""

from __future__ import annotations

from .core.consts import L
from .models.instance import (
    gen_block_inst,
    gen_pairwise_check_inst,
    gen_perm_root_inst,
)
from .models.r1csproof import R1CSGens
from .models.snark import SNARK, SNARKGens
from .utils.random_tape import RandomTape
from .utils.transcript import Transcript

NIU = 3
NUM_VARS = 8
NUM_IOS = 8
MAX_TS_WIDTH = 6
TS_BITS = 8


def build_counter_program(s0: int = 3):
    """Counter program: block 0 does s += 1, block 1 does s += 2;
    executed 0 -> 1 -> 0 -> 1 -> exit. Returns (args, prove_args)."""
    m1 = L - 1
    block0_args = [
        ([(5, 1), (3, m1), (0, m1)], [(0, 1)], []),
        ([(4, 1), (0, m1)], [(0, 1)], []),
    ]
    block1_args = [
        ([(5, 1), (3, m1), (0, L - 2)], [(0, 1)], []),
    ]
    args = [block0_args, block1_args]

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

    block_vars_mat = [[], []]
    for b, row in io_per_step:
        block_vars_mat[b].append(list(row))

    prove_args = dict(
        input_block_num=0, output_block_num=2,
        input_liveness=[False, False, True],
        func_input_width=1, input_offset=1, output_offset=2,
        input_=[0, 0, s0], output=final_s, output_exec_num=3,
        num_vars=NUM_VARS, num_ios=NUM_IOS,
        max_block_num_phy_ops=0, block_num_phy_ops=[0, 0],
        max_block_num_vir_ops=0, block_num_vir_ops=[0, 0],
        mem_addr_ts_bits_size=TS_BITS, num_inputs_unpadded=NIU,
        block_num_vars=[NUM_VARS, NUM_VARS],
        block_num_instances_bound=2, block_max_num_proofs=2,
        block_num_proofs=[2, 2], consis_num_proofs=4,
        total_num_init_phy_mem_accesses=0,
        total_num_init_vir_mem_accesses=0,
        total_num_phy_mem_accesses=0, total_num_vir_mem_accesses=0,
        block_vars_mat=block_vars_mat, exec_inputs_list=exec_rows,
        init_phy_mems_list=[], init_vir_mems_list=[],
        addr_phy_mems_list=[], addr_vir_mems_list=[],
        addr_ts_bits_list=[], input_stack=[], input_mem=[],
    )
    return args, prove_args


def setup_counter_instances(args):
    (block_num_vars_total, block_num_cons, block_nnz,
     block_inst) = gen_block_inst(2, NUM_VARS, args, NIU, [0, 0], [0, 0])
    (pw_vars, pw_cons, pw_nnz, pairwise_inst) = gen_pairwise_check_inst(
        MAX_TS_WIDTH, TS_BITS)
    (pr_cons, pr_nnz, perm_root_inst) = gen_perm_root_inst(NIU, NUM_IOS)

    block_gens = SNARKGens(block_num_cons, block_num_vars_total, 2,
                           block_nnz)
    pairwise_gens = SNARKGens(pw_cons, 4 * pw_vars, 3, pw_nnz)
    perm_root_gens = SNARKGens(pr_cons, 8 * NUM_IOS, 1, pr_nnz)
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


def prove_counter(pa, ctx, label: bytes = b"snark_example",
                  tape_seed: bytes | None = None):
    tp = Transcript(label)
    tape = RandomTape(b"proof", seed=tape_seed) if tape_seed else None
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
        ctx["perm_root_gens"], ctx["vars_gens"], tp, random_tape=tape)


def verify_counter(proof, pa, ctx, label: bytes = b"snark_example"):
    tv = Transcript(label)
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
