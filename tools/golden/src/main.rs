//! Golden-vector kit against the reference `libspartan`
//! (scroll-tech/spartan-parallel).
//!
//! spartan_parallel_tpu claims bit-exact Fiat-Shamir parity with the
//! reference; this binary turns that claim into a one-command check on any
//! machine WITH a Rust toolchain (the TPU build environment has none).
//! The Python comparator lives in tests/test_golden_kit.py and skips
//! itself when `cargo` is unavailable.
//!
//! Subcommands:
//!   challenges                      — dump a fixed merlin transcript
//!                                     schedule (64-byte challenge blobs,
//!                                     hex) covering every append
//!                                     convention of src/transcript.rs
//!   digest    <ctk> <rtk>           — build the three instance sets
//!                                     exactly as examples/interface.rs
//!                                     does and print their digests
//!                                     (zlib(bincode(R1CSInstance)),
//!                                     src/r1csinstance.rs:218-222) —
//!                                     diffs the tdefl port (PARITY.md D1)
//!   prove     <ctk> <rtk> <out>     — run SNARK::prove, write the
//!                                     bincode-serialized proof to <out>
//!   verify    <ctk> <rtk> <proof>   — deserialize <proof> as the
//!                                     reference SNARK struct and verify
//!                                     it (accepts proofs produced by
//!                                     spartan_parallel_tpu if and only if
//!                                     the protocols are bit-identical)

use std::env;
use std::fs;

use merlin::Transcript;
use serde::{Deserialize, Serialize};

use libspartan::{
  instance::Instance, InputsAssignment, MemsAssignment, SNARKGens, VarsAssignment, SNARK,
};

const TOTAL_NUM_VARS_BOUND: usize = 10_000_000;

// The frontend interchange structs; field layout is the bincode wire
// format fixed by examples/interface.rs:47-71 and :198-220.
#[derive(Serialize, Deserialize)]
struct CompileTimeKnowledge {
  block_num_instances: usize,
  num_vars: usize,
  num_inputs_unpadded: usize,
  num_vars_per_block: Vec<usize>,
  block_num_phy_ops: Vec<usize>,
  block_num_vir_ops: Vec<usize>,
  max_ts_width: usize,
  #[allow(clippy::type_complexity)]
  args: Vec<
    Vec<(
      Vec<(usize, [u8; 32])>,
      Vec<(usize, [u8; 32])>,
      Vec<(usize, [u8; 32])>,
    )>,
  >,
  input_liveness: Vec<bool>,
  func_input_width: usize,
  input_offset: usize,
  input_block_num: usize,
  output_offset: usize,
  output_block_num: usize,
}

#[derive(Serialize, Deserialize)]
struct RunTimeKnowledge {
  block_max_num_proofs: usize,
  block_num_proofs: Vec<usize>,
  consis_num_proofs: usize,
  total_num_init_phy_mem_accesses: usize,
  total_num_init_vir_mem_accesses: usize,
  total_num_phy_mem_accesses: usize,
  total_num_vir_mem_accesses: usize,
  block_vars_matrix: Vec<Vec<VarsAssignment>>,
  exec_inputs: Vec<InputsAssignment>,
  init_phy_mems_list: Vec<MemsAssignment>,
  init_vir_mems_list: Vec<MemsAssignment>,
  addr_phy_mems_list: Vec<MemsAssignment>,
  addr_vir_mems_list: Vec<MemsAssignment>,
  addr_ts_bits_list: Vec<MemsAssignment>,
  input: Vec<[u8; 32]>,
  input_stack: Vec<[u8; 32]>,
  input_mem: Vec<[u8; 32]>,
  output: [u8; 32],
  output_exec_num: usize,
}

fn load(ctk_path: &str, rtk_path: &str) -> (CompileTimeKnowledge, RunTimeKnowledge) {
  let ctk = bincode::deserialize(&fs::read(ctk_path).unwrap()).unwrap();
  let rtk = bincode::deserialize(&fs::read(rtk_path).unwrap()).unwrap();
  (ctk, rtk)
}

/// Fixed transcript schedule touching every append convention the
/// protocols use (src/transcript.rs:6-63): message, 32-byte scalar blob,
/// 32-byte point blob, scalar-vector framing, and a protocol name. The
/// Python side replays the identical schedule through its STROBE merlin
/// and must reproduce every challenge byte.
fn challenges() {
  let mut t = Transcript::new(b"golden_kit");
  t.append_message(b"protocol-name", b"golden test");
  t.append_message(b"msg", b"hello transcript");
  let scalar: [u8; 32] = core::array::from_fn(|i| i as u8);
  t.append_message(b"sc", &scalar);
  let point: [u8; 32] = core::array::from_fn(|i| (255 - i) as u8);
  t.append_message(b"pt", &point);
  // [Scalar] framing (transcript.rs:50-57)
  t.append_message(b"vec", b"begin_append_vector");
  for k in 0..3u8 {
    let s: [u8; 32] = core::array::from_fn(|i| (i as u8).wrapping_mul(k + 1));
    t.append_message(b"vec", &s);
  }
  t.append_message(b"vec", b"end_append_vector");
  for label in [&b"c1"[..], &b"c2"[..], &b"c3"[..]] {
    let mut buf = [0u8; 64];
    t.challenge_bytes(label, &mut buf);
    println!("challenge {} {}", String::from_utf8_lossy(label), hex::encode(buf));
  }
}

/// Instance construction mirroring examples/interface.rs:458-531.
#[allow(clippy::type_complexity)]
fn build_instances(
  ctk: &CompileTimeKnowledge,
  rtk: &RunTimeKnowledge,
) -> (
  (usize, usize, usize, Instance),
  (usize, usize, usize, Instance),
  (usize, usize, Instance),
  usize,
  usize,
) {
  let num_ios = (ctk.num_inputs_unpadded * 2).next_power_of_two();
  let mem_addr_ts_bits_size = (2 + ctk.max_ts_width).next_power_of_two();
  let block = Instance::gen_block_inst::<false>(
    ctk.block_num_instances,
    ctk.num_vars,
    &ctk.args,
    ctk.num_inputs_unpadded,
    &ctk.block_num_phy_ops,
    &ctk.block_num_vir_ops,
    &ctk.num_vars_per_block,
    &rtk.block_num_proofs,
  );
  let pairwise = Instance::gen_pairwise_check_inst::<false>(
    ctk.max_ts_width,
    mem_addr_ts_bits_size,
    rtk.consis_num_proofs,
    rtk.total_num_phy_mem_accesses,
    rtk.total_num_vir_mem_accesses,
  );
  let perm = Instance::gen_perm_root_inst::<false>(
    ctk.num_inputs_unpadded,
    num_ios,
    rtk.consis_num_proofs,
    rtk.total_num_phy_mem_accesses,
    rtk.total_num_vir_mem_accesses,
  );
  (block, pairwise, perm, num_ios, mem_addr_ts_bits_size)
}

fn digest(ctk_path: &str, rtk_path: &str) {
  let (ctk, rtk) = load(ctk_path, rtk_path);
  let (block, pairwise, perm, _, _) = build_instances(&ctk, &rtk);
  println!("block_digest {}", hex::encode(&block.3.digest));
  println!("pairwise_digest {}", hex::encode(&pairwise.3.digest));
  println!("perm_root_digest {}", hex::encode(&perm.2.digest));
}

struct Setup {
  block: (usize, usize, usize, Instance),
  pairwise: (usize, usize, usize, Instance),
  perm: (usize, usize, Instance),
  num_ios: usize,
  mem_addr_ts_bits_size: usize,
  block_gens: SNARKGens,
  pairwise_gens: SNARKGens,
  perm_gens: SNARKGens,
  vars_gens: SNARKGens,
}

fn setup(ctk: &CompileTimeKnowledge, rtk: &RunTimeKnowledge) -> Setup {
  let (block, pairwise, perm, num_ios, mem_addr_ts_bits_size) = build_instances(ctk, rtk);
  let block_gens = SNARKGens::new(block.1, block.0, ctk.block_num_instances, block.2);
  let pairwise_gens = SNARKGens::new(pairwise.1, 4 * pairwise.0, 3, pairwise.2);
  let perm_gens = SNARKGens::new(perm.0, 8 * num_ios, 1, perm.1);
  let vars_gens = SNARKGens::new(
    block.1,
    TOTAL_NUM_VARS_BOUND,
    ctk.block_num_instances.next_power_of_two(),
    block.2,
  );
  Setup {
    block,
    pairwise,
    perm,
    num_ios,
    mem_addr_ts_bits_size,
    block_gens,
    pairwise_gens,
    perm_gens,
    vars_gens,
  }
}

fn prove(ctk_path: &str, rtk_path: &str, out_path: &str) {
  let (ctk, rtk) = load(ctk_path, rtk_path);
  let mut s = setup(&ctk, &rtk);
  let (block_comm_map, block_comm_list, block_decomm_list) =
    SNARK::multi_encode(&s.block.3, &s.block_gens);
  let (pairwise_comm, pairwise_decomm) = SNARK::encode(&s.pairwise.3, &s.pairwise_gens);
  let (perm_comm, perm_decomm) = SNARK::encode(&s.perm.2, &s.perm_gens);
  let max_bpo = *ctk.block_num_phy_ops.iter().max().unwrap();
  let max_bvo = *ctk.block_num_vir_ops.iter().max().unwrap();
  let mut t = Transcript::new(b"snark_example");
  let proof = SNARK::prove(
    ctk.input_block_num,
    ctk.output_block_num,
    &ctk.input_liveness,
    ctk.func_input_width,
    ctk.input_offset,
    ctk.output_offset,
    &rtk.input,
    &rtk.output,
    rtk.output_exec_num,
    ctk.num_vars,
    s.num_ios,
    max_bpo,
    &ctk.block_num_phy_ops,
    max_bvo,
    &ctk.block_num_vir_ops,
    s.mem_addr_ts_bits_size,
    ctk.num_inputs_unpadded,
    &ctk.num_vars_per_block,
    ctk.block_num_instances,
    rtk.block_max_num_proofs,
    &rtk.block_num_proofs,
    &mut s.block.3,
    &block_comm_map,
    &block_comm_list,
    &block_decomm_list,
    &s.block_gens,
    rtk.consis_num_proofs,
    rtk.total_num_init_phy_mem_accesses,
    rtk.total_num_init_vir_mem_accesses,
    rtk.total_num_phy_mem_accesses,
    rtk.total_num_vir_mem_accesses,
    &mut s.pairwise.3,
    &pairwise_comm,
    &pairwise_decomm,
    &s.pairwise_gens,
    rtk.block_vars_matrix,
    rtk.exec_inputs,
    rtk.init_phy_mems_list,
    rtk.init_vir_mems_list,
    rtk.addr_phy_mems_list,
    rtk.addr_vir_mems_list,
    rtk.addr_ts_bits_list,
    &s.perm.2,
    &perm_comm,
    &perm_decomm,
    &s.perm_gens,
    &s.vars_gens.gens_r1cs_sat,
    &mut t,
  );
  let bytes = bincode::serialize(&proof).unwrap();
  fs::write(out_path, &bytes).unwrap();
  println!("proof_bytes {}", bytes.len());
}

fn verify(ctk_path: &str, rtk_path: &str, proof_path: &str) {
  let (ctk, rtk) = load(ctk_path, rtk_path);
  let mut s = setup(&ctk, &rtk);
  let (block_comm_map, block_comm_list, _) = SNARK::multi_encode(&s.block.3, &s.block_gens);
  let (pairwise_comm, _) = SNARK::encode(&s.pairwise.3, &s.pairwise_gens);
  let (perm_comm, _) = SNARK::encode(&s.perm.2, &s.perm_gens);
  let max_bpo = *ctk.block_num_phy_ops.iter().max().unwrap();
  let max_bvo = *ctk.block_num_vir_ops.iter().max().unwrap();
  let proof: SNARK = bincode::deserialize(&fs::read(proof_path).unwrap()).unwrap();
  let mut t = Transcript::new(b"snark_example");
  let res = proof.verify(
    ctk.input_block_num,
    ctk.output_block_num,
    &ctk.input_liveness,
    ctk.func_input_width,
    ctk.input_offset,
    ctk.output_offset,
    &rtk.input,
    &rtk.input_stack,
    &rtk.input_mem,
    &rtk.output,
    rtk.output_exec_num,
    ctk.num_vars,
    s.num_ios,
    max_bpo,
    &ctk.block_num_phy_ops,
    max_bvo,
    &ctk.block_num_vir_ops,
    s.mem_addr_ts_bits_size,
    ctk.num_inputs_unpadded,
    &ctk.num_vars_per_block,
    ctk.block_num_instances,
    rtk.block_max_num_proofs,
    &rtk.block_num_proofs,
    s.block.1,
    &block_comm_map,
    &block_comm_list,
    &s.block_gens,
    rtk.consis_num_proofs,
    rtk.total_num_init_phy_mem_accesses,
    rtk.total_num_init_vir_mem_accesses,
    rtk.total_num_phy_mem_accesses,
    rtk.total_num_vir_mem_accesses,
    s.pairwise.1,
    &pairwise_comm,
    &s.pairwise_gens,
    s.perm.0,
    &perm_comm,
    &s.perm_gens,
    &s.vars_gens.gens_r1cs_sat,
    &mut t,
  );
  match res {
    Ok(()) => println!("verify ok"),
    Err(e) => {
      println!("verify FAILED: {:?}", e);
      std::process::exit(1);
    }
  }
}

fn main() {
  let args: Vec<String> = env::args().collect();
  match args.get(1).map(String::as_str) {
    Some("challenges") => challenges(),
    Some("digest") => digest(&args[2], &args[3]),
    Some("prove") => prove(&args[2], &args[3], &args[4]),
    Some("verify") => verify(&args[2], &args[3], &args[4]),
    _ => {
      eprintln!("usage: spartan-golden challenges | digest <ctk> <rtk> | prove <ctk> <rtk> <out> | verify <ctk> <rtk> <proof>");
      std::process::exit(2);
    }
  }
}
