"""Golden-vector comparison against the reference libspartan.

Runs ONLY where a Rust toolchain exists (skipped otherwise): builds
tools/golden/ (a thin binary over the reference crate) and cross-checks

  1. merlin transcript challenges — our STROBE implementation replays the
     kit's fixed append schedule and must reproduce every challenge byte;
  2. instance digests on the counter fixture — diffs the tdefl/zlib +
     bincode digest pipeline (PARITY.md D1, r1csinstance.rs:218-222);
  3. proof interchange — the kit's Rust-produced proof must decode with
     our bincode layout, and (full protocol parity) our serialized proof
     must pass the Rust verifier.

Build once with:  cargo build --release --manifest-path tools/golden/Cargo.toml
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KIT = os.path.join(REPO, "tools", "golden")
BIN = os.path.join(KIT, "target", "release", "spartan-golden")
FIXTURES = os.path.join(REPO, "tests", "fixtures")

pytestmark = pytest.mark.skipif(
    shutil.which("cargo") is None,
    reason="golden kit needs a Rust toolchain (cargo not found)")


@pytest.fixture(scope="module")
def kit_bin():
    if not os.path.exists(BIN):
        subprocess.run(
            ["cargo", "build", "--release", "--manifest-path",
             os.path.join(KIT, "Cargo.toml")],
            check=True, timeout=1800)
    return BIN


def _run(kit_bin, *args) -> str:
    out = subprocess.run([kit_bin, *args], capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def test_transcript_challenges_match(kit_bin):
    from spartan_parallel_tpu.utils.transcript import Transcript

    t = Transcript(b"golden_kit")
    # identical schedule to tools/golden/src/main.rs::challenges()
    t.append_message(b"protocol-name", b"golden test")
    t.append_message(b"msg", b"hello transcript")
    t.append_message(b"sc", bytes(range(32)))
    t.append_message(b"pt", bytes(255 - i for i in range(32)))
    t.append_message(b"vec", b"begin_append_vector")
    for k in range(3):
        t.append_message(b"vec", bytes((i * (k + 1)) & 0xFF
                                       for i in range(32)))
    t.append_message(b"vec", b"end_append_vector")
    ours = {lbl: t.challenge_bytes(lbl.encode(), 64).hex()
            for lbl in ("c1", "c2", "c3")}

    theirs = {}
    for line in _run(kit_bin, "challenges").splitlines():
        parts = line.split()
        if parts and parts[0] == "challenge":
            theirs[parts[1]] = parts[2]
    assert theirs == ours


def test_instance_digests_match(kit_bin):
    from spartan_parallel_tpu import driver as drv
    from spartan_parallel_tpu.models.instance import (
        gen_block_inst,
        gen_pairwise_check_inst,
        gen_perm_root_inst,
    )

    ctk_path = os.path.join(FIXTURES, "counter_bin.ctk")
    rtk_path = os.path.join(FIXTURES, "counter_bin.rtk")
    ctk = drv.CompileTimeKnowledge.from_file(ctk_path)
    niu = ctk.num_inputs_unpadded
    num_ios = 1 << (2 * niu - 1).bit_length()
    ts_bits = 1 << max(0, (2 + ctk.max_ts_width - 1).bit_length())
    (_, _, _, block_inst) = gen_block_inst(
        ctk.block_num_instances, ctk.num_vars, ctk.args, niu,
        ctk.block_num_phy_ops, ctk.block_num_vir_ops)
    (_, _, _, pairwise_inst) = gen_pairwise_check_inst(
        ctk.max_ts_width, ts_bits)
    (_, _, perm_inst) = gen_perm_root_inst(niu, num_ios)

    theirs = {}
    for line in _run(kit_bin, "digest", ctk_path, rtk_path).splitlines():
        parts = line.split()
        if len(parts) == 2:
            theirs[parts[0]] = parts[1]
    assert theirs["block_digest"] == block_inst.digest.hex()
    assert theirs["pairwise_digest"] == pairwise_inst.digest.hex()
    assert theirs["perm_root_digest"] == perm_inst.digest.hex()


def test_rust_proof_decodes_and_ours_verifies(kit_bin, tmp_path):
    """Two-way proof interchange on the counter fixture."""
    from spartan_parallel_tpu import driver as drv
    from spartan_parallel_tpu import serialization as ser

    ctk_path = os.path.join(FIXTURES, "counter_bin.ctk")
    rtk_path = os.path.join(FIXTURES, "counter_bin.rtk")

    # Rust proof -> our decoder
    rust_proof = tmp_path / "rust_proof.bin"
    _run(kit_bin, "prove", ctk_path, rtk_path, str(rust_proof))
    decoded = ser.deserialize(rust_proof.read_bytes(), "SNARK")
    assert decoded is not None

    # our proof -> Rust verifier
    ctk = drv.CompileTimeKnowledge.from_file(ctk_path)
    rtk = drv.RunTimeKnowledge.from_file(rtk_path)
    proof = drv.run_prove_only(ctk, rtk)
    ours = tmp_path / "tpu_proof.bin"
    ours.write_bytes(ser.serialize(proof, "SNARK"))
    out = _run(kit_bin, "verify", ctk_path, rtk_path, str(ours))
    assert "verify ok" in out
