"""Data-parallel R1CS satisfiability proof — the spartan_parallel core.

Reference: src/r1csproof.rs:210 (prove), :687 (verify); witness-section
descriptors from src/lib.rs:510 (ProverWitnessSecInfo), :602
(VerifierWitnessSecInfo). The transcript schedule is replicated exactly;
the compute mapping is TPU-native:

  * z assembly and Az/Bz/Cz are gather/scatter SpMV kernels into dense
    bit-reversed (p, q, x) Montgomery tensors;
  * both disjoint-rounds sumchecks run over those tensors with fused
    per-round eval+bind device kernels (models/sumcheck.py);
  * witness openings evaluate device-resident DensePolynomials and batch
    the Hyrax openings per (num_proofs, num_inputs) class.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.edwards import RistrettoPoint, multiscalar_mul
from ..core.field import Scalar
from ..ops import fq
from ..ops.kernel_cache import cached_kernel
from ..ops.sumcheck import fold_chain, rev_perm
from ..parallel.context import shard_big
from ..utils.errors import ProofVerifyError
from ..utils.timer import Timer
from .commitments import MultiCommitGens, commit_scalar
from .custom_mlpoly import DensePolynomialPqx
from .dense_mlpoly import (
    DensePolynomial,
    EqPolynomial,
    PolyCommitmentGens,
    PolyEvalProof,
    log2,
    next_pow2,
    scalars_to_mont,
)
from .sigma import EqualityProof, KnowledgeProof, ProductProof
from .sumcheck import ZKSumcheckInstanceProof

_ZERO = Scalar.zero()
_ONE = Scalar.one()


def ceil_log2(n: int) -> int:
    """Reference Math::log_2 semantics (src/math.rs:13-21)."""
    assert n > 0
    return (n - 1).bit_length() if n > 1 else 0


class ProverWitnessSecInfo:
    """One witness section (lib.rs:510-557).

    w_mat: list over instances of (Q_p, n_inputs_p, 16) device Montgomery
    arrays (a single-entry list means the section is shared across
    instances; Q_p == 1 means one copy per block, broadcast over proofs).
    poly_w: the flattened DensePolynomial per instance (natural q-major
    order) used for commitments/openings.
    """

    __slots__ = ("num_inputs", "w_mat", "poly_w")

    def __init__(self, num_inputs, w_mat, poly_w):
        self.num_inputs = list(num_inputs)
        self.w_mat = w_mat
        self.poly_w = poly_w

    @staticmethod
    def from_scalars(num_inputs, w_mat_host):
        """w_mat_host: nested [p][q][i] ints/Scalars. Rows shorter than
        the section's declared width num_inputs[p] are zero-padded to it:
        the committed polynomial's row stride IS the declared width (the
        verifier reconstructs Z assuming it), so committing raw short
        rows would silently misalign every opening (found by the
        find_min-shaped fixture, whose app witness rows are narrower than
        the block's num_vars)."""
        from .dense_mlpoly import scalars_to_mont as s2m

        mats, polys = [], []
        for p in range(len(w_mat_host)):
            ni = num_inputs[p]
            rows = w_mat_host[p]
            assert all(len(q) <= ni for q in rows), \
                f"witness row wider than section width {ni}"
            flat = [int(v) for q in rows
                    for v in (list(q) + [0] * (ni - len(q)))]
            dev = s2m(flat).reshape(len(rows), ni, 16)
            mats.append(dev)
            polys.append(DensePolynomial(dev.reshape(-1, 16)))
        return ProverWitnessSecInfo(num_inputs, mats, polys)

    @staticmethod
    def dummy():
        return ProverWitnessSecInfo([], [], [])

    @staticmethod
    def concat(components):
        """lib.rs:537-553."""
        num_inputs, w_mat, poly_w = [], [], []
        for c in components:
            num_inputs += c.num_inputs
            w_mat += list(c.w_mat)
            poly_w += list(c.poly_w)
        return ProverWitnessSecInfo(num_inputs, w_mat, poly_w)

    @staticmethod
    def merge(components):
        """Merge sorted components by decreasing num_proofs (lib.rs:558-597).

        Returns (merged, inst_map)."""
        pointers = [0] * len(components)
        merged_size = sum(len(c.num_inputs) for c in components)
        inst_map, num_inputs, w_mat, poly_w = [], [], [], []
        while len(inst_map) < merged_size:
            nxt_max, nxt = 0, 0
            for i, c in enumerate(components):
                if pointers[i] < len(c.w_mat):
                    np_ = int(c.w_mat[pointers[i]].shape[0])
                    if np_ > nxt_max:
                        nxt_max, nxt = np_, i
            c = components[nxt]
            inst_map.append(nxt)
            num_inputs.append(c.num_inputs[pointers[nxt]])
            w_mat.append(c.w_mat[pointers[nxt]])
            poly_w.append(c.poly_w[pointers[nxt]])
            pointers[nxt] += 1
        return ProverWitnessSecInfo(num_inputs, w_mat, poly_w), inst_map


class VerifierWitnessSecInfo:
    """Verifier view: per-instance sizes + commitments (lib.rs:602-650)."""

    __slots__ = ("num_proofs", "num_inputs", "comm_w")

    def __init__(self, num_proofs, num_inputs, comm_w):
        self.num_proofs = list(num_proofs)[: len(comm_w)]
        self.num_inputs = list(num_inputs)
        self.comm_w = comm_w

    @staticmethod
    def dummy():
        return VerifierWitnessSecInfo([], [], [])

    @staticmethod
    def concat(components):
        num_inputs, num_proofs, comm_w = [], [], []
        for c in components:
            num_inputs += c.num_inputs
            num_proofs += c.num_proofs
            comm_w += list(c.comm_w)
        return VerifierWitnessSecInfo(num_proofs, num_inputs, comm_w)

    @staticmethod
    def merge(components):
        """lib.rs:655-695. Returns (merged, inst_map)."""
        pointers = [0] * len(components)
        merged_size = sum(len(c.num_inputs) for c in components)
        inst_map, num_inputs, num_proofs, comm_w = [], [], [], []
        while len(inst_map) < merged_size:
            nxt_max, nxt = 0, 0
            for i, c in enumerate(components):
                if pointers[i] < len(c.num_proofs):
                    if c.num_proofs[pointers[i]] > nxt_max:
                        nxt_max, nxt = c.num_proofs[pointers[i]], i
            c = components[nxt]
            inst_map.append(nxt)
            num_inputs.append(c.num_inputs[pointers[nxt]])
            num_proofs.append(c.num_proofs[pointers[nxt]])
            comm_w.append(c.comm_w[pointers[nxt]])
            pointers[nxt] += 1
        return VerifierWitnessSecInfo(num_proofs, num_inputs, comm_w), \
            inst_map


class R1CSSumcheckGens:
    """gens_1/gens_3/gens_4 (r1csproof.rs:45-66)."""

    __slots__ = ("gens_1", "gens_3", "gens_4")

    def __init__(self, label: bytes, gens_1_ref: MultiCommitGens):
        self.gens_1 = gens_1_ref
        self.gens_3 = MultiCommitGens(3, label)
        self.gens_4 = MultiCommitGens(4, label)


class R1CSGens:
    __slots__ = ("gens_sc", "gens_pc")

    def __init__(self, label: bytes, _num_cons: int, num_vars: int):
        # Math::log_2 rounds non-powers of two UP (src/math.rs:13-21), so a
        # bound like interface.rs's TOTAL_NUM_VARS_BOUND = 10^7 must work.
        num_poly_vars = ceil_log2(next_pow2(num_vars))
        self.gens_pc = PolyCommitmentGens(num_poly_vars, label)
        self.gens_sc = R1CSSumcheckGens(label, self.gens_pc.gens.gens_1)


def _prefix_list(rw, num_witness_secs: int):
    """The 1/2/4/8-way witness-sec mixing weights (r1csproof.rs:602-632)."""
    npw = next_pow2(num_witness_secs)
    if npw == 1:
        return [_ONE]
    if npw == 2:
        return [_ONE - rw[0], rw[0]]
    if npw == 4:
        return [
            (_ONE - rw[0]) * (_ONE - rw[1]),
            (_ONE - rw[0]) * rw[1],
            rw[0] * (_ONE - rw[1]),
            rw[0] * rw[1],
        ]
    if npw == 8:
        out = []
        for b0 in (0, 1):
            for b1 in (0, 1):
                for b2 in (0, 1):
                    t = (rw[0] if b0 else _ONE - rw[0]) * \
                        (rw[1] if b1 else _ONE - rw[1]) * \
                        (rw[2] if b2 else _ONE - rw[2])
                    out.append(t)
        return out
    raise ValueError(f"unsupported num_witness_secs: {num_witness_secs}")


@cached_kernel()
def _abc_comb_dev(tabs, rabc, live_mask, yperm):
    """RLC of the phase-2 ABC eval tables + live-y mask + y bit-reversal.

    tabs: (P, 3, W, Y, 16); rabc: (3, 16); live_mask: (P, Y) bool;
    yperm: (Y,) int32. Returns (P, W, Y, 16) (r1csproof.rs:430-465).
    """
    comb = fq.mul(jnp.broadcast_to(rabc[None, :, None, None], tabs.shape),
                  tabs)
    comb = fq.add(fq.add(comb[:, 0], comb[:, 1]), comb[:, 2])
    comb = jnp.where(live_mask[:, None, :, None], comb, 0)
    return jnp.take(comb, yperm, axis=2)


@cached_kernel()
def _permute_qy_dev(z, qperm, yperm):
    """(P, Q, W, Y, 16) natural -> bit-reversed q and y axes."""
    return jnp.take(jnp.take(z, qperm, axis=1), yperm, axis=3)


def q_classes(num_proofs):
    """Partition instances (sorted desc by num_proofs) into contiguous
    q-size classes: [(p0, P_c, Q_c)]. Returns None when unsorted (caller
    falls back to the dense layout)."""
    for i in range(len(num_proofs) - 1):
        if num_proofs[i] < num_proofs[i + 1]:
            return None
    classes = []
    p0 = 0
    while p0 < len(num_proofs):
        q = num_proofs[p0]
        p1 = p0
        while p1 < len(num_proofs) and num_proofs[p1] == q:
            p1 += 1
        classes.append((p0, p1 - p0, q))
        p0 = p1
    return classes


def _z_place(z, mat, p: int, q_count: int, w: int, ni: int):
    """Place one witness block into z[p, :q_count, w, :ni] ON DEVICE.

    The previous host-numpy assembly downloaded every w_mat through the
    TPU relay, whose device->host path runs ~1.5 MB/s (measured) — 170 s
    of pure transfer on the DP bench. dynamic_update_slice keeps the
    whole assembly on device; uploads never happen (w_mat is already
    device-resident) and downloads never happen at all."""
    import jax as _jax

    mat = jnp.asarray(mat)
    if mat.shape[0] == 1 and q_count > 1:
        blk = jnp.broadcast_to(mat[0, :ni], (q_count, ni, 16))
    else:
        blk = mat[:q_count, :ni]
    return _jax.lax.dynamic_update_slice(
        z, blk[None, :, None], (p, 0, w, 0, 0))


def assemble_z_classed(classes, num_proofs, num_inputs, max_num_inputs,
                       witness_secs):
    """Per-class dense natural-order z tensors: list of
    (P_c, Q_c, W, Y_max, 16) device arrays — total storage
    O(sum_p Q_p * W * Y) instead of assemble_z's O(P * Qmax * W * Y)."""
    W = next_pow2(len(witness_secs))
    outs = []
    for (p0, P_c, Q_c) in classes:
        z = jnp.zeros((P_c, Q_c, W, max_num_inputs, 16), jnp.uint32)
        for w, ws in enumerate(witness_secs):
            for i in range(P_c):
                p = p0 + i
                p_w = 0 if len(ws.w_mat) == 1 else p
                ni = min(ws.num_inputs[p_w], num_inputs[p])
                z = _z_place(z, ws.w_mat[p_w], i, Q_c, w, ni)
        outs.append(z)
    return outs


def assemble_z(num_instances, num_proofs, max_num_proofs, num_inputs,
               max_num_inputs, witness_secs):
    """Build the dense natural-order z tensor (r1csproof.rs:277-294).

    Returns (P_pad, Q_max, W_pad, Y_max, 16) device Montgomery array.
    """
    W = next_pow2(len(witness_secs))
    P = next_pow2(num_instances)
    z = jnp.zeros((P, max_num_proofs, W, max_num_inputs, 16), jnp.uint32)
    for w, ws in enumerate(witness_secs):
        for p in range(num_instances):
            p_w = 0 if len(ws.w_mat) == 1 else p
            ni = min(ws.num_inputs[p_w], num_inputs[p])
            z = _z_place(z, ws.w_mat[p_w], p, num_proofs[p], w, ni)
    return z


class R1CSProof:
    __slots__ = ("sc_proof_phase1", "claims_phase2", "pok_claims_phase2",
                 "proof_eq_sc_phase1", "sc_proof_phase2",
                 "comm_vars_at_ry_list", "comm_vars_at_ry",
                 "proof_eval_vars_at_ry_list", "proof_eq_sc_phase2")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    @staticmethod
    def protocol_name() -> bytes:
        return b"R1CS proof"

    # ------------------------------------------------------------------
    @staticmethod
    def prove(num_instances: int, max_num_proofs: int, num_proofs,
              max_num_inputs: int, num_inputs, witness_secs, inst, gens,
              transcript, random_tape):
        timer_prove = Timer("R1CSProof::prove")
        transcript.append_protocol_name(R1CSProof.protocol_name())

        num_witness_secs = len(witness_secs)
        assert max_num_proofs == next_pow2(max_num_proofs)
        for p in num_proofs:
            assert p == next_pow2(p) and p <= max_num_proofs
        for i in num_inputs:
            assert i == next_pow2(i) and i <= max_num_inputs
        assert inst.get_num_instances() in (1, num_instances)
        assert 1 <= num_witness_secs <= 16

        num_cons = inst.get_num_cons()
        if inst.get_num_instances() == 1:
            block_num_cons = [inst.get_inst_num_cons()[0]] * num_instances
        else:
            block_num_cons = list(inst.get_inst_num_cons())

        # z assembly (natural order) --------------------------------------
        # Skewed execution counts use the q-size-classed layout
        # (O(sum Q_i) storage, VERDICT item 7 / custom_dense_mlpoly.rs
        # semantics); uniform counts keep the single dense tensor.
        import os as _os
        classes = q_classes(list(num_proofs)) if (
            len(set(num_proofs)) > 1
            and not _os.environ.get("SPARTAN_NO_QCLASS")) else None
        timer = Timer("prove_z_mat_gen")
        if classes is not None:
            z_class = [shard_big(zc, 3) for zc in assemble_z_classed(
                classes, num_proofs, num_inputs, max_num_inputs,
                witness_secs)]
            z_nat = None
        else:
            z_nat = shard_big(
                assemble_z(num_instances, num_proofs, max_num_proofs,
                           num_inputs, max_num_inputs, witness_secs), 3)
        timer.stop()

        nrp = ceil_log2(next_pow2(num_instances))
        nrq = ceil_log2(max_num_proofs)
        nrx = ceil_log2(num_cons)
        nrw = ceil_log2(num_witness_secs)
        nry = ceil_log2(max_num_inputs)

        tau_p = transcript.challenge_vector(b"challenge_tau_p", nrp)
        tau_q = transcript.challenge_vector(b"challenge_tau_q", nrq)
        tau_x = transcript.challenge_vector(b"challenge_tau_x", nrx)

        timer = Timer("prove_vec_mult")
        poly_tau_p = EqPolynomial(tau_p).evals_dev()
        poly_tau_q = EqPolynomial(tau_q).evals_dev()
        poly_tau_x = shard_big(EqPolynomial(tau_x).evals_dev(), 0)
        if classes is not None:
            class_tensors = []
            for (p0, P_c, Q_c), znc in zip(classes, z_class):
                Bc, Cc, Dc = inst.multiply_vec_block_classed(
                    p0, Q_c, num_cons, znc)
                class_tensors.append((p0, shard_big(Bc, 2),
                                      shard_big(Cc, 2), shard_big(Dc, 2)))
        else:
            poly_Az, poly_Bz, poly_Cz = inst.multiply_vec_block(
                num_instances, list(num_proofs), max_num_proofs,
                list(num_inputs), max_num_inputs, num_cons, block_num_cons,
                z_nat)
        timer.stop()

        # Sumcheck 1: eq(p,q,x) * (Az*Bz - Cz) == 0 ------------------------
        timer_sc1 = Timer("prove_sc_phase_one")
        if classes is not None:
            (sc_proof_phase1, rx_all, claims_phase1, blind_claim_postsc1) = \
                ZKSumcheckInstanceProof.prove_phase1_classed(
                    _ZERO, _ZERO, nrx + nrq + nrp, nrx, nrq, nrp,
                    poly_tau_p, poly_tau_q, poly_tau_x, class_tensors,
                    gens.gens_sc.gens_1, gens.gens_sc.gens_4,
                    transcript, random_tape)
        else:
            (sc_proof_phase1, rx_all, claims_phase1, blind_claim_postsc1) = \
                ZKSumcheckInstanceProof.prove_cubic_with_additive_term_disjoint_rounds(
                    _ZERO, _ZERO, nrx + nrq + nrp, nrx, nrq, nrp,
                    poly_tau_p, poly_tau_q, poly_tau_x,
                    shard_big(poly_Az.Zm[:, :, 0], 2),
                    shard_big(poly_Bz.Zm[:, :, 0], 2),
                    shard_big(poly_Cz.Zm[:, :, 0], 2),
                    gens.gens_sc.gens_1, gens.gens_sc.gens_4,
                    transcript, random_tape)
        timer_sc1.stop()

        tau_claim = claims_phase1[0]
        Az_claim, Bz_claim, Cz_claim = claims_phase1[1:4]
        Az_blind = random_tape.random_scalar(b"Az_blind")
        Bz_blind = random_tape.random_scalar(b"Bz_blind")
        Cz_blind = random_tape.random_scalar(b"Cz_blind")
        prod_Az_Bz_blind = random_tape.random_scalar(b"prod_Az_Bz_blind")

        pok_Cz_claim, comm_Cz_claim = KnowledgeProof.prove(
            gens.gens_sc.gens_1, transcript, random_tape, Cz_claim, Cz_blind)
        prod = Az_claim * Bz_claim
        (proof_prod, comm_Az_claim, comm_Bz_claim,
         comm_prod_Az_Bz_claims) = ProductProof.prove(
            gens.gens_sc.gens_1, transcript, random_tape, Az_claim, Az_blind,
            Bz_claim, Bz_blind, prod, prod_Az_Bz_blind)

        transcript.append_point(b"comm_Az_claim", comm_Az_claim)
        transcript.append_point(b"comm_Bz_claim", comm_Bz_claim)
        transcript.append_point(b"comm_Cz_claim", comm_Cz_claim)
        transcript.append_point(b"comm_prod_Az_Bz_claims",
                                comm_prod_Az_Bz_claims)

        taus_bound_rx = tau_claim
        blind_expected_claim_postsc1 = taus_bound_rx * (
            prod_Az_Bz_blind - Cz_blind)
        claim_post_phase1 = (Az_claim * Bz_claim - Cz_claim) * taus_bound_rx
        proof_eq_sc_phase1, _c1, _c2 = EqualityProof.prove(
            gens.gens_sc.gens_1, transcript, random_tape, claim_post_phase1,
            blind_expected_claim_postsc1, claim_post_phase1,
            blind_claim_postsc1)

        # split rx -> (rx, rq, rp) (r1csproof.rs:410-416)
        rx_rev = rx_all[:nrx]
        rq_rev = rx_all[nrx:nrx + nrq]
        rp_round1 = rx_all[nrx + nrq:]
        rx = list(reversed(rx_rev))
        rq = list(reversed(rq_rev))

        # PHASE 2 -----------------------------------------------------------
        timer_sc2 = Timer("prove_sc_phase_two")
        r_A = transcript.challenge_scalar(b"challenge_Az")
        r_B = transcript.challenge_scalar(b"challenge_Bz")
        r_C = transcript.challenge_scalar(b"challenge_Cz")
        claim_phase2 = r_A * Az_claim + r_B * Bz_claim + r_C * Cz_claim
        blind_claim_phase2 = r_A * Az_blind + r_B * Bz_blind + r_C * Cz_blind

        timer = Timer("prove_abc_gen")
        rx_tab = EqPolynomial(rx).evals_dev()
        tabs = inst.compute_eval_table_sparse_disjoint_rounds(
            num_instances, inst.get_inst_num_cons(), num_witness_secs,
            max_num_inputs, list(num_inputs), rx_tab)
        # RLC by (rA, rB, rC), mask to live y, bit-reverse the y axis
        P_inst = inst.get_num_instances()
        W = next_pow2(num_witness_secs)
        rabc_m = scalars_to_mont([r_A, r_B, r_C])
        yperm = rev_perm(max_num_inputs)
        tabs_stacked = jnp.stack(
            [jnp.stack(tabs[p]) for p in range(P_inst)])  # (P, 3, W, Y, 16)
        live_mask = np.zeros((P_inst, max_num_inputs), bool)
        for p in range(P_inst):
            live_mask[p, :num_inputs[p]] = True
        ABC_dense = shard_big(
            _abc_comb_dev(tabs_stacked, rabc_m, jnp.asarray(live_mask),
                          jnp.asarray(yperm)), 2)  # (P_inst, W, Y, 16)
        if P_inst < next_pow2(num_instances) and P_inst != 1:
            padP = next_pow2(num_instances) - P_inst
            ABC_dense = jnp.concatenate([
                ABC_dense,
                jnp.zeros((padP,) + ABC_dense.shape[1:], jnp.uint32)])
        timer.stop()

        timer = Timer("prove_z_gen")
        if classes is not None:
            # per-class q binding: fold the class's own log2(Q_c)
            # challenges, scale by prod(1 - rq_rev[i]) for the skipped
            # rounds (the zero-padded dense fold's degenerate form; the
            # verifier's mirror is the (1 - rq) product at
            # r1csproof.rs:836-839), then concatenate along p.
            zparts = []
            for (p0, P_c, Q_c), znc in zip(classes, z_class):
                qperm_c = rev_perm(Q_c)
                Zc = _permute_qy_dev(znc, jnp.asarray(qperm_c),
                                     jnp.asarray(yperm))
                lq = ceil_log2(Q_c)
                if lq:
                    Zc = fold_chain(Zc, scalars_to_mont(rq_rev[:lq]),
                                    axis=1)
                Zc = Zc[:, :1]
                u_c = _ONE
                for i in range(lq, nrq):
                    u_c = u_c * (_ONE - rq_rev[i])
                if u_c != _ONE:
                    um = scalars_to_mont([u_c])[0]
                    Zc = fq.mul(jnp.broadcast_to(um, Zc.shape), Zc)
                zparts.append(Zc)
            Zcat = jnp.concatenate(zparts, axis=0)
            P_pad = next_pow2(num_instances)
            if Zcat.shape[0] < P_pad:
                Zcat = jnp.concatenate([Zcat, jnp.zeros(
                    (P_pad - Zcat.shape[0],) + Zcat.shape[1:],
                    jnp.uint32)], axis=0)
            Z_bound = Zcat[:, 0]
        else:
            qperm = rev_perm(max_num_proofs)
            Z_dense = _permute_qy_dev(z_nat, jnp.asarray(qperm),
                                      jnp.asarray(yperm))
            Z_poly = DensePolynomialPqx(Z_dense, list(num_proofs),
                                        list(num_inputs))
        timer.stop()
        timer = Timer("prove_z_bind")
        if classes is None:
            Z_poly.bound_poly_vars_rq(rq_rev)
            Z_bound = Z_poly.Zm[:, 0]
        timer.stop()

        eq_p_rp = EqPolynomial(list(rp_round1)).evals_dev()
        single_inst = inst.get_num_instances() == 1

        (sc_proof_phase2, ry_all, claims_phase2_v, blind_claim_postsc2) = \
            ZKSumcheckInstanceProof.prove_cubic_disjoint_rounds(
                claim_phase2, blind_claim_phase2, nry + nrw + nrp,
                nry, nrw, nrp, single_inst, eq_p_rp, ABC_dense,
                shard_big(Z_bound, 2),
                gens.gens_sc.gens_1, gens.gens_sc.gens_4,
                transcript, random_tape)
        timer_sc2.stop()

        # split ry -> (ry, rw, rp) (r1csproof.rs:504-510)
        ry_rev = ry_all[:nry]
        rw = ry_all[nry:nry + nrw]
        rp = ry_all[nry + nrw:]
        ry = list(reversed(ry_rev))

        # POLY COMMIT: per-witness-sec openings (r1csproof.rs:515-645) ------
        timer_polyeval = Timer("polyeval")
        ry_factors = [_ONE] * (nry + 1)
        for i in range(nry):
            ry_factors[i + 1] = ry_factors[i] * (_ONE - ry[i])

        poly_list, num_proofs_list, num_inputs_list, Zr_list = [], [], [], []
        eval_vars_at_ry_list = [[] for _ in range(num_witness_secs)]
        comm_vars_at_ry_list = [[] for _ in range(num_witness_secs)]
        for i, w in enumerate(witness_secs):
            for p in range(len(w.w_mat)):
                poly_list.append(w.poly_w[p])
                n_pf = int(w.w_mat[p].shape[0])
                num_proofs_list.append(n_pf)
                num_inputs_list.append(w.num_inputs[p])
                ny_w = ceil_log2(w.num_inputs[p])
                if w.num_inputs[p] >= max_num_inputs:
                    ry_short = [_ZERO] * (ny_w - nry) + ry
                else:
                    ry_short = ry[nry - ny_w:]
                rq_short = rq[len(rq) - ceil_log2(n_pf):] if \
                    ceil_log2(n_pf) else []
                r_pt = rq_short + ry_short
                assert len(r_pt) == w.poly_w[p].num_vars, (
                    f"witness sec {i} inst {p}: committed poly has "
                    f"{w.poly_w[p].num_vars} vars but n_pf={n_pf}, "
                    f"num_inputs={w.num_inputs[p]} imply {len(r_pt)} "
                    f"(declared width != committed row stride?)")
                ev = w.poly_w[p].evaluate(r_pt)
                Zr_list.append(ev)
                if w.num_inputs[p] >= max_num_inputs:
                    eval_vars_at_ry_list[i].append(ev)
                else:
                    eval_vars_at_ry_list[i].append(
                        ev * ry_factors[nry - ny_w])
                comm_vars_at_ry_list[i].append(
                    commit_scalar(ev, _ZERO,
                                  gens.gens_pc.gens.gens_1).compress())

        proof_eval_vars_at_ry_list = \
            PolyEvalProof.prove_batched_instances_disjoint_rounds(
                poly_list, num_proofs_list, num_inputs_list, None, rq, ry,
                Zr_list, None, gens.gens_pc, transcript, random_tape)

        # Bind the witness list to rp
        eval_vars_comb_list = []
        prefix_list = _prefix_list(rw, num_witness_secs)
        for p in range(num_instances):
            def wit_sec_p(i):
                return 0 if len(witness_secs[i].w_mat) == 1 else p

            comb = _ZERO
            for i in range(num_witness_secs):
                comb = comb + prefix_list[i] * \
                    eval_vars_at_ry_list[i][wit_sec_p(i)]
            for q in range(nrq - ceil_log2(num_proofs[p])):
                comb = comb * (_ONE - rq[q])
            eval_vars_comb_list.append(comb)
        timer_polyeval.stop()

        poly_vars = DensePolynomial.from_scalars(eval_vars_comb_list)
        eval_vars_at_ry = poly_vars.evaluate(rp)
        comm_vars_at_ry = commit_scalar(
            eval_vars_at_ry, _ZERO, gens.gens_pc.gens.gens_1).compress()

        claim_post_phase2 = (claims_phase2_v[0] * claims_phase2_v[1] *
                             claims_phase2_v[2])
        proof_eq_sc_phase2, _c1, _c2 = EqualityProof.prove(
            gens.gens_pc.gens.gens_1, transcript, random_tape,
            claim_post_phase2, _ZERO, claim_post_phase2, blind_claim_postsc2)
        timer_prove.stop()

        proof = R1CSProof(
            sc_proof_phase1=sc_proof_phase1,
            claims_phase2=(comm_Az_claim, comm_Bz_claim, comm_Cz_claim,
                           comm_prod_Az_Bz_claims),
            pok_claims_phase2=(pok_Cz_claim, proof_prod),
            proof_eq_sc_phase1=proof_eq_sc_phase1,
            sc_proof_phase2=sc_proof_phase2,
            comm_vars_at_ry_list=comm_vars_at_ry_list,
            comm_vars_at_ry=comm_vars_at_ry,
            proof_eval_vars_at_ry_list=proof_eval_vars_at_ry_list,
            proof_eq_sc_phase2=proof_eq_sc_phase2,
        )
        return proof, [list(rp), list(rq_rev), rx, list(rw) + ry]

    # ------------------------------------------------------------------
    def verify(self, num_instances: int, max_num_proofs: int, num_proofs,
               max_num_inputs: int, witness_secs, num_cons: int, gens,
               evals, transcript):
        """witness_secs: list of VerifierWitnessSecInfo; evals: (eA,eB,eC)
        bound to rp (r1csproof.rs:687-946)."""
        transcript.append_protocol_name(R1CSProof.protocol_name())
        num_witness_secs = len(witness_secs)
        assert 1 <= num_witness_secs <= 16

        nrp = ceil_log2(next_pow2(num_instances))
        nrq = ceil_log2(max_num_proofs)
        nrx = ceil_log2(num_cons)
        nrw = ceil_log2(num_witness_secs)
        nry = ceil_log2(max_num_inputs)

        tau_p = transcript.challenge_vector(b"challenge_tau_p", nrp)
        tau_q = transcript.challenge_vector(b"challenge_tau_q", nrq)
        tau_x = transcript.challenge_vector(b"challenge_tau_x", nrx)

        claim_phase1 = commit_scalar(
            _ZERO, _ZERO, gens.gens_sc.gens_1).compress()
        t_sc1 = Timer("verify_sc1")
        comm_claim_post_phase1, rx_all = self.sc_proof_phase1.verify(
            claim_phase1, nrx + nrq + nrp, 3, gens.gens_sc.gens_1,
            gens.gens_sc.gens_4, transcript)
        t_sc1.stop()

        (comm_Az_claim, comm_Bz_claim, comm_Cz_claim,
         comm_prod_Az_Bz_claims) = self.claims_phase2
        pok_Cz_claim, proof_prod = self.pok_claims_phase2
        pok_Cz_claim.verify(gens.gens_sc.gens_1, transcript, comm_Cz_claim)
        proof_prod.verify(gens.gens_sc.gens_1, transcript, comm_Az_claim,
                          comm_Bz_claim, comm_prod_Az_Bz_claims)

        transcript.append_point(b"comm_Az_claim", comm_Az_claim)
        transcript.append_point(b"comm_Bz_claim", comm_Bz_claim)
        transcript.append_point(b"comm_Cz_claim", comm_Cz_claim)
        transcript.append_point(b"comm_prod_Az_Bz_claims",
                                comm_prod_Az_Bz_claims)

        rx_rev = rx_all[:nrx]
        rq_rev = rx_all[nrx:nrx + nrq]
        rp_round1 = rx_all[nrx + nrq:]
        rx = list(reversed(rx_rev))
        rq = list(reversed(rq_rev))

        def eq_prod(rs, taus):
            acc = _ONE
            for a, b in zip(rs, taus):
                acc = acc * (a * b + (_ONE - a) * (_ONE - b))
            return acc

        taus_bound_rx = (eq_prod(rp_round1, tau_p) * eq_prod(rq_rev, tau_q) *
                         eq_prod(rx_rev, tau_x))

        expected_claim_post_phase1 = (
            (RistrettoPoint.decompress(comm_prod_Az_Bz_claims) -
             RistrettoPoint.decompress(comm_Cz_claim)) * taus_bound_rx
        ).compress()
        self.proof_eq_sc_phase1.verify(
            gens.gens_sc.gens_1, transcript, expected_claim_post_phase1,
            comm_claim_post_phase1)

        r_A = transcript.challenge_scalar(b"challenge_Az")
        r_B = transcript.challenge_scalar(b"challenge_Bz")
        r_C = transcript.challenge_scalar(b"challenge_Cz")
        comm_claim_phase2 = multiscalar_mul(
            [r_A, r_B, r_C],
            [RistrettoPoint.decompress(c) for c in
             (comm_Az_claim, comm_Bz_claim, comm_Cz_claim)]).compress()

        t_sc2 = Timer("verify_sc2")
        comm_claim_post_phase2, ry_all = self.sc_proof_phase2.verify(
            comm_claim_phase2, nry + nrw + nrp, 3, gens.gens_sc.gens_1,
            gens.gens_sc.gens_4, transcript)
        t_sc2.stop()

        ry_rev = ry_all[:nry]
        rw = ry_all[nry:nry + nrw]
        rp = ry_all[nry + nrw:]
        ry = list(reversed(ry_rev))

        p_rp_poly_bound_ry = eq_prod(rp, rp_round1)

        ry_factors = [_ONE] * (nry + 1)
        for i in range(nry):
            ry_factors[i + 1] = ry_factors[i] * (_ONE - ry[i])

        timer_commit_opening = Timer("verify_sc_commitment_opening")
        comm_list, num_proofs_list, num_inputs_list, comm_Zr_list = \
            [], [], [], []
        for i, w in enumerate(witness_secs):
            for p in range(len(w.num_proofs)):
                comm_list.append(w.comm_w[p])
                num_proofs_list.append(w.num_proofs[p])
                num_inputs_list.append(w.num_inputs[p])
                comm_Zr_list.append(RistrettoPoint.decompress(
                    self.comm_vars_at_ry_list[i][p]))
        PolyEvalProof.verify_batched_instances_disjoint_rounds(
            self.proof_eval_vars_at_ry_list, num_proofs_list,
            num_inputs_list, gens.gens_pc, transcript, rq, ry, comm_Zr_list,
            comm_list)

        expected_comm_vars_list = []
        prefix_list = _prefix_list(rw, num_witness_secs)
        for p in range(num_instances):
            def wit_sec_p(i):
                return 0 if len(witness_secs[i].num_proofs) == 1 else p

            def c_of(i):
                pw = wit_sec_p(i)
                pt = RistrettoPoint.decompress(
                    self.comm_vars_at_ry_list[i][pw])
                if witness_secs[i].num_inputs[pw] >= max_num_inputs:
                    return pt
                ny_w = ceil_log2(witness_secs[i].num_inputs[pw])
                return pt * ry_factors[nry - ny_w]

            comb = c_of(0) * prefix_list[0]
            for i in range(1, num_witness_secs):
                comb = comb + c_of(i) * prefix_list[i]
            scale = _ONE
            for q in range(nrq - ceil_log2(num_proofs[p])):
                scale = scale * (_ONE - rq[q])
            expected_comm_vars_list.append(comb * scale)

        EQ_p = EqPolynomial(list(rp)).evals()[:num_instances]
        expected_comm_vars_at_ry = multiscalar_mul(
            EQ_p, expected_comm_vars_list).compress()
        if expected_comm_vars_at_ry != self.comm_vars_at_ry:
            raise ProofVerifyError("witness rp binding mismatch")
        timer_commit_opening.stop()

        comm_eval_Z_at_ry = RistrettoPoint.decompress(self.comm_vars_at_ry)
        eval_A_r, eval_B_r, eval_C_r = evals
        expected_claim_post_phase2 = (
            comm_eval_Z_at_ry *
            ((r_A * eval_A_r + r_B * eval_B_r + r_C * eval_C_r) *
             p_rp_poly_bound_ry)).compress()
        self.proof_eq_sc_phase2.verify(
            gens.gens_sc.gens_1, transcript, expected_claim_post_phase2,
            comm_claim_post_phase2)

        return [list(rp), list(rq_rev), rx, list(rw) + ry]
