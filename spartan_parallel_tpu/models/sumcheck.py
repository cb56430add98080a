"""Sumcheck provers/verifiers (reference: src/sumcheck.rs).

`ZKSumcheckInstanceProof` (sumcheck.rs:75) carries one committed round
polynomial + claim commitment + dot-product proof per round; the verifier
(sumcheck.rs:94-186) never sees plaintext round polys. The two fork
provers are the disjoint-rounds variants driving both R1CS sumchecks
(sumcheck.rs:788, :1067).

TPU split: round-poly evaluations and table binds run as fused device
kernels over dense zero-padded Montgomery tensors (ops/sumcheck.py); the
host holds the merlin transcript, the degree-3 UniPoly, and the tiny
Pedersen/sigma work (5-point MSMs). One device->host sync of 3 field
elements per round — the irreducible Fiat-Shamir serialization point
(SURVEY.md §2.3).

`SumcheckInstanceProof` (non-ZK, sumcheck.rs:28) is used by the SPARK
product layer; its provers live here too.
"""

from __future__ import annotations

import os as _os

import jax.numpy as jnp
import numpy as np

from ..core.edwards import RistrettoPoint, multiscalar_mul
from ..core.field import Scalar
from ..ops import fq, sumcheck as sck
from ..ops.fq import encode as fq_encode
from ..ops.sumcheck import MODE_P, MODE_Q, MODE_W, MODE_X
from ..utils.errors import ProofVerifyError
from .commitments import MultiCommitGens, commit, commit_scalar
from .dense_mlpoly import mont_to_scalar, mont_to_scalars, scalars_to_mont
from .sigma import DotProductProof
from .unipoly import CompressedUniPoly, UniPoly

_MIN_SCAN_ROUNDS = 5


def _device_rounds_on() -> bool:
    """Device-resident sumcheck rounds (ops/zk_round.py): on by default
    off-CPU (the host loop pays a device round trip per round through the
    remote-TPU relay); force with SPARTAN_DEVICE_ROUNDS=1/0."""
    flag = _os.environ.get("SPARTAN_DEVICE_ROUNDS")
    if flag is not None:
        return flag != "0"
    import jax

    return jax.default_backend() != "cpu"


def _comb_tables(gens: MultiCommitGens):
    """Device comb tables for gens.G ++ [h], cached on the gens object."""
    tabs = getattr(gens, "_comb", None)
    if tabs is None:
        from ..ops.ristretto_dev import make_comb_tables

        tabs = jnp.asarray(make_comb_tables(list(gens.G) + [gens.h]))
        try:
            gens._comb = tabs
        except AttributeError:
            pass
    return tabs


def _scan_prep(num_scan: int, blinds_poly, blinds_evals, blind_claim,
               gens_n, random_tape):
    """Host-side inputs for a device round scan: per-round tape draws in
    EXACTLY the order the host loop would make them (so proofs are
    byte-identical under a fixed tape), plus precomputed deltas (they
    depend only on tape randomness, nizk/mod.rs:318-321)."""
    d_vecs, r_deltas, r_betas, deltas = [], [], [], []
    for _ in range(num_scan):
        dv = random_tape.random_vector(b"d_vec", 4)
        rd = random_tape.random_scalar(b"r_delta")
        rb = random_tape.random_scalar(b"r_beta")
        d_vecs.append(dv)
        r_deltas.append(rd)
        r_betas.append(rb)
        deltas.append(commit(dv, rd, gens_n).compress())
    blind_sc = [blind_claim] + list(blinds_evals[:num_scan - 1])
    xs = dict(
        bp=fq_encode(blinds_poly[:num_scan]),
        be=fq_encode(blinds_evals[:num_scan]),
        bsc=fq_encode(blind_sc),
        dv=fq_encode([x for v in d_vecs for x in v]).reshape(
            num_scan, 4, 16),
        rd=fq_encode(r_deltas),
        rb=fq_encode(r_betas),
        deltas=np.stack([np.frombuffer(d, np.uint8).astype(np.uint32)
                         for d in deltas]),
    )
    return xs, d_vecs


def _scan_finish(transcript, out_tail, deltas_bytes, num_scan):
    """Decode the stacked scan outputs into per-round proof objects and
    resync the host transcript to the device STROBE state."""
    from ..ops import transcript_dev as tdev

    (st, pos, pos_begin, claim_m, comm_claim_b,
     comm_poly_b, comm_eval_b, beta_b, z_m, z_delta_m, z_beta_m, r_m) = \
        out_tail
    st_b, pos_i, pb_i = tdev.to_host_state((st, pos, pos_begin))
    transcript.strobe.state = bytearray(st_b)
    transcript.strobe.pos = pos_i
    transcript.strobe.pos_begin = pb_i

    def rows_to_bytes(arr):
        return [bytes(np.asarray(arr[j], np.uint8).tobytes())
                for j in range(num_scan)]

    comm_polys = rows_to_bytes(np.asarray(comm_poly_b))
    comm_evals = rows_to_bytes(np.asarray(comm_eval_b))
    betas = rows_to_bytes(np.asarray(beta_b))
    z_all = mont_to_scalars(np.asarray(z_m).reshape(-1, 16))
    z_deltas = mont_to_scalars(np.asarray(z_delta_m))
    z_betas = mont_to_scalars(np.asarray(z_beta_m))
    rs = mont_to_scalars(np.asarray(r_m))
    proofs = [
        DotProductProof(deltas_bytes[j], betas[j],
                        z_all[4 * j: 4 * j + 4], z_deltas[j], z_betas[j])
        for j in range(num_scan)
    ]
    claim = mont_to_scalar(np.asarray(claim_m))
    comm_claim = bytes(np.asarray(comm_claim_b, np.uint8).tobytes())
    return comm_polys, comm_evals, proofs, rs, claim, comm_claim

_ZERO = Scalar.zero()
_ONE = Scalar.one()


class SumcheckInstanceProof:
    """Non-ZK sumcheck: plaintext compressed round polys (sumcheck.rs:28)."""

    __slots__ = ("compressed_polys",)

    def __init__(self, compressed_polys):
        self.compressed_polys = compressed_polys

    def verify(self, claim: Scalar, num_rounds: int, degree_bound: int,
               transcript):
        e = claim
        r = []
        assert len(self.compressed_polys) == num_rounds
        for cp in self.compressed_polys:
            poly = cp.decompress(e)
            if poly.degree() != degree_bound:
                raise ProofVerifyError("sumcheck degree bound")
            if not (poly.eval_at_zero() + poly.eval_at_one() == e):
                raise ProofVerifyError("sumcheck round claim")
            poly.append_to_transcript(b"poly", transcript)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_i)
            e = poly.evaluate(r_i)
        return e, r


class ZKSumcheckInstanceProof:
    __slots__ = ("comm_polys", "comm_evals", "proofs")

    def __init__(self, comm_polys, comm_evals, proofs):
        self.comm_polys = comm_polys
        self.comm_evals = comm_evals
        self.proofs = proofs

    # --- verifier (sumcheck.rs:94-186) ------------------------------------
    def verify(self, comm_claim: bytes, num_rounds: int, degree_bound: int,
               gens_1: MultiCommitGens, gens_n: MultiCommitGens, transcript):
        assert gens_n.n == degree_bound + 1
        assert len(self.comm_polys) == num_rounds
        assert len(self.comm_evals) == num_rounds

        r = []
        for i in range(num_rounds):
            comm_poly = self.comm_polys[i]
            transcript.append_point(b"comm_poly", comm_poly)
            r_i = transcript.challenge_scalar(b"challenge_nextround")

            comm_claim_per_round = comm_claim if i == 0 else \
                self.comm_evals[i - 1]
            comm_eval = self.comm_evals[i]
            transcript.append_point(b"comm_claim_per_round",
                                    comm_claim_per_round)
            transcript.append_point(b"comm_eval", comm_eval)
            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)
            comm_target = multiscalar_mul(w, [
                RistrettoPoint.decompress(comm_claim_per_round),
                RistrettoPoint.decompress(comm_eval),
            ]).compress()

            a_sc = [_ONE] * (degree_bound + 1)
            a_sc[0] = a_sc[0] + _ONE
            a_eval = [_ONE]
            for _ in range(degree_bound):
                a_eval.append(a_eval[-1] * r_i)
            a = [w[0] * x + w[1] * y for x, y in zip(a_sc, a_eval)]

            self.proofs[i].verify(gens_1, gens_n, transcript, a,
                                  self.comm_polys[i], comm_target)
            r.append(r_i)
        return self.comm_evals[-1], r

    # --- shared per-round ZK tail (sumcheck.rs:973-1048, 1282-1361) -------
    @staticmethod
    def _zk_round_tail(poly: UniPoly, r_j: Scalar, j: int,
                       claim_per_round: Scalar, comm_claim_per_round: bytes,
                       blind_claim: Scalar, blinds_poly, blinds_evals,
                       gens_1, gens_n, transcript, random_tape):
        eval_ = poly.evaluate(r_j)
        comm_eval = commit_scalar(eval_, blinds_evals[j], gens_1).compress()
        transcript.append_point(b"comm_claim_per_round", comm_claim_per_round)
        transcript.append_point(b"comm_eval", comm_eval)
        w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)
        target = w[0] * claim_per_round + w[1] * eval_
        blind_sc = blind_claim if j == 0 else blinds_evals[j - 1]
        blind = w[0] * blind_sc + w[1] * blinds_evals[j]

        deg = poly.degree()
        a_sc = [_ONE] * (deg + 1)
        a_sc[0] = a_sc[0] + _ONE
        a_eval = [_ONE]
        for _ in range(deg):
            a_eval.append(a_eval[-1] * r_j)
        a = [w[0] * x + w[1] * y for x, y in zip(a_sc, a_eval)]

        proof, _cx, _cy = DotProductProof.prove(
            gens_1, gens_n, transcript, random_tape, poly.as_vec(),
            blinds_poly[j], a, target, blind)
        return proof, eval_, comm_eval

    # --- phase-1 prover (sumcheck.rs:1067-1381) ----------------------------
    @staticmethod
    def prove_cubic_with_additive_term_disjoint_rounds(
            claim: Scalar, blind_claim: Scalar, num_rounds: int,
            num_rounds_x_max: int, num_rounds_q_max: int, num_rounds_p: int,
            tp, tq, tx, B, C, D, gens_1: MultiCommitGens,
            gens_n: MultiCommitGens, transcript, random_tape):
        """tp/tq/tx: (P,16)/(Q,16)/(X,16) eq tables; B,C,D: (P,Q,X,16)
        Az/Bz/Cz tensors (bit-reversed q,x). comb = A*(B*C - D)."""
        assert num_rounds == num_rounds_x_max + num_rounds_q_max + num_rounds_p
        blinds_poly = random_tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = random_tape.random_vector(b"blinds_evals", num_rounds)

        claim_per_round = claim
        comm_claim_per_round = commit_scalar(
            claim_per_round, blind_claim, gens_1).compress()

        # Live lengths along each fold axis (buffers stay full-size; the
        # fixed-shape kernels in ops/sumcheck.py take n_half = live // 2).
        import numpy as _np
        live = {MODE_P: int(tp.shape[0]), MODE_Q: int(tq.shape[0]),
                MODE_X: int(tx.shape[0])}

        r, comm_polys, comm_evals, proofs = [], [], [], []

        # Device-resident round segments: each same-mode run of rounds
        # (round polys, transcript, DotProductProofs) executes as ONE
        # lax.scan on device (ops/zk_round.py) — no per-round host round
        # trips. Stops at the first segment too short to be worth a
        # compile; the host loop below picks up from there.
        num_scan = 0
        if _device_rounds_on():
            from ..ops import transcript_dev as tdev
            from ..ops import zk_round as zkr

            segments = [(MODE_X, num_rounds_x_max),
                        (MODE_Q, num_rounds_q_max), (MODE_P, num_rounds_p)]
            for mode, cnt in segments:
                if cnt == 0:
                    continue
                if cnt < _MIN_SCAN_ROUNDS:
                    break
                # static compaction of fully-bound axes (cf. _p1_compact)
                if mode != MODE_X and tx.shape[0] > 1:
                    tx, B, C, D = tx[:1], B[:, :, :1], C[:, :, :1], \
                        D[:, :, :1]
                if mode == MODE_P and tq.shape[0] > 1:
                    tq, B, C, D = tq[:1], B[:, :1], C[:, :1], D[:, :1]
                xs, _ = _scan_prep(
                    cnt, blinds_poly[num_scan:], blinds_evals[num_scan:],
                    blind_claim if num_scan == 0 else
                    blinds_evals[num_scan - 1], gens_n, random_tape)
                s0 = tdev.from_host(transcript)
                # sublane layout (limbs on axis -2): one cheap transpose
                # per segment boundary; the 21x-repeated round sweeps run
                # on unpadded (P, Q, 16, X) tiles (ops/sumcheck_sl.py)
                from ..ops import fqf

                out = zkr.p1_zk_scan_chunked(
                    fqf.to_sublane(tp), fqf.to_sublane(tq),
                    fqf.to_sublane(tx), fqf.to_sublane(B),
                    fqf.to_sublane(C), fqf.to_sublane(D),
                    live[mode],
                    s0[0], s0[1], s0[2],
                    jnp.asarray(fq_encode([claim_per_round])[0]),
                    _np.frombuffer(comm_claim_per_round, _np.uint8)
                    .astype(_np.uint32),
                    _comb_tables(gens_n), _comb_tables(gens_1),
                    xs, mode=mode, sublane=True)
                tp, tq, tx, B, C, D = (fqf.from_sublane(t)
                                       for t in out[3:9])
                (cps, ces, prs, rss, claim_per_round,
                 comm_claim_per_round) = _scan_finish(
                    transcript, out[0:3] + out[9:11] + out[11:18],
                    [bytes(_np.asarray(d, _np.uint8).tobytes())
                     for d in xs["deltas"]], cnt)
                comm_polys += cps
                comm_evals += ces
                proofs += prs
                r += rss
                live[mode] >>= cnt
                num_scan += cnt

        # Fused round pipeline for the remaining rounds: each device call
        # binds the PREVIOUS round's challenge and evaluates THIS round's
        # polys — one dispatch + one sync per round (the host<->device
        # round trip dominates the sumcheck at small/medium sizes).
        pending = None  # (rm, n_half, mode) of the previous round
        for j in range(num_scan, num_rounds):
            if j < num_rounds_x_max:
                mode = MODE_X
            elif j < num_rounds_x_max + num_rounds_q_max:
                mode = MODE_Q
            else:
                mode = MODE_P

            n_half = _np.uint32(live[mode] // 2)
            if pending is None:
                evd = sck.p1_evals(tp, tq, tx, B, C, D, n_half, mode=mode)
            else:
                rm_p, nh_p, mode_p = pending
                evd, (tp, tq, tx, B, C, D) = sck.p1_step(
                    tp, tq, tx, B, C, D, rm_p, nh_p, n_half,
                    mode_prev=mode_p, mode=mode)
            e0, e2, e3 = mont_to_scalars(evd)
            poly = UniPoly.from_evals([e0, claim_per_round - e0, e2, e3])
            comm_poly = poly.commit(gens_n, blinds_poly[j]).compress()
            transcript.append_point(b"comm_poly", comm_poly)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            # numpy challenge rides the next dispatch's arg upload
            # instead of paying a separate device_put round trip
            # through the remote-TPU relay (~25 ms/transfer)
            rm = fq_encode([r_j])[0]
            pending = (rm, n_half, mode)
            live[mode] //= 2

            proof, eval_, comm_eval = ZKSumcheckInstanceProof._zk_round_tail(
                poly, r_j, j, claim_per_round, comm_claim_per_round,
                blind_claim, blinds_poly, blinds_evals, gens_1, gens_n,
                transcript, random_tape)
            proofs.append(proof)
            claim_per_round = eval_
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

        if pending is not None:  # final bind for the last round
            rm_p, nh_p, mode_p = pending
            tp, tq, tx, B, C, D = sck.p1_bind(tp, tq, tx, B, C, D, rm_p,
                                              nh_p, mode=mode_p)
        tpv, tqv, txv = (mont_to_scalar(t[0]) for t in (tp, tq, tx))
        claims = [
            tpv * tqv * txv,
            mont_to_scalar(B[0, 0, 0]),
            mont_to_scalar(C[0, 0, 0]),
            mont_to_scalar(D[0, 0, 0]),
        ]
        return (ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs), r,
                claims, blinds_evals[num_rounds - 1])

    # --- phase-1 prover, q-size-classed (O(sum Q_i) storage) --------------
    @staticmethod
    def prove_phase1_classed(
            claim: Scalar, blind_claim: Scalar, num_rounds: int,
            num_rounds_x_max: int, num_rounds_q_max: int, num_rounds_p: int,
            tp, tq, tx, classes, gens_1: MultiCommitGens,
            gens_n: MultiCommitGens, transcript, random_tape):
        """Transcript-identical to the dense phase-1 prover, but Az/Bz/Cz
        live as per-Q-size-class tensors so prover memory/compute is
        O(sum_p Q_p * X) like the reference's ragged Pqx storage
        (custom_dense_mlpoly.rs:16-32), not O(P * Qmax * X).

        classes: list of (p0, B_c, C_c, D_c) with B_c (P_c, Q_c, X, 16),
        q bit-reversed WITHIN the class, instances sorted desc by Q_c so
        classes partition the p axis contiguously starting at p0."""
        import numpy as _np

        assert num_rounds == num_rounds_x_max + num_rounds_q_max + \
            num_rounds_p
        blinds_poly = random_tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = random_tape.random_vector(b"blinds_evals", num_rounds)

        claim_per_round = claim
        comm_claim_per_round = commit_scalar(
            claim_per_round, blind_claim, gens_1).compress()

        Qmax = int(tq.shape[0])
        live_x = int(tx.shape[0])
        live_q = Qmax
        live_p = int(tp.shape[0])

        # per-class mutable state
        cstate = [{"p0": p0, "S": Qmax // int(B.shape[1]),
                   "logq": int(B.shape[1]).bit_length() - 1,
                   "T": (B, C, D), "pending": None}
                  for (p0, B, C, D) in classes]
        merged = None          # (tq1, tx1, Bm, Cm, Dm) for p rounds
        pending_p = None

        r, comm_polys, comm_evals, proofs = [], [], [], []

        # Device-resident x-segment over all classes (ops/zk_round.py).
        # Gated off for CPU + scan-carries: XLA:CPU's compiler aborts on
        # the multi-class scan body with nested lax.scan carry chains
        # (same failure mode noted in ops/limbs.py); the Kogge-Stone
        # carry form compiles fine (SPARTAN_CARRY_IMPL=ks).
        from ..ops.limbs import _carry_impl

        num_scan = 0
        if (_device_rounds_on() and num_rounds_x_max >= _MIN_SCAN_ROUNDS
                and _carry_impl() == "ks"):
            from ..ops import transcript_dev as tdev
            from ..ops import zk_round as zkr

            num_scan = num_rounds_x_max
            xs, _ = _scan_prep(num_scan, blinds_poly, blinds_evals,
                               blind_claim, gens_n, random_tape)
            s0 = tdev.from_host(transcript)
            meta = tuple((st["p0"], st["S"]) for st in cstate)
            flat = tuple(t for st in cstate for t in st["T"])
            out = zkr.p1c_zk_scan_chunked(
                tp, tq, tx, live_x,
                s0[0], s0[1], s0[2],
                jnp.asarray(fq_encode([claim_per_round])[0]),
                _np.frombuffer(comm_claim_per_round, _np.uint8)
                .astype(_np.uint32),
                _comb_tables(gens_n), _comb_tables(gens_1),
                xs, flat, classes_meta=meta)
            tx = out[3]
            nc = len(cstate)
            for i, st in enumerate(cstate):
                st["T"] = tuple(out[6 + 3 * i: 9 + 3 * i])
                st["pending"] = None
            (comm_polys, comm_evals, proofs, r, claim_per_round,
             comm_claim_per_round) = _scan_finish(
                transcript, out[0:3] + out[4:6] + out[6 + 3 * nc:],
                [bytes(_np.asarray(d, _np.uint8).tobytes())
                 for d in xs["deltas"]], num_scan)
            live_x >>= num_scan

        # Device-resident q-segment: the q rounds split into sub-segments
        # with a STATIC per-class active set (class c is active while
        # qround < log2(Q_c)); each sub-segment runs as one scan
        # (ops/zk_round.pqc_zk_scan). This was the host-loop remainder
        # behind sc1's dispatch-latency wall (VERDICT r3 item 3).
        if (num_scan == num_rounds_x_max and num_rounds_x_max > 0
                and num_rounds_q_max >= _MIN_SCAN_ROUNDS
                and _device_rounds_on() and _carry_impl() == "ks"):
            from ..ops import transcript_dev as tdev
            from ..ops import zk_round as zkr

            bounds = sorted({st["logq"] for st in cstate
                             if 0 < st["logq"] < num_rounds_q_max})
            seg_starts = [0] + bounds
            seg_ends = bounds + [num_rounds_q_max]
            for s_lo, s_hi in zip(seg_starts, seg_ends):
                cnt = s_hi - s_lo
                # physical compaction: bound q prefixes and newly
                # inactive classes shrink to their live shapes
                for st in cstate:
                    B, C, D = st["T"]
                    act = s_lo < st["logq"]
                    liveq = ((1 << st["logq"]) >> s_lo) if act else 1
                    if B.shape[1] > liveq:
                        B, C, D = (B[:, :liveq], C[:, :liveq],
                                   D[:, :liveq])
                    if B.shape[2] > 1:  # x fully bound before q rounds
                        B, C, D = B[:, :, :1], C[:, :, :1], D[:, :, :1]
                    st["T"] = (B, C, D)
                meta = tuple((st["p0"], st["S"], s_lo < st["logq"])
                             for st in cstate)
                nh_c0 = _np.asarray(
                    [((1 << st["logq"]) >> (s_lo + 1))
                     if s_lo < st["logq"] else 0 for st in cstate],
                    _np.uint32)
                xs, _ = _scan_prep(
                    cnt, blinds_poly[num_scan:], blinds_evals[num_scan:],
                    blind_claim if num_scan == 0 else
                    blinds_evals[num_scan - 1], gens_n, random_tape)
                s0 = tdev.from_host(transcript)
                flat = tuple(t for st in cstate for t in st["T"])
                out = zkr.pqc_zk_scan(
                    tp, tq, tx[:1], _np.uint32(live_q // 2),
                    s0[0], s0[1], s0[2],
                    jnp.asarray(fq_encode([claim_per_round])[0]),
                    _np.frombuffer(comm_claim_per_round, _np.uint8)
                    .astype(_np.uint32),
                    _comb_tables(gens_n), _comb_tables(gens_1),
                    xs["bp"], xs["be"], xs["bsc"], xs["dv"], xs["rd"],
                    xs["rb"], xs["deltas"], nh_c0, *flat,
                    classes_meta=meta)
                tq = out[3]
                nc = len(cstate)
                for i, st in enumerate(cstate):
                    st["T"] = tuple(out[6 + 3 * i: 9 + 3 * i])
                    st["pending"] = None
                (cps, ces, prs, rss, claim_per_round,
                 comm_claim_per_round) = _scan_finish(
                    transcript, out[0:3] + out[4:6] + out[6 + 3 * nc:],
                    [bytes(_np.asarray(d, _np.uint8).tobytes())
                     for d in xs["deltas"]], cnt)
                comm_polys += cps
                comm_evals += ces
                proofs += prs
                r += rss
                live_q >>= cnt
                num_scan += cnt

        for j in range(num_scan, num_rounds):
            if j < num_rounds_x_max:
                mode, qround = MODE_X, -1
            elif j < num_rounds_x_max + num_rounds_q_max:
                mode, qround = MODE_Q, j - num_rounds_x_max
            else:
                mode, qround = MODE_P, -1

            if mode == MODE_P and merged is None:
                # merge classes: final bind, compact, concat along p
                parts = []
                for st in cstate:
                    B, C, D = st["T"]
                    if st["pending"] is not None:
                        rm_p, nh_p, m_p, act_p = st["pending"]
                        B, C, D = sck.pc_bind(B, C, D, rm_p, nh_p,
                                              mode=m_p, active=act_p)
                    parts.append(jnp.stack(
                        [B[:, :1, :1], C[:, :1, :1], D[:, :1, :1]], 0))
                cat = jnp.concatenate(parts, axis=1)  # (3, P_real, 1, 1, 16)
                P_pad = int(tp.shape[0])
                if cat.shape[1] < P_pad:
                    cat = jnp.concatenate([cat, jnp.zeros(
                        (3, P_pad - cat.shape[1]) + cat.shape[2:],
                        jnp.uint32)], axis=1)
                merged = (tq[:1], tx[:1], cat[0], cat[1], cat[2])

            if mode == MODE_P:
                n_half = _np.uint32(live_p // 2)
                tq1, tx1, Bm, Cm, Dm = merged
                if pending_p is None:
                    evd = sck.p1_evals(tp, tq1, tx1, Bm, Cm, Dm, n_half,
                                       mode=MODE_P)
                else:
                    rm_p, nh_p = pending_p
                    evd, (tp, tq1, tx1, Bm, Cm, Dm) = sck.p1_step(
                        tp, tq1, tx1, Bm, Cm, Dm, rm_p, nh_p, n_half,
                        mode_prev=MODE_P, mode=MODE_P)
                    merged = (tq1, tx1, Bm, Cm, Dm)
                e_parts = [mont_to_scalars(evd)]
            else:
                n_half_g = _np.uint32(
                    (live_x if mode == MODE_X else live_q) // 2)
                # fold the shared eq buffer bound by the PREVIOUS round
                # (same-axis rounds only; cross-axis handled at entry)
                e_parts = []
                for st in cstate:
                    active = mode == MODE_X or qround < st["logq"]
                    # class-local n_half for active folds; the GLOBAL
                    # n_half for inactive q rounds (it addresses the
                    # folded global tq inside pc_evals)
                    if mode == MODE_Q and active:
                        nh_c = _np.uint32((1 << st["logq"]) >> (qround + 1))
                    else:
                        nh_c = n_half_g
                    B, C, D = st["T"]
                    if st["pending"] is None:
                        evd = sck.pc_evals(tp, tq, tx, B, C, D, nh_c,
                                           mode=mode, p0=st["p0"],
                                           S=st["S"], active=active)
                    else:
                        rm_p, nh_p, m_p, act_p = st["pending"]
                        evd, (B, C, D) = sck.pc_step(
                            tp, tq, tx, B, C, D, rm_p, nh_p, nh_c,
                            mode_prev=m_p, mode=mode, p0=st["p0"],
                            S=st["S"], active_prev=act_p, active=active)
                        st["T"] = (B, C, D)
                    st["nh_c"] = nh_c
                    st["active"] = active
                    e_parts.append(mont_to_scalars(evd))

            e0 = sum((p[0] for p in e_parts), _ZERO)
            e2 = sum((p[1] for p in e_parts), _ZERO)
            e3 = sum((p[2] for p in e_parts), _ZERO)
            poly = UniPoly.from_evals([e0, claim_per_round - e0, e2, e3])
            comm_poly = poly.commit(gens_n, blinds_poly[j]).compress()
            transcript.append_point(b"comm_poly", comm_poly)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            # numpy challenge rides the next dispatch's arg upload
            # instead of paying a separate device_put round trip
            # through the remote-TPU relay (~25 ms/transfer)
            rm = fq_encode([r_j])[0]
            if mode == MODE_P:
                pending_p = (rm, _np.uint32(live_p // 2))
                live_p //= 2
            else:
                for st in cstate:
                    st["pending"] = (rm, st["nh_c"], mode, st["active"])
                if mode == MODE_X:
                    tx = sck.eq_fold(tx, rm, _np.uint32(live_x // 2))
                    live_x //= 2
                else:
                    tq = sck.eq_fold(tq, rm, _np.uint32(live_q // 2))
                    live_q //= 2

            proof, eval_, comm_eval = ZKSumcheckInstanceProof._zk_round_tail(
                poly, r_j, j, claim_per_round, comm_claim_per_round,
                blind_claim, blinds_poly, blinds_evals, gens_1, gens_n,
                transcript, random_tape)
            proofs.append(proof)
            claim_per_round = eval_
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

        # final binds
        if num_rounds_p == 0 and merged is None:
            # (degenerate: no p rounds) merge now for the claims
            parts = []
            for st in cstate:
                B, C, D = st["T"]
                if st["pending"] is not None:
                    rm_p, nh_p, m_p, act_p = st["pending"]
                    B, C, D = sck.pc_bind(B, C, D, rm_p, nh_p, mode=m_p,
                                          active=act_p)
                parts.append(jnp.stack(
                    [B[:, :1, :1], C[:, :1, :1], D[:, :1, :1]], 0))
            cat = jnp.concatenate(parts, axis=1)
            merged = (tq[:1], tx[:1], cat[0], cat[1], cat[2])
        elif pending_p is not None:
            rm_p, nh_p = pending_p
            tq1, tx1, Bm, Cm, Dm = merged
            tp, tq1, tx1, Bm, Cm, Dm = sck.p1_bind(
                tp, tq1, tx1, Bm, Cm, Dm, rm_p, nh_p, mode=MODE_P)
            merged = (tq1, tx1, Bm, Cm, Dm)

        _tq1, _tx1, Bm, Cm, Dm = merged
        tpv = mont_to_scalar(tp[0])
        tqv = mont_to_scalar(tq[0])
        txv = mont_to_scalar(tx[0])
        claims = [
            tpv * tqv * txv,
            mont_to_scalar(Bm[0, 0, 0]),
            mont_to_scalar(Cm[0, 0, 0]),
            mont_to_scalar(Dm[0, 0, 0]),
        ]
        return (ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs), r,
                claims, blinds_evals[num_rounds - 1])

    # --- phase-2 prover (sumcheck.rs:788-1065) ------------------------------
    @staticmethod
    def prove_cubic_disjoint_rounds(
            claim: Scalar, blind_claim: Scalar, num_rounds: int,
            num_rounds_y_max: int, num_rounds_w: int, num_rounds_p: int,
            single_inst: bool, ep, ABC, Z, gens_1: MultiCommitGens,
            gens_n: MultiCommitGens, transcript, random_tape):
        """ep: (P,16) eq table; ABC: (P_B,W,Y,16) (P_B may be 1);
        Z: (P,W,Y,16). comb = A*B*C."""
        assert num_rounds == num_rounds_y_max + num_rounds_w + num_rounds_p
        blinds_poly = random_tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = random_tape.random_vector(b"blinds_evals", num_rounds)

        claim_per_round = claim
        comm_claim_per_round = commit_scalar(
            claim_per_round, blind_claim, gens_1).compress()

        import numpy as _np
        live = {MODE_P: int(Z.shape[0]), MODE_W: int(Z.shape[1]),
                MODE_X: int(Z.shape[2])}

        r, comm_polys, comm_evals, proofs = [], [], [], []

        # Device-resident y-segment (see phase-1 counterpart above).
        num_scan = 0
        if _device_rounds_on() and num_rounds_y_max >= _MIN_SCAN_ROUNDS:
            from ..ops import transcript_dev as tdev
            from ..ops import zk_round as zkr

            num_scan = num_rounds_y_max
            xs, _ = _scan_prep(num_scan, blinds_poly, blinds_evals,
                               blind_claim, gens_n, random_tape)
            s0 = tdev.from_host(transcript)
            from ..ops import fqf

            out = zkr.p2_zk_scan_chunked(
                fqf.to_sublane(ep), fqf.to_sublane(ABC), fqf.to_sublane(Z),
                live[MODE_X],
                s0[0], s0[1], s0[2],
                jnp.asarray(fq_encode([claim_per_round])[0]),
                _np.frombuffer(comm_claim_per_round, _np.uint8)
                .astype(_np.uint32),
                _comb_tables(gens_n), _comb_tables(gens_1),
                xs, mode=MODE_X, single_inst=single_inst, sublane=True)
            ep, ABC, Z = (fqf.from_sublane(t) for t in out[3:6])
            (comm_polys, comm_evals, proofs, r, claim_per_round,
             comm_claim_per_round) = _scan_finish(
                transcript, out[0:3] + out[6:8] + out[8:15],
                [bytes(_np.asarray(d, _np.uint8).tobytes())
                 for d in xs["deltas"]], num_scan)
            live[MODE_X] >>= num_scan

        pending = None
        for j in range(num_scan, num_rounds):
            if j < num_rounds_y_max:
                mode = MODE_X
            elif j < num_rounds_y_max + num_rounds_w:
                mode = MODE_W
            else:
                mode = MODE_P

            n_half = _np.uint32(live[mode] // 2)
            if pending is None:
                evd = sck.p2_evals(ep, ABC, Z, n_half, mode=mode,
                                   single_inst=single_inst)
            else:
                rm_p, nh_p, mode_p = pending
                evd, (ep, ABC, Z) = sck.p2_step(
                    ep, ABC, Z, rm_p, nh_p, n_half, mode_prev=mode_p,
                    mode=mode, single_inst=single_inst)
            e0, e2, e3 = mont_to_scalars(evd)
            poly = UniPoly.from_evals([e0, claim_per_round - e0, e2, e3])
            comm_poly = poly.commit(gens_n, blinds_poly[j]).compress()
            transcript.append_point(b"comm_poly", comm_poly)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            # numpy challenge rides the next dispatch's arg upload
            # instead of paying a separate device_put round trip
            # through the remote-TPU relay (~25 ms/transfer)
            rm = fq_encode([r_j])[0]
            pending = (rm, n_half, mode)
            live[mode] //= 2

            proof, eval_, comm_eval = ZKSumcheckInstanceProof._zk_round_tail(
                poly, r_j, j, claim_per_round, comm_claim_per_round,
                blind_claim, blinds_poly, blinds_evals, gens_1, gens_n,
                transcript, random_tape)
            proofs.append(proof)
            claim_per_round = eval_
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

        if pending is not None:  # final bind for the last round
            rm_p, nh_p, mode_p = pending
            ep, ABC, Z = sck.p2_bind(ep, ABC, Z, rm_p, nh_p, mode=mode_p,
                                     single_inst=single_inst)
        claims = [
            mont_to_scalar(ep[0]),
            mont_to_scalar(ABC[0, 0, 0]),
            mont_to_scalar(Z[0, 0, 0]),
        ]
        return (ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs), r,
                claims, blinds_evals[num_rounds - 1])
