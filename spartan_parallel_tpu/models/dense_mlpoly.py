"""Dense multilinear polynomials + the Hyrax-style PCS.

Reference: src/dense_mlpoly.rs (DensePolynomial:20, EqPolynomial:60,
IdentityPolynomial:133, PolyCommitment:45, PolyEvalProof:428). The protocol
schedule (transcript labels, L/R factoring, batched-opening RLC) is
byte-compatible; the compute mapping is TPU-native:

  * evaluation tables live on device as (n, 16) uint32 Montgomery limb
    tensors (ops/fq.py), not host scalar vectors;
  * eq-table construction is a log(n)-step doubling kernel;
  * variable binding is a fold A' = lo + r*(hi - lo) over table halves;
  * Hyrax row commitments are one batched Pippenger MSM (all sqrt(N) rows
    share the generator set — ops/msm.py's native shape);
  * L*Z matrix-vector products run as fq dot-reductions on device.

Host Python holds only O(sqrt(N)) or O(log N) data: commitments, round
scalars, and the merlin transcript.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.edwards import RistrettoPoint, multiscalar_mul
from ..core.field import Scalar
from ..ops import fq, limbs as lb, msm
from ..ops.kernel_cache import cached_kernel
from ..utils.errors import ProofVerifyError
from .commitments import MultiCommitGens, commit_rows_device
from .sigma import DotProductProofGens, DotProductProofLog

_ZERO = Scalar.zero()
_ONE = Scalar.one()


def log2(n: int) -> int:
    assert n > 0 and n & (n - 1) == 0, f"not a power of 2: {n}"
    return n.bit_length() - 1


def next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


# --------------------------------------------------------------------------
# Host <-> device scalar codecs
# --------------------------------------------------------------------------
def scalars_to_mont(values) -> jnp.ndarray:
    """list of Scalar/int -> (n, 16) Montgomery device array.

    Bulk inputs: the R-scaling runs on device (one REDC-mul by R^2, host
    cost one int.to_bytes per element — ops/fq.py encode_to_device).
    Tiny inputs (per-round challenges): host bigint scaling avoids an
    extra device kernel dispatch on the sumcheck round path."""
    vals = values if isinstance(values, list) else list(values)
    if len(vals) < 64:
        return jnp.asarray(fq.encode(vals))
    return fq.encode_to_device(vals)


def mont_to_scalars(a) -> list:
    """(..., 16) Montgomery device array -> flat list of Scalar."""
    flat = np.asarray(jax.device_get(a)).reshape(-1, 16)
    return [Scalar(v) for v in fq.decode(flat)]


def mont_to_scalar(a) -> Scalar:
    return mont_to_scalars(a)[0]


# --------------------------------------------------------------------------
# Eq / identity polynomials
# --------------------------------------------------------------------------
def _eq_doubling(r_mont, ell: int):
    """(2^ell, 16) eq table by doubling: 2^ell muls, ~2^ell live temps."""
    tab = jnp.asarray(fq.ONE_MONT, jnp.uint32)[None]
    for j in range(ell):
        hi = fq.mul(tab, jnp.broadcast_to(r_mont[j], tab.shape))
        lo = fq.sub(tab, hi)
        tab = jnp.stack([lo, hi], axis=1).reshape(-1, 16)
    return tab


@cached_kernel(static_argnames=("ell",))
def _eq_evals_dev(r_mont, ell: int):
    """(ell, 16) Montgomery challenges -> (2^ell, 16) eq table.

    Index bit ordering matches the reference (dense_mlpoly.rs:76-91):
    the table index's MSB corresponds to r[0].

    Built as a Kronecker product of half tables: eq factors over any bit
    split (eq_hi(x_hi) * eq_lo(x_lo), hi-major), so one broadcast mul of
    two 2^(ell/2) tables replaces the last ell/2 doubling levels. The
    straight doubling build holds O(ell) near-full-size live temps, each
    8x-padded by the TPU's (8,128) tile on a (N, 16) layout — at 2^20 it
    ran the chip out of HBM (17.5 GB of HLO temps) before this split."""
    if ell <= 13:
        return _eq_doubling(r_mont, ell)
    half = ell // 2
    hi_tab = _eq_doubling(r_mont[:half], half)          # MSBs: hi-major
    lo_tab = _eq_doubling(r_mont[half:], ell - half)
    out = fq.mul(
        jnp.broadcast_to(hi_tab[:, None], (hi_tab.shape[0],
                                           lo_tab.shape[0], 16)),
        jnp.broadcast_to(lo_tab[None], (hi_tab.shape[0],
                                        lo_tab.shape[0], 16)))
    return out.reshape(-1, 16)


class EqPolynomial:
    """eq(r, x) over the boolean hypercube (dense_mlpoly.rs:60-131)."""

    def __init__(self, r):
        self.r = list(r)

    def evaluate(self, rx) -> Scalar:
        assert len(self.r) == len(rx)
        prod = _ONE
        for a, b in zip(self.r, rx):
            prod = prod * (a * b + (_ONE - a) * (_ONE - b))
        return prod

    def evals_dev(self) -> jnp.ndarray:
        """(2^ell, 16) Montgomery device table."""
        if not self.r:
            return jnp.asarray(fq.ONE_MONT, jnp.uint32)[None]
        return _eq_evals_dev(scalars_to_mont(self.r), ell=len(self.r))

    def evals(self) -> list:
        """Host list of Scalar (use only for small ell)."""
        return mont_to_scalars(self.evals_dev())

    @staticmethod
    def compute_factored_lens(ell: int):
        return ell // 2, ell - ell // 2

    def compute_factored_evals(self):
        left, _ = EqPolynomial.compute_factored_lens(len(self.r))
        return (
            EqPolynomial(self.r[:left]).evals(),
            EqPolynomial(self.r[left:]).evals(),
        )

    def compute_factored_evals_dev(self):
        left, _ = EqPolynomial.compute_factored_lens(len(self.r))
        return (
            EqPolynomial(self.r[:left]).evals_dev(),
            EqPolynomial(self.r[left:]).evals_dev(),
        )


class IdentityPolynomial:
    """evaluates to the integer index (dense_mlpoly.rs:133-152)."""

    def __init__(self, size_point: int):
        self.size_point = size_point

    def evaluate(self, r) -> Scalar:
        assert len(r) == self.size_point
        acc = _ZERO
        n = len(r)
        for i, ri in enumerate(r):
            acc = acc + Scalar(1 << (n - i - 1)) * ri
        return acc


# --------------------------------------------------------------------------
# Device fold / bound kernels
# --------------------------------------------------------------------------
@cached_kernel()
def _bound_top(tab, r_mont):
    n = tab.shape[0] // 2
    lo, hi = tab[:n], tab[n:]
    return fq.add(lo, fq.mul(jnp.broadcast_to(r_mont, lo.shape), fq.sub(hi, lo)))


@cached_kernel()
def _bound_bot(tab, r_mont):
    pairs = tab.reshape(-1, 2, 16)
    lo, hi = pairs[:, 0], pairs[:, 1]
    return fq.add(lo, fq.mul(jnp.broadcast_to(r_mont, lo.shape), fq.sub(hi, lo)))


@cached_kernel()
def _bound_L(z2d, L_tab):
    """(Ls, Rs, 16), (Ls, 16) -> (Rs, 16): LZ_i = sum_j L_j Z[j, i]."""
    return fq.dot(z2d, L_tab[:, None], axis=0)


@cached_kernel()
def _dot_dev(a, b):
    return fq.dot(a, b, axis=0)


@cached_kernel(static_argnames=("n",))
def _powers_dev(c_mont, n: int):
    """(16,) Montgomery c -> (n, 16) powers [1, c, c^2, ...] via a
    work-efficient associative scan (log depth)."""
    cs = jnp.concatenate([
        jnp.asarray(fq.ONE_MONT, jnp.uint32)[None],
        jnp.broadcast_to(c_mont, (n - 1, 16)),
    ])
    return jax.lax.associative_scan(fq.mul, cs, axis=0)


@cached_kernel()
def _rlc_eval_dev(Zm, powers):
    """sum_i Zm[i] * powers[i] — the univariate RLC evaluation."""
    return fq.dot(Zm, powers[: Zm.shape[0]], axis=0)


def uni_evaluate(poly, c: Scalar) -> Scalar:
    """Treat the ML poly's table as univariate coefficients and evaluate
    at c (the ShiftProofs trick, lib.rs:390-419) — on device, O(log n)
    depth instead of a host bigint loop."""
    n = poly.Zm.shape[0]
    powers = _powers_dev(scalars_to_mont([c])[0], n=n)
    return mont_to_scalar(_rlc_eval_dev(poly.Zm, powers))


# --------------------------------------------------------------------------
# DensePolynomial
# --------------------------------------------------------------------------
class DensePolynomial:
    """Evaluation-form multilinear polynomial, device-resident.

    reference: dense_mlpoly.rs:20 — Z is the table of values over
    {0,1}^num_vars; binding/eval/commit all run on device.
    """

    __slots__ = ("Zm", "num_vars")

    def __init__(self, Zm: jnp.ndarray):
        n = Zm.shape[0]
        pad = next_pow2(n) - n
        if pad:
            Zm = jnp.concatenate([Zm, jnp.zeros((pad, 16), jnp.uint32)])
        self.Zm = Zm
        self.num_vars = log2(Zm.shape[0])

    @staticmethod
    def from_scalars(values) -> "DensePolynomial":
        return DensePolynomial(scalars_to_mont(values))

    def __len__(self) -> int:
        return self.Zm.shape[0]

    def get_num_vars(self) -> int:
        return self.num_vars

    def clone(self) -> "DensePolynomial":
        return DensePolynomial(self.Zm)

    def __getitem__(self, i: int) -> Scalar:
        return mont_to_scalar(self.Zm[i])

    def to_scalars(self) -> list:
        return mont_to_scalars(self.Zm)

    def split(self, idx: int):
        return (
            DensePolynomial(self.Zm[:idx]),
            DensePolynomial(self.Zm[idx : 2 * idx]),
        )

    def bound_poly_var_top(self, r: Scalar) -> None:
        self.Zm = _bound_top(self.Zm, scalars_to_mont([r])[0])
        self.num_vars -= 1

    def bound_poly_var_bot(self, r: Scalar) -> None:
        self.Zm = _bound_bot(self.Zm, scalars_to_mont([r])[0])
        self.num_vars -= 1

    def bound(self, L) -> jnp.ndarray:
        """L*Z vector-matrix product -> (R_size, 16) Montgomery.

        reference: dense_mlpoly.rs:258-265.
        """
        if isinstance(L, (list, tuple)):
            L = scalars_to_mont(L)
        ls = L.shape[0]
        return _bound_L(self.Zm.reshape(ls, -1, 16), L)

    def evaluate(self, r) -> Scalar:
        assert len(r) == self.num_vars
        chis = EqPolynomial(r).evals_dev()
        return mont_to_scalar(_dot_dev(self.Zm, chis))

    def extend(self, other: "DensePolynomial") -> None:
        assert len(self) == len(other)
        self.Zm = jnp.concatenate([self.Zm, other.Zm])
        self.num_vars += 1

    @staticmethod
    def merge(polys) -> "DensePolynomial":
        return DensePolynomial(jnp.concatenate([p.Zm for p in polys]))

    # --- Hyrax commitment (dense_mlpoly.rs:153-257) ----------------------
    def commit(self, gens: "PolyCommitmentGens", random_tape=None):
        ell = self.num_vars
        left, right = EqPolynomial.compute_factored_lens(ell)
        L_size, R_size = 1 << left, 1 << right
        if random_tape is not None:
            blinds = PolyCommitmentBlinds(
                random_tape.random_vector(b"poly_blinds", L_size)
            )
        else:
            blinds = PolyCommitmentBlinds([_ZERO] * L_size)
        return self.commit_with_blind(gens, blinds), blinds

    def commit_with_blind(self, gens: "PolyCommitmentGens", blinds):
        L_size = len(blinds.blinds)
        R_size = len(self) // L_size
        rows = self.Zm.reshape(L_size, R_size, 16)
        pts = commit_rows_device(rows, blinds.blinds, gens.gens.gens_n)
        return PolyCommitment([p.compress() for p in pts])


class PolyCommitmentGens:
    """gens for sqrt(N)-row Hyrax commitments (dense_mlpoly.rs:26-38)."""

    __slots__ = ("gens",)

    def __init__(self, num_vars: int, label: bytes):
        _, right = EqPolynomial.compute_factored_lens(num_vars)
        self.gens = DotProductProofGens(1 << right, label)


class PolyCommitmentBlinds:
    __slots__ = ("blinds",)

    def __init__(self, blinds):
        self.blinds = list(blinds)


class PolyCommitment:
    __slots__ = ("C",)

    def __init__(self, C):
        self.C = list(C)  # list of 32-byte compressed points

    @staticmethod
    def empty() -> "PolyCommitment":
        return PolyCommitment([])

    def append_to_transcript(self, label: bytes, transcript) -> None:
        # dense_mlpoly.rs:412-420
        transcript.append_message(label, b"poly_commitment_begin")
        for c in self.C:
            transcript.append_point(b"poly_commitment_share", c)
        transcript.append_message(label, b"poly_commitment_end")

    def decompress(self):
        return [RistrettoPoint.decompress(c) for c in self.C]


# --------------------------------------------------------------------------
# PolyEvalProof
# --------------------------------------------------------------------------
def _lz_blind(blinds, L) -> Scalar:
    acc = _ZERO
    for b, l in zip(blinds, L):
        acc = acc + b * l
    return acc


class PolyEvalProof:
    """Hyrax opening: L*Z reduction + log-size dot-product proof.

    reference: dense_mlpoly.rs:428-530 plus the fork's batched variants
    (prove_batched_instances_disjoint_rounds :861, prove_batched_points
    :531, prove_batched_instances :689).
    """

    __slots__ = ("proof",)

    def __init__(self, proof: DotProductProofLog):
        self.proof = proof

    @staticmethod
    def protocol_name() -> bytes:
        return b"polynomial evaluation proof"

    @staticmethod
    def prove(poly: DensePolynomial, blinds_opt, r, Zr: Scalar, blind_Zr_opt,
              gens: PolyCommitmentGens, transcript, random_tape):
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        assert poly.get_num_vars() == len(r)
        left, right = EqPolynomial.compute_factored_lens(len(r))
        L_size = 1 << left
        blinds = blinds_opt if blinds_opt is not None else \
            PolyCommitmentBlinds([_ZERO] * L_size)
        assert len(blinds.blinds) == L_size
        blind_Zr = blind_Zr_opt if blind_Zr_opt is not None else _ZERO

        L, R = EqPolynomial(list(r)).compute_factored_evals()
        LZ = mont_to_scalars(poly.bound(L))
        LZ_blind = _lz_blind(blinds.blinds, L)

        proof, _C_LR, C_Zr_prime = DotProductProofLog.prove(
            gens.gens, transcript, random_tape, LZ, LZ_blind, R, Zr, blind_Zr
        )
        return PolyEvalProof(proof), C_Zr_prime

    def verify(self, gens: PolyCommitmentGens, transcript, r, C_Zr: bytes,
               comm: PolyCommitment) -> None:
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        L, R = EqPolynomial(list(r)).compute_factored_evals()
        C_LZ = multiscalar_mul(L, comm.decompress()).compress()
        self.proof.verify(len(R), gens.gens, transcript, R, C_LZ, C_Zr)

    def verify_plain(self, gens, transcript, r, Zr: Scalar, comm) -> None:
        from .commitments import commit_scalar

        C_Zr = commit_scalar(Zr, _ZERO, gens.gens.gens_1).compress()
        self.verify(gens, transcript, r, C_Zr, comm)

    # --- batched points: same poly, many points (dense_mlpoly.rs:531) ----
    @staticmethod
    def prove_batched_points(poly, blinds_opt, r_list, Zr_list,
                             blind_Zr_opt, gens, transcript, random_tape):
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        assert len(r_list) == len(Zr_list)
        for r in r_list:
            assert poly.get_num_vars() == len(r)
        left, _ = EqPolynomial.compute_factored_lens(len(r_list[0]))
        L_size = 1 << left
        blinds = blinds_opt if blinds_opt is not None else \
            PolyCommitmentBlinds([_ZERO] * L_size)
        assert len(blinds.blinds) == L_size
        blind_Zr = blind_Zr_opt if blind_Zr_opt is not None else _ZERO

        index_map = {}
        L_list, R_list, Zc_list = [], [], []
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        for i, r in enumerate(r_list):
            L, R = EqPolynomial(list(r)).compute_factored_evals()
            key = tuple(int(x) for x in r[:left])
            if key in index_map:
                c = c * c_base
                idx = index_map[key]
                R_list[idx] = [a + c * b for a, b in zip(R_list[idx], R)]
                Zc_list[idx] = Zc_list[idx] + c * Zr_list[i]
            else:
                index_map[key] = len(L_list)
                L_list.append(L)
                R_list.append(R)
                Zc_list.append(Zr_list[i])

        proofs = []
        for i in range(len(L_list)):
            L = L_list[i]
            LZ = mont_to_scalars(poly.bound(L))
            LZ_blind = _lz_blind(blinds.blinds, L)
            proof, _, _ = DotProductProofLog.prove(
                gens.gens, transcript, random_tape, LZ, LZ_blind,
                R_list[i], Zc_list[i], blind_Zr)
            proofs.append(PolyEvalProof(proof))
        return proofs

    @staticmethod
    def verify_plain_batched_points(proof_list, gens, transcript, r_list,
                                    Zr_list, comm):
        from .commitments import commit_scalar

        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        left, _ = EqPolynomial.compute_factored_lens(len(r_list[0]))
        index_map = {}
        L_list, R_list, Zc_list = [], [], []
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        for i, r in enumerate(r_list):
            L, R = EqPolynomial(list(r)).compute_factored_evals()
            key = tuple(int(x) for x in r[:left])
            if key in index_map:
                c = c * c_base
                idx = index_map[key]
                R_list[idx] = [a + c * b for a, b in zip(R_list[idx], R)]
                Zc_list[idx] = Zc_list[idx] + c * Zr_list[i]
            else:
                index_map[key] = len(L_list)
                L_list.append(L)
                R_list.append(R)
                Zc_list.append(Zr_list[i])
        assert len(L_list) == len(proof_list)

        pts = comm.decompress()
        for i in range(len(L_list)):
            C_Zc = commit_scalar(Zc_list[i], _ZERO,
                                 gens.gens.gens_1).compress()
            C_LZ = multiscalar_mul(L_list[i], pts).compress()
            proof_list[i].proof.verify(len(R_list[i]), gens.gens, transcript,
                                       R_list[i], C_LZ, C_Zc)

    # --- batched instances, each at its own point (dense_mlpoly.rs:689) --
    @staticmethod
    def prove_batched_instances(poly_list, blinds_opt, r_list, Zr_list,
                                blind_Zr_opt, gens, transcript, random_tape):
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        assert len(poly_list) == len(r_list) == len(Zr_list)
        index_map = {}
        LZ_list, Zc_list, L_list, R_list = [], [], [], []
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        for i, poly in enumerate(poly_list):
            num_vars = poly.get_num_vars()
            r = list(r_list[i])
            if num_vars >= len(r):
                r = [_ZERO] * (num_vars - len(r)) + r
            else:
                r = r[len(r) - num_vars:]
            L, R = EqPolynomial(r).compute_factored_evals()
            key = (num_vars, tuple(int(x) for x in R))
            if key in index_map:
                c = c * c_base
                idx = index_map[key]
                LZ = poly.bound(L)
                cm = scalars_to_mont([c])[0]
                LZ_list[idx] = fq.add(
                    LZ_list[idx], fq.mul(jnp.broadcast_to(cm, LZ.shape), LZ))
                Zc_list[idx] = Zc_list[idx] + c * Zr_list[i]
            else:
                index_map[key] = len(LZ_list)
                LZ_list.append(poly.bound(L))
                Zc_list.append(Zr_list[i])
                L_list.append(L)
                R_list.append(R)

        proofs = []
        blind_Zr = blind_Zr_opt if blind_Zr_opt is not None else _ZERO
        for i in range(len(LZ_list)):
            L = L_list[i]
            blinds = blinds_opt if blinds_opt is not None else \
                PolyCommitmentBlinds([_ZERO] * len(L))
            assert len(blinds.blinds) == len(L)
            LZ_blind = _lz_blind(blinds.blinds, L)
            proof, _, _ = DotProductProofLog.prove(
                gens.gens, transcript, random_tape,
                mont_to_scalars(LZ_list[i]), LZ_blind, R_list[i],
                Zc_list[i], blind_Zr)
            proofs.append(PolyEvalProof(proof))
        return proofs

    @staticmethod
    def verify_plain_batched_instances(proof_list, gens, transcript, r_list,
                                       Zr_list, comm_list, num_vars_list):
        from .commitments import commit_scalar

        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        assert len(comm_list) == len(r_list)
        index_map = {}
        LZ_list, Zc_list, L_list, R_list = [], [], [], []
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        for i, comm in enumerate(comm_list):
            pts = comm.decompress()
            num_vars = num_vars_list[i]
            r = list(r_list[i])
            if num_vars >= len(r):
                r = [_ZERO] * (num_vars - len(r)) + r
            else:
                r = r[len(r) - num_vars:]
            L, R = EqPolynomial(r).compute_factored_evals()
            key = (num_vars, tuple(int(x) for x in R))
            if key in index_map:
                c = c * c_base
                idx = index_map[key]
                LZ_list[idx] = LZ_list[idx] + \
                    multiscalar_mul(L[: len(pts)], pts) * c
                Zc_list[idx] = Zc_list[idx] + c * Zr_list[i]
            else:
                index_map[key] = len(LZ_list)
                LZ_list.append(multiscalar_mul(L[: len(pts)], pts))
                Zc_list.append(Zr_list[i])
                L_list.append(L)
                R_list.append(R)
        assert len(LZ_list) == len(proof_list)
        for i in range(len(LZ_list)):
            C_Zc = commit_scalar(Zc_list[i], _ZERO,
                                 gens.gens.gens_1).compress()
            proof_list[i].proof.verify(len(R_list[i]), gens.gens, transcript,
                                       R_list[i], LZ_list[i].compress(),
                                       C_Zc)

    # --- univariate batched openings at one scalar (dense_mlpoly.rs:1046) -
    @staticmethod
    def prove_uni_batched_instances(poly_list, r: Scalar, Zr_list, gens,
                                    transcript, random_tape):
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        max_num_vars = max(p.get_num_vars() for p in poly_list)
        _, right = EqPolynomial.compute_factored_lens(max_num_vars)
        R_size = 1 << right

        R = []
        r_base = _ONE
        for _ in range(R_size):
            R.append(r_base)
            r_base = r_base * r

        L_map = {}
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        LZ_comb = jnp.zeros((R_size, 16), jnp.uint32)
        Zr_comb = _ZERO
        for i, poly in enumerate(poly_list):
            num_vars = poly.get_num_vars()
            if num_vars not in L_map:
                left_nv, right_nv = EqPolynomial.compute_factored_lens(
                    num_vars)
                rb = _ONE
                for _ in range(1 << right_nv):
                    rb = rb * r
                l_base = _ONE
                L = []
                for _ in range(1 << left_nv):
                    L.append(l_base)
                    l_base = l_base * rb
                L_map[num_vars] = L
            L = L_map[num_vars]
            LZ = poly.bound(L)  # (R_size_i, 16)
            cm = scalars_to_mont([c])[0]
            scaled = fq.mul(jnp.broadcast_to(cm, LZ.shape), LZ)
            pad = R_size - LZ.shape[0]
            if pad:
                scaled = jnp.concatenate(
                    [scaled, jnp.zeros((pad, 16), jnp.uint32)])
            LZ_comb = fq.add(LZ_comb, scaled)
            Zr_comb = Zr_comb + c * Zr_list[i]
            c = c * c_base

        proof, _C_LR, C_Zr_prime = DotProductProofLog.prove(
            gens.gens, transcript, random_tape, mont_to_scalars(LZ_comb),
            _ZERO, R, Zr_comb, _ZERO)
        return PolyEvalProof(proof), C_Zr_prime

    def verify_uni_batched_instances(self, gens, transcript, r: Scalar,
                                     C_Zr_list, comm_list, poly_size):
        """C_Zr_list: list of RistrettoPoint."""
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        max_poly_size = max(poly_size)
        _, right = EqPolynomial.compute_factored_lens(
            log2(next_pow2(max_poly_size)))
        R_size = 1 << right

        R = []
        r_base = _ONE
        for _ in range(R_size):
            R.append(r_base)
            r_base = r_base * r

        L_map = {}
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        C_LZ_comb = RistrettoPoint.identity()
        C_Zr_comb = RistrettoPoint.identity()
        for i, comm in enumerate(comm_list):
            num_vars = log2(next_pow2(poly_size[i]))
            if num_vars not in L_map:
                left_nv, right_nv = EqPolynomial.compute_factored_lens(
                    num_vars)
                rb = _ONE
                for _ in range(1 << right_nv):
                    rb = rb * r
                l_base = _ONE
                L = []
                for _ in range(1 << left_nv):
                    L.append(l_base)
                    l_base = l_base * rb
                L_map[num_vars] = L
            L = L_map[num_vars]
            pts = comm.decompress()
            C_LZ = multiscalar_mul(L[: len(pts)], pts)
            C_LZ_comb = C_LZ_comb + C_LZ * c
            C_Zr_comb = C_Zr_comb + C_Zr_list[i] * c
            c = c * c_base

        self.proof.verify(len(R), gens.gens, transcript, R,
                          C_LZ_comb.compress(), C_Zr_comb.compress())

    # --- batched opening: many instances, (rq, ry) trimmed per size ------
    # reference: dense_mlpoly.rs:861-1044. One dot-product proof per
    # distinct (num_proofs, num_inputs) pair; same-size instances fold in
    # by a c-power RLC.
    @staticmethod
    def _disjoint_r_short(num_proofs: int, num_inputs: int, rq, ry):
        nq, ny = log2(num_proofs), log2(num_inputs)
        if ny >= len(ry):
            ry_short = [_ZERO] * (ny - len(ry)) + list(ry)
        else:
            ry_short = list(ry[len(ry) - ny :])
        rq_short = list(rq[len(rq) - nq :])
        return rq_short + ry_short

    @staticmethod
    def prove_batched_instances_disjoint_rounds(
        poly_list, num_proofs_list, num_inputs_list, blinds_opt, rq, ry,
        Zr_list, blind_Zr_opt, gens: PolyCommitmentGens, transcript,
        random_tape):
        transcript.append_protocol_name(PolyEvalProof.protocol_name())
        assert len(poly_list) == len(Zr_list)

        index_map = {}
        LZ_list, Zc_list, L_list, R_list = [], [], [], []
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        for i, poly in enumerate(poly_list):
            key = (num_proofs_list[i], num_inputs_list[i])
            if key in index_map:
                c = c * c_base
                idx = index_map[key]
                LZ = poly.bound(L_list[idx])
                cm = scalars_to_mont([c])[0]
                LZ_list[idx] = fq.add(
                    LZ_list[idx], fq.mul(jnp.broadcast_to(cm, LZ.shape), LZ)
                )
                Zc_list[idx] = Zc_list[idx] + c * Zr_list[i]
            else:
                index_map[key] = len(LZ_list)
                r = PolyEvalProof._disjoint_r_short(key[0], key[1], rq, ry)
                L, R = EqPolynomial(r).compute_factored_evals()
                LZ_list.append(poly.bound(L))
                Zc_list.append(Zr_list[i])
                L_list.append(L)
                R_list.append(R)

        proofs = []
        blind_Zr = blind_Zr_opt if blind_Zr_opt is not None else _ZERO
        for i in range(len(LZ_list)):
            L = L_list[i]
            blinds = blinds_opt if blinds_opt is not None else \
                PolyCommitmentBlinds([_ZERO] * len(L))
            assert len(blinds.blinds) == len(L)
            LZ_blind = _lz_blind(blinds.blinds, L)
            proof, _, _ = DotProductProofLog.prove(
                gens.gens, transcript, random_tape,
                mont_to_scalars(LZ_list[i]), LZ_blind, R_list[i],
                Zc_list[i], blind_Zr,
            )
            proofs.append(PolyEvalProof(proof))
        return proofs

    @staticmethod
    def verify_batched_instances_disjoint_rounds(
        proof_list, num_proofs_list, num_inputs_list,
        gens: PolyCommitmentGens, transcript, rq, ry, Zr_list, comm_list):
        """Zr_list: list of RistrettoPoint (commitments to evals)."""
        transcript.append_protocol_name(PolyEvalProof.protocol_name())

        index_map = {}
        LZ_list, Zc_list, L_list, R_list = [], [], [], []
        c_base = transcript.challenge_scalar(b"challenge_c")
        c = _ONE
        for i, comm in enumerate(comm_list):
            pts = comm.decompress()
            key = (num_proofs_list[i], num_inputs_list[i])
            if key in index_map:
                c = c * c_base
                idx = index_map[key]
                LZ = multiscalar_mul(L_list[idx][: len(pts)], pts)
                LZ_list[idx] = LZ_list[idx] + LZ * c
                Zc_list[idx] = Zc_list[idx] + Zr_list[i] * c
            else:
                index_map[key] = len(LZ_list)
                r = PolyEvalProof._disjoint_r_short(key[0], key[1], rq, ry)
                L, R = EqPolynomial(r).compute_factored_evals()
                LZ_list.append(multiscalar_mul(L[: len(pts)], pts))
                Zc_list.append(Zr_list[i])
                L_list.append(L)
                R_list.append(R)
        assert len(LZ_list) == len(proof_list)

        for i in range(len(LZ_list)):
            proof_list[i].proof.verify(
                len(R_list[i]), gens.gens, transcript, R_list[i],
                LZ_list[i].compress(), Zc_list[i].compress(),
            )
