"""Grand-product circuits + batched layered sumcheck proof.

Reference: src/product_tree.rs (ProductCircuit:12, DotProductCircuit:67,
ProductCircuitEvalProofBatched:260,386) and the non-ZK batched cubic
sumcheck it drives (src/sumcheck.rs:264 prove_cubic_batched).

TPU mapping: a product tree layer is one fused elementwise field-mul of
two half tensors; the batched layer sumcheck stacks all B circuits of a
layer into one (B, n, 16) tensor so each round is a single device kernel
(eval at {0,2,3} + fold) regardless of how many circuits are batched —
the reference loops circuits serially on the CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.field import Scalar
from ..ops import fq
from ..ops.kernel_cache import cached_kernel
from ..ops.sumcheck import _ext2, _ext3, _fold, _split
from ..utils.errors import ProofVerifyError
from .dense_mlpoly import (
    DensePolynomial,
    EqPolynomial,
    log2,
    mont_to_scalar,
    mont_to_scalars,
    scalars_to_mont,
)
from .sumcheck import SumcheckInstanceProof
from .unipoly import UniPoly

_ZERO = Scalar.zero()
_ONE = Scalar.one()


@cached_kernel()
def _layer_mul(left, right):
    """(n, 16) x (n, 16) -> next layer halves ((n/2,16), (n/2,16))."""
    prod = fq.mul(left, right)
    h = prod.shape[0] // 2
    return prod[:h], prod[h:]


class ProductCircuit:
    """Binary product tree; layer k holds 2^(L-k) values as (left, right)
    halves (product_tree.rs:12-63)."""

    __slots__ = ("left_vec", "right_vec")

    def __init__(self, poly: DensePolynomial):
        n = len(poly)
        left = poly.Zm[: n // 2]
        right = poly.Zm[n // 2 :]
        self.left_vec = [left]
        self.right_vec = [right]
        for _ in range(log2(n) - 1):
            nl, nr = _layer_mul(self.left_vec[-1], self.right_vec[-1])
            self.left_vec.append(nl)
            self.right_vec.append(nr)

    def num_layers(self) -> int:
        return len(self.left_vec)

    def evaluate(self) -> Scalar:
        top = fq.mul(self.left_vec[-1], self.right_vec[-1])
        return mont_to_scalar(top[0])


class DotProductCircuit:
    """sum_i left_i right_i weight_i (product_tree.rs:67-110)."""

    __slots__ = ("left", "right", "weight")

    def __init__(self, left, right, weight):
        # device Montgomery (n, 16) arrays
        assert left.shape == right.shape == weight.shape
        self.left, self.right, self.weight = left, right, weight

    def evaluate(self) -> Scalar:
        return mont_to_scalar(
            fq.sum_reduce(fq.mul(fq.mul(self.left, self.right), self.weight),
                          axis=0))

    def split(self):
        h = self.left.shape[0] // 2
        return (
            DotProductCircuit(self.left[:h], self.right[:h], self.weight[:h]),
            DotProductCircuit(self.left[h:], self.right[h:], self.weight[h:]),
        )


# --------------------------------------------------------------------------
# Batched cubic round kernel: B instances (A, B) sharing C, plus S
# sequential instances (A, B, C); returns per-instance (e0, e2, e3).
# --------------------------------------------------------------------------
@cached_kernel()
def _batched_cubic_evals(A, B, C_shared):
    """A, B: (Binst, n, 16); C_shared: (n, 16) -> (Binst, 3, 16)."""
    Alo, Ahi = _split(A, 1)
    Blo, Bhi = _split(B, 1)
    Clo, Chi = _split(C_shared, 0)

    def ev(a, b, c):
        return fq.sum_reduce(fq.mul(fq.mul(a, b), c[None]), axis=1)

    e0 = ev(Alo, Blo, Clo)
    A2, B2, C2 = _ext2(Alo, Ahi), _ext2(Blo, Bhi), _ext2(Clo, Chi)
    e2 = ev(A2, B2, C2)
    e3 = ev(_ext3(A2, Alo, Ahi), _ext3(B2, Blo, Bhi), _ext3(C2, Clo, Chi))
    return jnp.stack([e0, e2, e3], axis=1)


@cached_kernel()
def _batched_cubic_evals_seq(A, B, C):
    """A, B, C: (S, n, 16) -> (S, 3, 16)."""
    Alo, Ahi = _split(A, 1)
    Blo, Bhi = _split(B, 1)
    Clo, Chi = _split(C, 1)

    def ev(a, b, c):
        return fq.sum_reduce(fq.mul(fq.mul(a, b), c), axis=1)

    e0 = ev(Alo, Blo, Clo)
    A2, B2, C2 = _ext2(Alo, Ahi), _ext2(Blo, Bhi), _ext2(Clo, Chi)
    e2 = ev(A2, B2, C2)
    e3 = ev(_ext3(A2, Alo, Ahi), _ext3(B2, Blo, Bhi), _ext3(C2, Clo, Chi))
    return jnp.stack([e0, e2, e3], axis=1)


@cached_kernel()
def _batched_fold(T, r):
    lo, hi = _split(T, 1)
    return _fold(lo, hi, r)


def prove_cubic_batched(claim, num_rounds, A_par, B_par, C_par, A_seq,
                        B_seq, C_seq, coeffs, transcript):
    """Non-ZK batched cubic sumcheck (sumcheck.rs:264-434).

    A_par/B_par: (Binst, n, 16) stacked circuit-layer tensors sharing
    C_par (n, 16); A_seq/B_seq/C_seq: (S, n, 16) stacked dotp tensors
    (or None). Returns (proof, r, claims_prod, claims_dotp).
    """
    e = claim
    r = []
    cubic_polys = []
    have_seq = A_seq is not None and A_seq.shape[0] > 0
    for _ in range(num_rounds):
        evs = mont_to_scalars(_batched_cubic_evals(A_par, B_par, C_par))
        evals = [(evs[3 * i], evs[3 * i + 1], evs[3 * i + 2])
                 for i in range(A_par.shape[0])]
        if have_seq:
            evs2 = mont_to_scalars(_batched_cubic_evals_seq(A_seq, B_seq,
                                                            C_seq))
            evals += [(evs2[3 * i], evs2[3 * i + 1], evs2[3 * i + 2])
                      for i in range(A_seq.shape[0])]
        c0 = c2 = c3 = _ZERO
        for (a, b, cc), co in zip(evals, coeffs):
            c0 = c0 + a * co
            c2 = c2 + b * co
            c3 = c3 + cc * co
        poly = UniPoly.from_evals([c0, e - c0, c2, c3])
        poly.append_to_transcript(b"poly", transcript)
        r_j = transcript.challenge_scalar(b"challenge_nextround")
        r.append(r_j)
        rm = scalars_to_mont([r_j])[0]
        A_par = _batched_fold(A_par, rm)
        B_par = _batched_fold(B_par, rm)
        C_par = _fold(*_split(C_par, 0), rm)
        if have_seq:
            A_seq = _batched_fold(A_seq, rm)
            B_seq = _batched_fold(B_seq, rm)
            C_seq = _batched_fold(C_seq, rm)
        e = poly.evaluate(r_j)
        cubic_polys.append(poly.compress())

    claims_prod = (
        mont_to_scalars(A_par[:, 0]),
        mont_to_scalars(B_par[:, 0]),
        mont_to_scalar(C_par[0]),
    )
    if have_seq:
        claims_dotp = (
            mont_to_scalars(A_seq[:, 0]),
            mont_to_scalars(B_seq[:, 0]),
            mont_to_scalars(C_seq[:, 0]),
        )
    else:
        claims_dotp = ([], [], [])
    return SumcheckInstanceProof(cubic_polys), r, claims_prod, claims_dotp


class LayerProofBatched:
    __slots__ = ("proof", "claims_prod_left", "claims_prod_right")

    def __init__(self, proof, claims_prod_left, claims_prod_right):
        self.proof = proof
        self.claims_prod_left = claims_prod_left
        self.claims_prod_right = claims_prod_right

    def verify(self, claim, num_rounds, degree_bound, transcript):
        return self.proof.verify(claim, num_rounds, degree_bound, transcript)


class ProductCircuitEvalProofBatched:
    """Layered GKR-style batched product/dotp argument
    (product_tree.rs:260-487)."""

    __slots__ = ("proof", "claims_dotp")

    def __init__(self, proof, claims_dotp):
        self.proof = proof
        self.claims_dotp = claims_dotp

    @staticmethod
    def prove(prod_circuits, dotp_circuits, transcript):
        assert prod_circuits
        claims_dotp_final = ([], [], [])
        proof_layers = []
        num_layers = prod_circuits[0].num_layers()
        claims_to_verify = [c.evaluate() for c in prod_circuits]
        rand = []
        for layer_id in range(num_layers - 1, -1, -1):
            # stacked layer tensors (each circuit's left/right at this layer)
            A_par = jnp.stack([c.left_vec[layer_id] for c in prod_circuits])
            B_par = jnp.stack([c.right_vec[layer_id] for c in prod_circuits])
            C_par = EqPolynomial(rand).evals_dev()
            assert C_par.shape[0] == A_par.shape[1]
            num_rounds_prod = log2(C_par.shape[0])

            A_seq = B_seq = C_seq = None
            if layer_id == 0 and dotp_circuits:
                claims_to_verify = claims_to_verify + [
                    d.evaluate() for d in dotp_circuits]
                A_seq = jnp.stack([d.left for d in dotp_circuits])
                B_seq = jnp.stack([d.right for d in dotp_circuits])
                C_seq = jnp.stack([d.weight for d in dotp_circuits])

            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = _ZERO
            for c, co in zip(claims_to_verify, coeffs):
                claim = claim + c * co

            proof, rand_prod, claims_prod, claims_dotp = prove_cubic_batched(
                claim, num_rounds_prod, A_par, B_par, C_par, A_seq, B_seq,
                C_seq, coeffs, transcript)

            claims_prod_left, claims_prod_right, _claims_eq = claims_prod
            for i in range(len(prod_circuits)):
                transcript.append_scalar(b"claim_prod_left",
                                         claims_prod_left[i])
                transcript.append_scalar(b"claim_prod_right",
                                         claims_prod_right[i])

            if layer_id == 0 and dotp_circuits:
                dl, dr, dw = claims_dotp
                for i in range(len(dotp_circuits)):
                    transcript.append_scalar(b"claim_dotp_left", dl[i])
                    transcript.append_scalar(b"claim_dotp_right", dr[i])
                    transcript.append_scalar(b"claim_dotp_weight", dw[i])
                claims_dotp_final = claims_dotp

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                claims_prod_left[i] + r_layer *
                (claims_prod_right[i] - claims_prod_left[i])
                for i in range(len(prod_circuits))
            ]
            rand = [r_layer] + rand_prod
            proof_layers.append(LayerProofBatched(
                proof, claims_prod_left, claims_prod_right))

        return (ProductCircuitEvalProofBatched(proof_layers,
                                               claims_dotp_final), rand)

    def verify(self, claims_prod_vec, claims_dotp_vec, length, transcript):
        num_layers = log2(length)
        rand = []
        assert len(self.proof) == num_layers
        claims_to_verify = list(claims_prod_vec)
        claims_to_verify_dotp = []
        for i in range(num_layers):
            if i == num_layers - 1:
                claims_to_verify = claims_to_verify + list(claims_dotp_vec)
            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = _ZERO
            for c, co in zip(claims_to_verify, coeffs):
                claim = claim + c * co
            claim_last, rand_prod = self.proof[i].verify(
                claim, i, 3, transcript)

            cl = self.proof[i].claims_prod_left
            cr = self.proof[i].claims_prod_right
            assert len(cl) == len(claims_prod_vec)
            for k in range(len(claims_prod_vec)):
                transcript.append_scalar(b"claim_prod_left", cl[k])
                transcript.append_scalar(b"claim_prod_right", cr[k])

            assert len(rand) == len(rand_prod)
            eq = _ONE
            for a, b in zip(rand, rand_prod):
                eq = eq * (a * b + (_ONE - a) * (_ONE - b))
            claim_expected = _ZERO
            for k in range(len(claims_prod_vec)):
                claim_expected = claim_expected + \
                    coeffs[k] * (cl[k] * cr[k] * eq)

            if i == num_layers - 1:
                npi = len(claims_prod_vec)
                dl, dr, dw = self.claims_dotp
                for k in range(len(dl)):
                    transcript.append_scalar(b"claim_dotp_left", dl[k])
                    transcript.append_scalar(b"claim_dotp_right", dr[k])
                    transcript.append_scalar(b"claim_dotp_weight", dw[k])
                    claim_expected = claim_expected + \
                        coeffs[k + npi] * dl[k] * dr[k] * dw[k]

            if not (claim_expected == claim_last):
                raise ProofVerifyError("product layer claim mismatch")

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                cl[k] + r_layer * (cr[k] - cl[k])
                for k in range(len(cl))
            ]
            if i == num_layers - 1:
                dl, dr, dw = self.claims_dotp
                for k in range(len(claims_dotp_vec) // 2):
                    claims_to_verify_dotp.append(
                        dl[2 * k] + r_layer * (dl[2 * k + 1] - dl[2 * k]))
                    claims_to_verify_dotp.append(
                        dr[2 * k] + r_layer * (dr[2 * k + 1] - dr[2 * k]))
                    claims_to_verify_dotp.append(
                        dw[2 * k] + r_layer * (dw[2 * k + 1] - dw[2 * k]))
            rand = [r_layer] + rand_prod
        return claims_to_verify, claims_to_verify_dotp, rand
