"""DensePolynomialPqx — the fork's data-parallel hypermatrix polynomial.

Reference: src/custom_dense_mlpoly.rs:22 (ragged (p, q_rev, w, x_rev)
storage with zero-skipping binds). TPU-native representation: one DENSE
zero-padded Montgomery limb tensor of shape (P, Q, W, Y, 16), with the q
and y axes stored in bit-reversed index order. Entries outside each
instance's (num_proofs[p], num_inputs[p]) live region are the field zero,
which makes every reference bind rule an ordinary half-tensor fold:

  * the compacted fold `Z[q] += r (Z[q + Q_i/2] - Z[q])` touches dense
    positions q*step and q*step + Q_max/2 — exactly the MSB fold;
  * the `Q_i == 1 => Z *= (1-r)` rule is the MSB fold with a zero high
    half.

So `bound_poly` is a single fused fold kernel regardless of raggedness,
and padded work is reclaimed by XLA vectorization rather than scalar
skipping (SURVEY.md §7.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.field import Scalar
from ..ops import fq, limbs as lb
from ..ops.sumcheck import (
    MODE_P,
    MODE_Q,
    MODE_W,
    MODE_X,
    _fold,
    _split,
    fold_chain,
    rev_perm,
)
from .dense_mlpoly import (
    DensePolynomial,
    log2,
    mont_to_scalar,
    next_pow2,
    scalars_to_mont,
)

_AXIS = {MODE_P: 0, MODE_Q: 1, MODE_W: 2, MODE_X: 3}


class DensePolynomialPqx:
    __slots__ = ("Zm", "num_proofs", "num_inputs")

    def __init__(self, Zm: jnp.ndarray, num_proofs, num_inputs):
        assert Zm.ndim == 5
        self.Zm = Zm
        self.num_proofs = list(num_proofs)
        self.num_inputs = list(num_inputs)

    @property
    def num_instances(self) -> int:
        return self.Zm.shape[0]

    @property
    def max_num_proofs(self) -> int:
        return self.Zm.shape[1]

    @property
    def num_witness_secs(self) -> int:
        return self.Zm.shape[2]

    @property
    def max_num_inputs(self) -> int:
        return self.Zm.shape[3]

    def __len__(self) -> int:
        return self.num_instances * self.max_num_proofs * self.max_num_inputs

    @staticmethod
    def new_rev(z_mat, num_proofs, max_num_proofs, num_inputs,
                max_num_inputs) -> "DensePolynomialPqx":
        """Host nested lists (p, q, w, y) in NATURAL q/y order -> Pqx.

        Mirrors custom_dense_mlpoly.rs:67-113: place value (p, q, w, y) at
        dense storage (p, rev(q), w, rev(y)).
        """
        P = len(z_mat)
        W = next_pow2(max(len(z_mat[p][0]) for p in range(P)))
        Pp = next_pow2(P)
        arr = np.zeros((Pp, max_num_proofs, W, max_num_inputs, 16), np.uint32)
        qp = rev_perm(max_num_proofs)
        yp = rev_perm(max_num_inputs)
        for p in range(P):
            vals = []
            idx = []
            for q in range(len(z_mat[p])):
                for w in range(len(z_mat[p][q])):
                    row = z_mat[p][q][w]
                    for y in range(len(row)):
                        vals.append(int(row[y]))
                        idx.append((qp[q], w, yp[y]))
            if vals:
                enc = lb.ints_to_limbs(vals)  # canonical limbs (host-cheap)
                ii = np.array(idx)
                arr[p, ii[:, 0], ii[:, 1], ii[:, 2]] = enc
        # One device-wide REDC-mul by R^2 Montgomery-scales the whole
        # tensor (zeros stay zero) — avoids O(n) host bigint multiplies.
        return DensePolynomialPqx(fq.from_canonical(jnp.asarray(arr)),
                                  num_proofs, num_inputs)

    @staticmethod
    def from_dense(Zm, num_proofs, num_inputs) -> "DensePolynomialPqx":
        return DensePolynomialPqx(Zm, num_proofs, num_inputs)

    def index(self, p: int, q_rev: int, w: int, x_rev: int) -> Scalar:
        """Storage-order indexing (custom_dense_mlpoly.rs:118-131).

        Note: q_rev/x_rev are COMPACTED storage coordinates in the
        reference; dense position is q_rev * step.
        """
        step_q = self.max_num_proofs // self.num_proofs[p] if p < len(
            self.num_proofs) else 1
        step_x = self.max_num_inputs // self.num_inputs[p] if p < len(
            self.num_inputs) else 1
        return mont_to_scalar(self.Zm[p, q_rev * step_q, w, x_rev * step_x])

    def _bound_vars(self, rs, mode: int) -> None:
        """Bind a list of variables along one axis as ONE device program
        (ops/sumcheck.py fold_chain), then compact with a static slice."""
        if not rs:
            return
        axis = _AXIS[mode]
        k = len(rs)
        full = fold_chain(self.Zm, scalars_to_mont(rs), axis=axis)
        keep = max(1, self.Zm.shape[axis] >> k)
        self.Zm = jax.lax.slice_in_dim(full, 0, keep, axis=axis)
        if mode == MODE_Q:
            self.num_proofs = [max(1, q >> k) for q in self.num_proofs]
        elif mode == MODE_X:
            self.num_inputs = [max(1, x >> k) for x in self.num_inputs]

    def bound_poly(self, r: Scalar, mode: int) -> None:
        self._bound_vars([r], mode)

    def bound_poly_vars_rp(self, r_p) -> None:
        self._bound_vars(list(r_p), MODE_P)

    def bound_poly_vars_rq(self, r_q) -> None:
        self._bound_vars(list(r_q), MODE_Q)

    def bound_poly_vars_rw(self, r_w) -> None:
        self._bound_vars(list(r_w), MODE_W)

    def bound_poly_vars_rx(self, r_x) -> None:
        self._bound_vars(list(r_x), MODE_X)

    def evaluate(self, r_p, r_q, r_w, r_x) -> Scalar:
        cl = DensePolynomialPqx(self.Zm, self.num_proofs, self.num_inputs)
        cl.bound_poly_vars_rx(r_x)
        cl.bound_poly_vars_rw(r_w)
        cl.bound_poly_vars_rq(r_q)
        cl.bound_poly_vars_rp(r_p)
        return mont_to_scalar(cl.Zm[0, 0, 0, 0])

    def to_dense_poly(self) -> DensePolynomial:
        """Flatten to natural (p, q, w, x) order (custom_dense_mlpoly.rs:336)."""
        qp = rev_perm(self.max_num_proofs)
        yp = rev_perm(self.max_num_inputs)
        nat = self.Zm[:, qp][:, :, :, yp]
        return DensePolynomial(nat.reshape(-1, 16))
