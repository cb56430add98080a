"""R1CS instance container: P instances' sparse A/B/C matrices.

Reference: src/r1csinstance.rs:20 (R1CSInstance), src/sparse_mlpoly.rs:33
(SparseMatPolynomial). Matrices live as COO device arrays; the hot ops —
Az/Bz/Cz assembly (multiply_vec_block, r1csinstance.rs:363) and the
phase-2 ABC eval tables (compute_eval_table_sparse_disjoint_rounds,
r1csinstance.rs:484) — run as gather/mul/scatter kernels (ops/spmv.py)
producing the dense bit-reversed Pqx tensors directly.

SPARK commitments to the matrices themselves (multi_commit /
R1CSEvalProof, r1csinstance.rs:654,738) live in models/sparse_mlpoly.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.consts import L
from ..core.field import Scalar
from ..ops import fq, spmv
from ..ops.sumcheck import rev_perm
from .custom_mlpoly import DensePolynomialPqx
from .dense_mlpoly import (
    DensePolynomial,
    EqPolynomial,
    log2,
    mont_to_scalars,
    next_pow2,
)


def _deflate_digest(raw: bytes) -> bytes:
    """Level-6 zlib stream for the instance digest: the native tdefl
    port (native/tdefl.c — the miniz/miniz_oxide algorithm the reference
    uses via flate2) when available, else CPython zlib. PARITY.md D1."""
    import os
    import zlib

    if not os.environ.get("SPARTAN_DIGEST_ZLIB"):
        from ..core import native

        lib = native.get()
        if lib is not None and hasattr(lib, "spartan_tdefl_zlib"):
            import ctypes

            cap = len(raw) + (len(raw) >> 6) + 1024
            out = ctypes.create_string_buffer(cap)
            n = lib.spartan_tdefl_zlib(raw, len(raw), out, cap, 6)
            if n > 0:
                return bytes(out.raw[:n])
    return zlib.compress(raw, 6)


class SparseMatPolynomial:
    """COO sparse multilinear matrix polynomial (sparse_mlpoly.rs:33)."""

    __slots__ = ("num_vars_x", "num_vars_y", "rows", "cols", "vals",
                 "_vals_mont", "_by_row", "_by_col")

    def __init__(self, num_vars_x: int, num_vars_y: int, entries):
        """entries: list of (row, col, value-int-or-Scalar)."""
        self.num_vars_x = num_vars_x
        self.num_vars_y = num_vars_y
        self.rows = np.array([e[0] for e in entries], dtype=np.int32)
        self.cols = np.array([e[1] for e in entries], dtype=np.int32)
        self.vals = [int(e[2]) % L for e in entries]
        # The SpMV / eval-table scatter-adds accumulate raw uint32 limbs,
        # which overflow past 2^16 addends per row/col (ops/spmv.py
        # MAX_ROW_NNZ). Enforce the bound at upload so a pathological
        # matrix fails loudly instead of producing wrong Az/Bz/Cz.
        if len(self.rows):
            assert int(np.bincount(self.rows).max()) <= spmv.MAX_ROW_NNZ, \
                "row nnz exceeds lazy-limb scatter bound (ops/spmv.py)"
            assert int(np.bincount(self.cols).max()) <= spmv.MAX_ROW_NNZ, \
                "col nnz exceeds lazy-limb scatter bound (ops/spmv.py)"
        self._vals_mont = None
        self._by_row = None
        self._by_col = None

    def get_num_nz_entries(self) -> int:
        return len(self.vals)

    def _dev(self):
        """Device arrays in NATURAL entry order (sparse_eval)."""
        if self._vals_mont is None:
            self._vals_mont = (jnp.asarray(self.rows),
                               jnp.asarray(self.cols),
                               jnp.asarray(fq.encode(self.vals)))
        return self._vals_mont

    def _dev_sorted(self, by: str):
        """Device arrays with entries pre-sorted by row ('row') or col
        ('col') — the scatter-free SpMV kernels (ops/spmv.py) reduce
        each output index as a cumsum difference over its contiguous
        segment. The matrix is static, so the sort runs once on host."""
        cache = self._by_row if by == "row" else self._by_col
        if cache is None:
            key = self.rows if by == "row" else self.cols
            perm = np.argsort(key, kind="stable")
            vm = fq.encode(self.vals)
            cache = (jnp.asarray(self.rows[perm]),
                     jnp.asarray(self.cols[perm]),
                     jnp.asarray(vm[perm]))
            if by == "row":
                self._by_row = cache
            else:
                self._by_col = cache
        return cache

    def multiply_vec_batched(self, z, num_rows: int):
        """z: (Q, ncols, 16) Montgomery -> (Q, num_rows, 16) Montgomery."""
        r, c, v = self._dev_sorted("row")
        return spmv.spmv_batched(r, c, v, z, num_rows=num_rows)

    def eval_table(self, rx_tab, num_cols: int):
        """(num_cols, 16) table M^T eq(rx) (sparse_mlpoly.rs:505,524)."""
        r, c, v = self._dev_sorted("col")
        return spmv.eval_table(r, c, v, rx_tab, num_cols=num_cols)

    def evaluate_with_tables_dev(self, rx_tab, ry_tab):
        r, c, v = self._dev()
        return spmv.sparse_eval(r, c, v, rx_tab, ry_tab)

    @staticmethod
    def multi_evaluate(polys, rx, ry):
        """Evaluate each poly at (rx, ry) (sparse_mlpoly.rs:438)."""
        rx_tab = EqPolynomial(list(rx)).evals_dev()
        ry_tab = EqPolynomial(list(ry)).evals_dev()
        outs = [p.evaluate_with_tables_dev(rx_tab, ry_tab) for p in polys]
        return mont_to_scalars(jnp.stack(outs))


class R1CSInstance:
    """P instances of ragged-size R1CS (r1csinstance.rs:20-31)."""

    def __init__(self, num_instances: int, max_num_cons: int, num_cons,
                 num_vars: int, A_list, B_list, C_list):
        assert max_num_cons == next_pow2(max_num_cons)
        for c in num_cons:
            assert c == next_pow2(c) and c <= max_num_cons
        assert num_vars == next_pow2(num_vars)
        assert len(A_list) == len(B_list) == len(C_list)
        self.num_instances = num_instances
        self.max_num_cons = max_num_cons
        self.num_cons = list(num_cons)
        self.num_vars = num_vars
        nx, ny = log2(max_num_cons), log2(num_vars)
        self.A_list = [SparseMatPolynomial(nx, ny, a) for a in A_list]
        self.B_list = [SparseMatPolynomial(nx, ny, b) for b in B_list]
        self.C_list = [SparseMatPolynomial(nx, ny, c) for c in C_list]

    def get_num_instances(self) -> int:
        return self.num_instances

    def get_num_cons(self) -> int:
        return self.max_num_cons

    def get_inst_num_cons(self):
        return self.num_cons

    def get_num_vars(self) -> int:
        return self.num_vars

    def get_digest(self) -> bytes:
        """zlib(bincode(self)) — byte-layout of r1csinstance.rs:218-222.

        bincode 1.x default config: usize as u64 LE, Vec with u64 LE
        length prefix, [u64;4] Scalar as 32 raw bytes of the MONTGOMERY
        limbs (serde derives on Scalar's internal representation,
        ristretto255.rs:199). Compression: the reference compresses with
        flate2's rust_backend = miniz_oxide at Compression::default()
        (level 6); we compress with the tdefl-algorithm port in
        native/tdefl.c (the same algorithm family miniz_oxide implements)
        — PARITY.md D1 documents the residual port-fidelity risk. Set
        SPARTAN_DIGEST_ZLIB=1 to use CPython's madler zlib instead (the
        round-1/2 behavior)."""
        import struct
        import zlib

        if getattr(self, "_digest", None) is not None:
            return self._digest

        from ..ops import limbs as lb

        parts = []

        def u64(v):
            parts.append(struct.pack("<Q", v))

        u64(self.num_instances)
        u64(self.max_num_cons)
        u64(len(self.num_cons))
        for c in self.num_cons:
            u64(c)
        u64(self.num_vars)
        R256 = 1 << 256
        for mats in (self.A_list, self.B_list, self.C_list):
            u64(len(mats))
            for m in mats:
                u64(m.num_vars_x)
                u64(m.num_vars_y)
                u64(len(m.vals))
                # Vectorized entry serialization: the per-entry Python
                # loop cost ~10 s at 3*2^20 nnz. Each entry is
                # (u64 row, u64 col, 32B Montgomery-limb scalar LE).
                n = len(m.vals)
                ent = np.zeros((n, 48), dtype=np.uint8)
                ent[:, 0:8] = m.rows.astype("<u8").view(np.uint8) \
                    .reshape(n, 8)
                ent[:, 8:16] = m.cols.astype("<u8").view(np.uint8) \
                    .reshape(n, 8)
                mont = (np.array(m.vals, dtype=object) * R256) % L
                ent[:, 16:48] = lb.ints_to_limbs(list(mont)) \
                    .astype("<u2").view(np.uint8).reshape(n, 32)
                parts.append(ent.tobytes())
        raw = b"".join(parts)
        self._digest = _deflate_digest(raw)
        return self._digest

    # --- Az/Bz/Cz (r1csinstance.rs:363-438) -------------------------------
    def multiply_vec_block(self, num_instances, num_proofs, max_num_proofs,
                           num_inputs, max_num_inputs, max_num_cons,
                           num_cons, z_nat):
        """z_nat: (P, Q_max, W, Y_max, 16) Montgomery, natural q/y order.

        Returns (Az, Bz, Cz) as DensePolynomialPqx with W = 1.
        """
        assert self.num_instances in (1, num_instances)
        assert max_num_cons == self.max_num_cons
        P = next_pow2(num_instances)
        out = [
            jnp.zeros((P, max_num_proofs, 1, max_num_cons, 16), jnp.uint32)
            for _ in range(3)
        ]
        for p in range(num_instances):
            p_inst = 0 if self.num_instances == 1 else p
            qp = num_proofs[p]
            zp = z_nat[p, :qp].reshape(qp, -1, 16)
            for k, mats in enumerate((self.A_list, self.B_list, self.C_list)):
                mz = mats[p_inst].multiply_vec_batched(zp, max_num_cons)
                out[k] = out[k].at[p, :qp, 0].set(mz)
        qperm = rev_perm(max_num_proofs)
        xperm = rev_perm(max_num_cons)
        res = []
        for k in range(3):
            arr = out[k][:, qperm][:, :, :, xperm]
            res.append(
                DensePolynomialPqx(arr, list(num_proofs), list(num_cons))
            )
        return tuple(res)

    def multiply_vec_block_classed(self, p0: int, num_proofs_c: int,
                                   max_num_cons: int, z_nat_c):
        """Az/Bz/Cz for ONE q-size class of instances.

        z_nat_c: (P_c, Q_c, W, Y, 16) natural-order class slice of z.
        Returns three (P_c, Q_c, X, 16) tensors with q bit-reversed
        WITHIN the class and x bit-reversed (the class layout of
        ops/sumcheck.py pc_* kernels). No p padding — classes never
        fold p before the merge."""
        P_c, Q_c = int(z_nat_c.shape[0]), int(z_nat_c.shape[1])
        assert num_proofs_c == Q_c
        out = [
            jnp.zeros((P_c, Q_c, max_num_cons, 16), jnp.uint32)
            for _ in range(3)
        ]
        for i in range(P_c):
            p_inst = 0 if self.num_instances == 1 else p0 + i
            zp = z_nat_c[i].reshape(Q_c, -1, 16)
            for k, mats in enumerate(
                    (self.A_list, self.B_list, self.C_list)):
                mz = mats[p_inst].multiply_vec_batched(zp, max_num_cons)
                out[k] = out[k].at[i].set(mz)
        qperm = rev_perm(Q_c)
        xperm = rev_perm(max_num_cons)
        return tuple(out[k][:, qperm][:, :, xperm] for k in range(3))

    # --- phase-2 ABC tables (r1csinstance.rs:484-540) ----------------------
    def compute_eval_table_sparse_disjoint_rounds(
            self, num_instances, num_rows, num_segs, max_num_cols, num_cols,
            rx_tab):
        """rx_tab: (max_num_cons, 16) device eq-table over natural rows.

        Returns per-instance (A_tab, B_tab, C_tab) device arrays of shape
        (num_segs, max_num_cols, 16) in NATURAL y order.
        """
        assert self.num_instances in (1, num_instances)
        assert num_segs * max_num_cols == self.num_vars or \
            next_pow2(num_segs) * max_num_cols == self.num_vars
        out = []
        ncols = next_pow2(num_segs) * max_num_cols
        for p in range(self.num_instances):
            tabs = []
            for mats in (self.A_list, self.B_list, self.C_list):
                t = mats[p].eval_table(rx_tab, ncols)
                tabs.append(t.reshape(next_pow2(num_segs), max_num_cols, 16))
            out.append(tuple(tabs))
        return out

    # --- verifier-side matrix evaluations (r1csinstance.rs:583-652) -------
    def multi_evaluate(self, rx, ry):
        evals = []
        for p in range(self.num_instances):
            evals.extend(SparseMatPolynomial.multi_evaluate(
                [self.A_list[p], self.B_list[p], self.C_list[p]], rx, ry))
        return evals

    def multi_evaluate_bound_rp(self, rp, rx, ry):
        eval_list = self.multi_evaluate(rx, ry)
        a = [eval_list[3 * p] for p in range(self.num_instances)]
        b = [eval_list[3 * p + 1] for p in range(self.num_instances)]
        c = [eval_list[3 * p + 2] for p in range(self.num_instances)]
        bound = tuple(
            DensePolynomial.from_scalars(v).evaluate(rp) for v in (a, b, c)
        )
        return eval_list, bound

    def evaluate(self, rx, ry):
        assert self.num_instances == 1
        e = self.multi_evaluate(rx, ry)
        return e[0], e[1], e[2]


class R1CSCommitmentGens:
    """SPARK gens sized to the instance set (r1csinstance.rs:34-57)."""

    __slots__ = ("gens",)

    def __init__(self, label: bytes, num_instances: int, num_cons: int,
                 num_vars: int, num_nz_entries: int):
        from .sparse_mlpoly import SparseMatPolyCommitmentGens

        # reference: num_instances.log_2() + num_cons.log_2()
        # (Math::log_2 is ceil for non-powers of two, math.rs:13-21)
        num_poly_vars_x = log2(next_pow2(num_instances)) + \
            log2(next_pow2(num_cons))
        num_poly_vars_y = log2(num_vars)
        self.gens = SparseMatPolyCommitmentGens(
            label, num_poly_vars_x, num_poly_vars_y,
            num_instances * num_nz_entries, 3)


class R1CSCommitment:
    __slots__ = ("num_cons", "num_vars", "comm")

    def __init__(self, num_cons, num_vars, comm):
        self.num_cons = num_cons
        self.num_vars = num_vars
        self.comm = comm

    def get_num_cons(self):
        return self.num_cons

    def get_num_vars(self):
        return self.num_vars

    def append_to_transcript(self, _label: bytes, transcript):
        transcript.append_u64(b"num_cons", self.num_cons)
        transcript.append_u64(b"num_vars", self.num_vars)
        self.comm.append_to_transcript(b"comm", transcript)


class R1CSDecommitment:
    __slots__ = ("dense",)

    def __init__(self, dense):
        self.dense = dense


def next_power_of_eight(val: int) -> int:
    base = 1
    while base < val:
        base *= 8
    return base


def _multi_commit_group(inst, gens):
    """Group A/B/C polys into buckets by next-power-of-8 nnz
    (r1csinstance.rs:646-714)."""
    from . import sparse_mlpoly as sp

    nnz_size = {}
    label_map = []
    sparse_polys_list = []
    for i in range(inst.num_instances):
        for k, mats in enumerate((inst.A_list, inst.B_list, inst.C_list)):
            m = mats[i]
            length = next_power_of_eight(next_pow2(max(
                1, m.get_num_nz_entries())))
            if length in nnz_size:
                idx = nnz_size[length]
                label_map[idx].append(3 * i + k)
                sparse_polys_list[idx].append(m)
            else:
                nnz_size[length] = len(sparse_polys_list)
                label_map.append([3 * i + k])
                sparse_polys_list.append([m])

    comm_list, decomm_list = [], []
    for polys in sparse_polys_list:
        comm, dense = sp.multi_commit(polys, gens.gens)
        comm_list.append(R1CSCommitment(
            inst.num_instances * inst.max_num_cons, inst.num_vars, comm))
        decomm_list.append(R1CSDecommitment(dense))
    return label_map, comm_list, decomm_list


def r1cs_multi_commit(inst, gens):
    return _multi_commit_group(inst, gens)


def r1cs_commit(inst, gens):
    """Single joint commitment to all matrices (r1csinstance.rs:717-736)."""
    from . import sparse_mlpoly as sp

    polys = []
    for i in range(inst.num_instances):
        polys += [inst.A_list[i], inst.B_list[i], inst.C_list[i]]
    comm, dense = sp.multi_commit(polys, gens.gens)
    return (R1CSCommitment(inst.num_instances * inst.max_num_cons,
                           inst.num_vars, comm),
            R1CSDecommitment(dense))


class R1CSEvalProof:
    """Wraps SPARK's SparseMatPolyEvalProof (r1csinstance.rs:738-780)."""

    __slots__ = ("proof",)

    def __init__(self, proof):
        self.proof = proof

    @staticmethod
    def prove(decomm: R1CSDecommitment, rx, ry, evals, gens, transcript,
              random_tape):
        from . import sparse_mlpoly as sp
        from ..utils.timer import Timer

        timer = Timer("R1CSEvalProof::prove")
        proof = sp.SparseMatPolyEvalProof.prove(
            decomm.dense, rx, ry, evals, gens.gens, transcript, random_tape)
        timer.stop()
        return R1CSEvalProof(proof)

    def verify(self, comm: R1CSCommitment, rx, ry, evals, gens, transcript):
        self.proof.verify(comm.comm, rx, ry, evals, gens.gens, transcript)


def produce_synthetic_r1cs(num_instances: int, num_proofs, num_cons: int,
                           num_vars: int, num_inputs: int, seed: int = 0):
    """Random satisfiable data-parallel R1CS for tests/benches.

    Column space is [vars | 1, inputs, 0...] (two witness sections of
    num_vars columns each), mirroring upstream's z = [vars, 1, io] layout
    (reference r1csinstance.rs:225-320, commented produce_synthetic_r1cs).
    Each constraint row i with k = i % (num_vars/2) is either
      u_k * u_{k+1} = v_k        (vars-only product gate)
      u_k * 1       = input_k    (io binding gate, every 3rd row)
    which any random u satisfies with v/inputs derived from u — so every
    proof q gets an independent random witness for the same matrices.

    Returns (inst, vars_mat, inputs_mat) with host-int witnesses
    vars_mat[p][q] (len num_vars) and inputs_mat[p][q] (len num_inputs).
    The instance's column space is 2 * num_vars (two witness sections), as
    the fork's R1CSInstance always spans all witness sections.
    """
    rng = np.random.default_rng(seed)
    h = num_vars // 2
    one_col = num_vars
    A_list, B_list, C_list = [], [], []
    for _ in range(num_instances):
        A, B, C = [], [], []
        for i in range(num_cons):
            k = i % h
            if i % 3 == 2 and k < num_inputs:
                A.append((i, k, 1))
                B.append((i, one_col, 1))
                C.append((i, one_col + 1 + k, 1))
            else:
                A.append((i, k, 1))
                B.append((i, (k + 1) % h, 1))
                C.append((i, h + k, 1))
        A_list.append(A)
        B_list.append(B)
        C_list.append(C)
    inst = R1CSInstance(num_instances, num_cons, [num_cons] * num_instances,
                        2 * num_vars, A_list, B_list, C_list)

    def rand_scalar():
        return int.from_bytes(rng.bytes(40), "little") % L

    vars_mat, inputs_mat = [], []
    for p in range(num_instances):
        vars_mat.append([])
        inputs_mat.append([])
        for _ in range(num_proofs[p]):
            u = [rand_scalar() for _ in range(h)]
            v = [u[k] * u[(k + 1) % h] % L for k in range(h)]
            io = [u[k] for k in range(num_inputs)]
            vars_mat[p].append(u + v)
            inputs_mat[p].append(io)
    return inst, vars_mat, inputs_mat
