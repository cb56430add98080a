"""SPARK: commitment + evaluation argument for the sparse R1CS matrices.

Reference: src/sparse_mlpoly.rs — offline memory checking over the COO
representation (AddrTimestamps :212, Derefs :39, hash layer :560, batched
grand products ProductLayerProof :1105, HashLayerProof :766, top level
SparseMatPolyEvalProof :1469).

TPU mapping:
  * timestamp generation is a vectorized numpy group-rank (the reference's
    sequential address walk, sparse_mlpoly.rs:225-244, is a per-address
    occurrence count — order within the COO list only matters per equal
    address, which cumcount preserves);
  * deref/hash layers are device gathers + fused elementwise field ops;
  * the layered product argument runs on stacked (B, n, 16) tensors
    (models/product_tree.py);
  * all openings reuse the device Hyrax PCS (models/dense_mlpoly.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.field import Scalar
from ..ops import fq
from ..utils.errors import ProofVerifyError
from ..utils.timer import Timer
from .dense_mlpoly import (
    DensePolynomial,
    EqPolynomial,
    IdentityPolynomial,
    PolyCommitmentGens,
    PolyEvalProof,
    log2,
    mont_to_scalar,
    mont_to_scalars,
    next_pow2,
    scalars_to_mont,
)
from .commitments import commit_scalar
from .product_tree import (
    DotProductCircuit,
    ProductCircuit,
    ProductCircuitEvalProofBatched,
)

_ZERO = Scalar.zero()
_ONE = Scalar.one()


def _u64s_to_mont(arr: np.ndarray) -> jnp.ndarray:
    """numpy uint64 array -> (n, 16) device Montgomery limbs."""
    arr = np.asarray(arr, dtype=np.uint64)
    limbs = np.zeros(arr.shape + (16,), np.uint32)
    for i in range(4):
        limbs[..., i] = (arr >> np.uint64(16 * i)) & np.uint64(0xFFFF)
    return fq.from_canonical(jnp.asarray(limbs))


def _cumcount(addr: np.ndarray, base: np.ndarray) -> np.ndarray:
    """read_ts[i] = base[addr[i]] + (# of j < i with addr[j] == addr[i])."""
    n = len(addr)
    order = np.argsort(addr, kind="stable")
    sa = addr[order]
    idx = np.arange(n)
    starts = np.ones(n, bool)
    starts[1:] = sa[1:] != sa[:-1]
    group_start = np.maximum.accumulate(np.where(starts, idx, 0))
    rank = idx - group_start
    out = np.empty(n, np.int64)
    out[order] = rank
    return out + base[addr]


class AddrTimestamps:
    """Read/audit timestamps for offline memory checking
    (sparse_mlpoly.rs:212-271)."""

    __slots__ = ("ops_addr_usize", "ops_addr", "read_ts", "audit_ts",
                 "audit_ts_np")

    def __init__(self, num_cells: int, num_ops: int, ops_addr):
        base = np.zeros(num_cells, np.int64)
        self.ops_addr_usize = []
        self.ops_addr = []
        self.read_ts = []
        for inst in ops_addr:
            a = np.asarray(inst, np.int64)
            assert len(a) == num_ops and a.max(initial=0) < num_cells
            rts = _cumcount(a, base)
            np.add.at(base, a, 1)
            self.ops_addr_usize.append(a)
            self.ops_addr.append(DensePolynomial(_u64s_to_mont(a)))
            self.read_ts.append(DensePolynomial(_u64s_to_mont(rts)))
        self.audit_ts_np = base
        self.audit_ts = DensePolynomial(_u64s_to_mont(base))

    def deref(self, mem_val_dev: jnp.ndarray):
        """mem_val_dev: (num_cells, 16) Montgomery eq-table."""
        return [
            DensePolynomial(jnp.take(mem_val_dev, jnp.asarray(a), axis=0))
            for a in self.ops_addr_usize
        ]


class Derefs:
    __slots__ = ("row_ops_val", "col_ops_val", "comb")

    def __init__(self, row_ops_val, col_ops_val):
        assert len(row_ops_val) == len(col_ops_val)
        self.row_ops_val = row_ops_val
        self.col_ops_val = col_ops_val
        self.comb = DensePolynomial.merge(row_ops_val + col_ops_val)

    def commit(self, gens: PolyCommitmentGens) -> "DerefsCommitment":
        comm, _ = self.comb.commit(gens, None)
        return DerefsCommitment(comm)


class DerefsCommitment:
    __slots__ = ("comm_ops_val",)

    def __init__(self, comm_ops_val):
        self.comm_ops_val = comm_ops_val

    def append_to_transcript(self, label: bytes, transcript):
        transcript.append_message(b"derefs_commitment",
                                  b"begin_derefs_commitment")
        self.comm_ops_val.append_to_transcript(label, transcript)
        transcript.append_message(b"derefs_commitment",
                                  b"end_derefs_commitment")


def _n_to_1_reduce(evals, r, transcript, label_evals: bytes,
                   label_eval: bytes):
    """Common n-to-1 RLC reduction (sparse_mlpoly.rs:91-110)."""
    transcript.append_scalar_vector(label_evals, evals)
    challenges = transcript.challenge_vector(
        b"challenge_combine_n_to_one", log2(len(evals)))
    poly_evals = DensePolynomial.from_scalars(evals)
    for c in reversed(challenges):
        poly_evals.bound_poly_var_bot(c)
    joint = poly_evals[0]
    r_joint = challenges + list(r)
    transcript.append_scalar(label_eval, joint)
    return r_joint, joint


class DerefsEvalProof:
    __slots__ = ("proof_derefs",)

    def __init__(self, proof_derefs):
        self.proof_derefs = proof_derefs

    @staticmethod
    def protocol_name() -> bytes:
        return b"Derefs evaluation proof"

    @staticmethod
    def _prove_single(joint_poly, r, evals, gens, transcript, random_tape):
        assert joint_poly.get_num_vars() == len(r) + log2(len(evals))
        r_joint, joint = _n_to_1_reduce(
            evals, r, transcript, b"evals_ops_val", b"joint_claim_eval")
        proof, _ = PolyEvalProof.prove(joint_poly, None, r_joint, joint,
                                       None, gens, transcript, random_tape)
        return proof

    @staticmethod
    def prove(derefs: Derefs, eval_row_ops_val, eval_col_ops_val, r, gens,
              transcript, random_tape):
        transcript.append_protocol_name(DerefsEvalProof.protocol_name())
        evals = list(eval_row_ops_val) + list(eval_col_ops_val)
        evals += [_ZERO] * (next_pow2(len(evals)) - len(evals))
        return DerefsEvalProof(DerefsEvalProof._prove_single(
            derefs.comb, r, evals, gens, transcript, random_tape))

    @staticmethod
    def _verify_single(proof, comm, r, evals, gens, transcript):
        r_joint, joint = _n_to_1_reduce(
            evals, r, transcript, b"evals_ops_val", b"joint_claim_eval")
        proof.verify_plain(gens, transcript, r_joint, joint, comm)

    def verify(self, r, eval_row_ops_val, eval_col_ops_val, gens,
               comm: DerefsCommitment, transcript):
        transcript.append_protocol_name(DerefsEvalProof.protocol_name())
        evals = list(eval_row_ops_val) + list(eval_col_ops_val)
        evals += [_ZERO] * (next_pow2(len(evals)) - len(evals))
        DerefsEvalProof._verify_single(
            self.proof_derefs, comm.comm_ops_val, r, evals, gens, transcript)


class MultiSparseMatPolynomialAsDense:
    __slots__ = ("batch_size", "val", "row", "col", "comb_ops", "comb_mem")

    def __init__(self, batch_size, val, row, col, comb_ops, comb_mem):
        self.batch_size = batch_size
        self.val = val
        self.row = row
        self.col = col
        self.comb_ops = comb_ops
        self.comb_mem = comb_mem

    def deref(self, row_mem_val, col_mem_val) -> Derefs:
        return Derefs(self.row.deref(row_mem_val),
                      self.col.deref(col_mem_val))


class SparseMatPolyCommitmentGens:
    __slots__ = ("gens_ops", "gens_mem", "gens_derefs")

    def __init__(self, label: bytes, num_vars_x: int, num_vars_y: int,
                 num_nz_entries: int, batch_size: int):
        num_vars_ops = log2(next_pow2(num_nz_entries)) + \
            log2(next_pow2(batch_size * 5))
        num_vars_mem = max(num_vars_x, num_vars_y) + 1
        num_vars_derefs = log2(next_pow2(num_nz_entries)) + \
            log2(next_pow2(batch_size * 2))
        self.gens_ops = PolyCommitmentGens(num_vars_ops, label)
        self.gens_mem = PolyCommitmentGens(num_vars_mem, label)
        self.gens_derefs = PolyCommitmentGens(num_vars_derefs, label)


class SparseMatPolyCommitment:
    __slots__ = ("batch_size", "num_ops", "num_mem_cells", "comm_comb_ops",
                 "comm_comb_mem")

    def __init__(self, batch_size, num_ops, num_mem_cells, comm_comb_ops,
                 comm_comb_mem):
        self.batch_size = batch_size
        self.num_ops = num_ops
        self.num_mem_cells = num_mem_cells
        self.comm_comb_ops = comm_comb_ops
        self.comm_comb_mem = comm_comb_mem

    def append_to_transcript(self, _label: bytes, transcript):
        transcript.append_u64(b"batch_size", self.batch_size)
        transcript.append_u64(b"num_ops", self.num_ops)
        transcript.append_u64(b"num_mem_cells", self.num_mem_cells)
        self.comm_comb_ops.append_to_transcript(b"comm_comb_ops", transcript)
        self.comm_comb_mem.append_to_transcript(b"comm_comb_mem", transcript)


def multi_sparse_to_dense_rep(sparse_polys):
    """sparse_polys: list of models.r1csinstance.SparseMatPolynomial."""
    assert sparse_polys
    nvx = sparse_polys[0].num_vars_x
    nvy = sparse_polys[0].num_vars_y
    for p in sparse_polys[1:]:
        assert p.num_vars_x == nvx and p.num_vars_y == nvy
    N = max(next_pow2(max(1, p.get_num_nz_entries())) for p in sparse_polys)

    ops_row_vec, ops_col_vec, val_vec = [], [], []
    for p in sparse_polys:
        row = np.zeros(N, np.int64)
        col = np.zeros(N, np.int64)
        row[: len(p.rows)] = p.rows
        col[: len(p.cols)] = p.cols
        vals = list(p.vals) + [0] * (N - len(p.vals))
        ops_row_vec.append(row)
        ops_col_vec.append(col)
        val_vec.append(DensePolynomial(jnp.asarray(fq.encode(vals))))

    num_mem_cells = 1 << max(nvx, nvy)
    row = AddrTimestamps(num_mem_cells, N, ops_row_vec)
    col = AddrTimestamps(num_mem_cells, N, ops_col_vec)

    comb_ops = DensePolynomial.merge(
        row.ops_addr + row.read_ts + col.ops_addr + col.read_ts + val_vec)
    comb_mem = DensePolynomial.merge([row.audit_ts, col.audit_ts])
    return MultiSparseMatPolynomialAsDense(
        len(sparse_polys), val_vec, row, col, comb_ops, comb_mem)


def multi_commit(sparse_polys, gens: SparseMatPolyCommitmentGens):
    dense = multi_sparse_to_dense_rep(sparse_polys)
    comm_comb_ops, _ = dense.comb_ops.commit(gens.gens_ops, None)
    comm_comb_mem, _ = dense.comb_mem.commit(gens.gens_mem, None)
    return (
        SparseMatPolyCommitment(
            dense.batch_size, len(dense.row.read_ts[0]),
            len(dense.row.audit_ts), comm_comb_ops, comm_comb_mem),
        dense,
    )


# --------------------------------------------------------------------------
# Hash layer (device): hash(addr, val, ts) = ts r^2 + val r + addr - rm
# --------------------------------------------------------------------------
def _hash_poly(addr_m, val_m, ts_m, r_hash_sqr_m, r_hash_m, rm_m):
    h = fq.add(fq.mul(ts_m, jnp.broadcast_to(r_hash_sqr_m, ts_m.shape)),
               fq.mul(val_m, jnp.broadcast_to(r_hash_m, val_m.shape)))
    h = fq.add(h, addr_m)
    return fq.sub(h, jnp.broadcast_to(rm_m, h.shape))


class ProductLayer:
    __slots__ = ("init", "read_vec", "write_vec", "audit")

    def __init__(self, init, read_vec, write_vec, audit):
        self.init = init
        self.read_vec = read_vec
        self.write_vec = write_vec
        self.audit = audit


class Layers:
    __slots__ = ("prod_layer",)

    def __init__(self, eval_table_dev, addr_timestamps: AddrTimestamps,
                 poly_ops_val, r_mem_check):
        r_hash, r_multiset_check = r_mem_check
        rh = scalars_to_mont([r_hash])[0]
        rh2 = scalars_to_mont([r_hash * r_hash])[0]
        rm = scalars_to_mont([r_multiset_check])[0]

        num_mem_cells = eval_table_dev.shape[0]
        ident = _u64s_to_mont(np.arange(num_mem_cells, dtype=np.uint64))
        zero_ts = jnp.zeros((num_mem_cells, 16), jnp.uint32)
        init_h = _hash_poly(ident, eval_table_dev, zero_ts, rh2, rh, rm)
        audit_h = _hash_poly(ident, eval_table_dev,
                             addr_timestamps.audit_ts.Zm, rh2, rh, rm)
        one_m = jnp.asarray(fq.ONE_MONT, jnp.uint32)

        read_vec, write_vec = [], []
        for i in range(len(addr_timestamps.ops_addr)):
            addr = addr_timestamps.ops_addr[i].Zm
            dref = poly_ops_val[i].Zm
            rts = addr_timestamps.read_ts[i].Zm
            wts = fq.add(rts, jnp.broadcast_to(one_m, rts.shape))
            read_vec.append(ProductCircuit(DensePolynomial(
                _hash_poly(addr, dref, rts, rh2, rh, rm))))
            write_vec.append(ProductCircuit(DensePolynomial(
                _hash_poly(addr, dref, wts, rh2, rh, rm))))

        self.prod_layer = ProductLayer(
            ProductCircuit(DensePolynomial(init_h)), read_vec, write_vec,
            ProductCircuit(DensePolynomial(audit_h)))


class PolyEvalNetwork:
    __slots__ = ("row_layers", "col_layers")

    def __init__(self, dense, derefs, mem_rx_dev, mem_ry_dev, r_mem_check):
        self.row_layers = Layers(mem_rx_dev, dense.row, derefs.row_ops_val,
                                 r_mem_check)
        self.col_layers = Layers(mem_ry_dev, dense.col, derefs.col_ops_val,
                                 r_mem_check)


class HashLayerProof:
    __slots__ = ("eval_row", "eval_col", "eval_val", "eval_derefs",
                 "proof_ops", "proof_mem", "proof_derefs")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    @staticmethod
    def protocol_name() -> bytes:
        return b"Sparse polynomial hash layer proof"

    @staticmethod
    def _prove_helper(rand_mem, rand_ops, at: AddrTimestamps):
        eval_addr = [a.evaluate(rand_ops) for a in at.ops_addr]
        eval_read = [t.evaluate(rand_ops) for t in at.read_ts]
        eval_audit = at.audit_ts.evaluate(rand_mem)
        return eval_addr, eval_read, eval_audit

    @staticmethod
    def prove(rand, dense, derefs, gens, transcript, random_tape):
        transcript.append_protocol_name(HashLayerProof.protocol_name())
        rand_mem, rand_ops = rand

        eval_row_ops_val = [p.evaluate(rand_ops) for p in derefs.row_ops_val]
        eval_col_ops_val = [p.evaluate(rand_ops) for p in derefs.col_ops_val]
        proof_derefs = DerefsEvalProof.prove(
            derefs, eval_row_ops_val, eval_col_ops_val, rand_ops,
            gens.gens_derefs, transcript, random_tape)
        eval_derefs = (eval_row_ops_val, eval_col_ops_val)

        (eval_row_addr, eval_row_read_ts,
         eval_row_audit_ts) = HashLayerProof._prove_helper(
            rand_mem, rand_ops, dense.row)
        (eval_col_addr, eval_col_read_ts,
         eval_col_audit_ts) = HashLayerProof._prove_helper(
            rand_mem, rand_ops, dense.col)
        eval_val_vec = [v.evaluate(rand_ops) for v in dense.val]

        evals_ops = (eval_row_addr + eval_row_read_ts + eval_col_addr +
                     eval_col_read_ts + eval_val_vec)
        evals_ops += [_ZERO] * (next_pow2(len(evals_ops)) - len(evals_ops))
        r_joint_ops, joint_ops = _n_to_1_reduce(
            evals_ops, rand_ops, transcript, b"claim_evals_ops",
            b"joint_claim_eval_ops")
        proof_ops, _ = PolyEvalProof.prove(
            dense.comb_ops, None, r_joint_ops, joint_ops, None,
            gens.gens_ops, transcript, random_tape)

        evals_mem = [eval_row_audit_ts, eval_col_audit_ts]
        transcript.append_scalar_vector(b"claim_evals_mem", evals_mem)
        challenges_mem = transcript.challenge_vector(
            b"challenge_combine_two_to_one", 1)
        poly_evals_mem = DensePolynomial.from_scalars(evals_mem)
        poly_evals_mem.bound_poly_var_bot(challenges_mem[0])
        joint_mem = poly_evals_mem[0]
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_mem)
        proof_mem, _ = PolyEvalProof.prove(
            dense.comb_mem, None, r_joint_mem, joint_mem, None,
            gens.gens_mem, transcript, random_tape)

        return HashLayerProof(
            eval_row=(eval_row_addr, eval_row_read_ts, eval_row_audit_ts),
            eval_col=(eval_col_addr, eval_col_read_ts, eval_col_audit_ts),
            eval_val=eval_val_vec,
            eval_derefs=eval_derefs,
            proof_ops=proof_ops,
            proof_mem=proof_mem,
            proof_derefs=proof_derefs,
        )

    @staticmethod
    def _verify_helper(rand_mem, claims, eval_ops_val, eval_ops_addr,
                       eval_read_ts, eval_audit_ts, r, r_hash,
                       r_multiset_check):
        def hash_func(addr, val, ts):
            return ts * (r_hash * r_hash) + val * r_hash + addr

        claim_init, claim_read, claim_write, claim_audit = claims
        eval_init_addr = IdentityPolynomial(len(rand_mem)).evaluate(rand_mem)
        eval_init_val = EqPolynomial(list(r)).evaluate(rand_mem)
        if not (hash_func(eval_init_addr, eval_init_val, _ZERO) -
                r_multiset_check == claim_init):
            raise ProofVerifyError("hash layer init claim")
        for i in range(len(eval_ops_addr)):
            if not (hash_func(eval_ops_addr[i], eval_ops_val[i],
                              eval_read_ts[i]) - r_multiset_check ==
                    claim_read[i]):
                raise ProofVerifyError("hash layer read claim")
            if not (hash_func(eval_ops_addr[i], eval_ops_val[i],
                              eval_read_ts[i] + _ONE) - r_multiset_check ==
                    claim_write[i]):
                raise ProofVerifyError("hash layer write claim")
        if not (hash_func(eval_init_addr, eval_init_val, eval_audit_ts) -
                r_multiset_check == claim_audit):
            raise ProofVerifyError("hash layer audit claim")

    def verify(self, rand, claims_row, claims_col, claims_dotp, comm, gens,
               comm_derefs, rx, ry, r_hash, r_multiset_check, transcript):
        timer = Timer("verify_hash_proof")
        transcript.append_protocol_name(HashLayerProof.protocol_name())
        rand_mem, rand_ops = rand

        eval_row_ops_val, eval_col_ops_val = self.eval_derefs
        assert len(eval_row_ops_val) == len(eval_col_ops_val)
        self.proof_derefs.verify(rand_ops, eval_row_ops_val,
                                 eval_col_ops_val, gens.gens_derefs,
                                 comm_derefs, transcript)

        eval_val_vec = self.eval_val
        assert len(claims_dotp) == 3 * len(eval_row_ops_val)
        for i in range(len(claims_dotp) // 3):
            if not (claims_dotp[3 * i] == eval_row_ops_val[i] and
                    claims_dotp[3 * i + 1] == eval_col_ops_val[i] and
                    claims_dotp[3 * i + 2] == eval_val_vec[i]):
                raise ProofVerifyError("dotp claims mismatch")

        eval_row_addr, eval_row_read_ts, eval_row_audit_ts = self.eval_row
        eval_col_addr, eval_col_read_ts, eval_col_audit_ts = self.eval_col

        evals_ops = (list(eval_row_addr) + list(eval_row_read_ts) +
                     list(eval_col_addr) + list(eval_col_read_ts) +
                     list(eval_val_vec))
        evals_ops += [_ZERO] * (next_pow2(len(evals_ops)) - len(evals_ops))
        r_joint_ops, joint_ops = _n_to_1_reduce(
            evals_ops, rand_ops, transcript, b"claim_evals_ops",
            b"joint_claim_eval_ops")
        self.proof_ops.verify_plain(gens.gens_ops, transcript, r_joint_ops,
                                    joint_ops, comm.comm_comb_ops)

        evals_mem = [eval_row_audit_ts, eval_col_audit_ts]
        transcript.append_scalar_vector(b"claim_evals_mem", evals_mem)
        challenges_mem = transcript.challenge_vector(
            b"challenge_combine_two_to_one", 1)
        poly_evals_mem = DensePolynomial.from_scalars(evals_mem)
        poly_evals_mem.bound_poly_var_bot(challenges_mem[0])
        joint_mem = poly_evals_mem[0]
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_mem)
        self.proof_mem.verify_plain(gens.gens_mem, transcript, r_joint_mem,
                                    joint_mem, comm.comm_comb_mem)

        HashLayerProof._verify_helper(
            rand_mem, claims_row, eval_row_ops_val, eval_row_addr,
            eval_row_read_ts, eval_row_audit_ts, rx, r_hash,
            r_multiset_check)
        HashLayerProof._verify_helper(
            rand_mem, claims_col, eval_col_ops_val, eval_col_addr,
            eval_col_read_ts, eval_col_audit_ts, ry, r_hash,
            r_multiset_check)
        timer.stop()


class ProductLayerProof:
    __slots__ = ("eval_row", "eval_col", "eval_val", "proof_mem",
                 "proof_ops")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    @staticmethod
    def protocol_name() -> bytes:
        return b"Sparse polynomial product layer proof"

    @staticmethod
    def prove(row_prod_layer, col_prod_layer, dense, derefs, evals,
              transcript):
        transcript.append_protocol_name(ProductLayerProof.protocol_name())

        def layer_evals(layer):
            init = layer.init.evaluate()
            audit = layer.audit.evaluate()
            read = [c.evaluate() for c in layer.read_vec]
            write = [c.evaluate() for c in layer.write_vec]
            return init, read, write, audit

        row_init, row_read, row_write, row_audit = layer_evals(
            row_prod_layer)
        ws = _ONE
        for w in row_write:
            ws = ws * w
        rs = _ONE
        for r_ in row_read:
            rs = rs * r_
        assert row_init * ws == rs * row_audit
        transcript.append_scalar(b"claim_row_eval_init", row_init)
        transcript.append_scalar_vector(b"claim_row_eval_read", row_read)
        transcript.append_scalar_vector(b"claim_row_eval_write", row_write)
        transcript.append_scalar(b"claim_row_eval_audit", row_audit)

        col_init, col_read, col_write, col_audit = layer_evals(
            col_prod_layer)
        ws = _ONE
        for w in col_write:
            ws = ws * w
        rs = _ONE
        for r_ in col_read:
            rs = rs * r_
        assert col_init * ws == rs * col_audit
        transcript.append_scalar(b"claim_col_eval_init", col_init)
        transcript.append_scalar_vector(b"claim_col_eval_read", col_read)
        transcript.append_scalar_vector(b"claim_col_eval_write", col_write)
        transcript.append_scalar(b"claim_col_eval_audit", col_audit)

        assert len(evals) == len(derefs.row_ops_val) == len(dense.val)
        dotp_left_vec, dotp_right_vec = [], []
        eval_dotp_left_vec, eval_dotp_right_vec = [], []
        for i in range(len(derefs.row_ops_val)):
            dotp = DotProductCircuit(derefs.row_ops_val[i].Zm,
                                     derefs.col_ops_val[i].Zm,
                                     dense.val[i].Zm)
            dl, dr = dotp.split()
            el, er = dl.evaluate(), dr.evaluate()
            transcript.append_scalar(b"claim_eval_dotp_left", el)
            transcript.append_scalar(b"claim_eval_dotp_right", er)
            assert el + er == evals[i]
            eval_dotp_left_vec.append(el)
            eval_dotp_right_vec.append(er)
            dotp_left_vec.append(dl)
            dotp_right_vec.append(dr)

        num_instances = len(row_prod_layer.read_vec)
        prod_list = []
        dotp_list = []
        for i in range(num_instances):
            prod_list.append(row_prod_layer.read_vec[i])
            dotp_list.append(dotp_left_vec[i])
            dotp_list.append(dotp_right_vec[i])
        prod_list += row_prod_layer.write_vec
        prod_list += col_prod_layer.read_vec
        prod_list += col_prod_layer.write_vec

        proof_ops, rand_ops = ProductCircuitEvalProofBatched.prove(
            prod_list, dotp_list, transcript)
        proof_mem, rand_mem = ProductCircuitEvalProofBatched.prove(
            [row_prod_layer.init, row_prod_layer.audit,
             col_prod_layer.init, col_prod_layer.audit], [], transcript)

        return (ProductLayerProof(
            eval_row=(row_init, row_read, row_write, row_audit),
            eval_col=(col_init, col_read, col_write, col_audit),
            eval_val=(eval_dotp_left_vec, eval_dotp_right_vec),
            proof_mem=proof_mem,
            proof_ops=proof_ops,
        ), rand_mem, rand_ops)

    def verify(self, num_ops, num_cells, evals, transcript):
        transcript.append_protocol_name(ProductLayerProof.protocol_name())
        timer = Timer("verify_prod_proof")
        num_instances = len(evals)

        row_init, row_read, row_write, row_audit = self.eval_row
        assert len(row_write) == num_instances == len(row_read)
        ws = _ONE
        for w in row_write:
            ws = ws * w
        rs = _ONE
        for r_ in row_read:
            rs = rs * r_
        if not (row_init * ws == rs * row_audit):
            raise ProofVerifyError("row multiset check")
        transcript.append_scalar(b"claim_row_eval_init", row_init)
        transcript.append_scalar_vector(b"claim_row_eval_read", row_read)
        transcript.append_scalar_vector(b"claim_row_eval_write", row_write)
        transcript.append_scalar(b"claim_row_eval_audit", row_audit)

        col_init, col_read, col_write, col_audit = self.eval_col
        assert len(col_write) == num_instances == len(col_read)
        ws = _ONE
        for w in col_write:
            ws = ws * w
        rs = _ONE
        for r_ in col_read:
            rs = rs * r_
        if not (col_init * ws == rs * col_audit):
            raise ProofVerifyError("col multiset check")
        transcript.append_scalar(b"claim_col_eval_init", col_init)
        transcript.append_scalar_vector(b"claim_col_eval_read", col_read)
        transcript.append_scalar_vector(b"claim_col_eval_write", col_write)
        transcript.append_scalar(b"claim_col_eval_audit", col_audit)

        eval_dotp_left, eval_dotp_right = self.eval_val
        assert len(eval_dotp_left) == len(eval_dotp_right) == num_instances
        claims_dotp_circuit = []
        for i in range(num_instances):
            if not (eval_dotp_left[i] + eval_dotp_right[i] == evals[i]):
                raise ProofVerifyError("dotp split claim")
            transcript.append_scalar(b"claim_eval_dotp_left",
                                     eval_dotp_left[i])
            transcript.append_scalar(b"claim_eval_dotp_right",
                                     eval_dotp_right[i])
            claims_dotp_circuit.append(eval_dotp_left[i])
            claims_dotp_circuit.append(eval_dotp_right[i])

        claims_prod_circuit = (list(row_read) + list(row_write) +
                               list(col_read) + list(col_write))
        claims_ops, claims_dotp, rand_ops = self.proof_ops.verify(
            claims_prod_circuit, claims_dotp_circuit, num_ops, transcript)
        claims_mem, _dp, rand_mem = self.proof_mem.verify(
            [row_init, row_audit, col_init, col_audit], [], num_cells,
            transcript)
        timer.stop()
        return claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops


class PolyEvalNetworkProof:
    __slots__ = ("proof_prod_layer", "proof_hash_layer")

    def __init__(self, proof_prod_layer, proof_hash_layer):
        self.proof_prod_layer = proof_prod_layer
        self.proof_hash_layer = proof_hash_layer

    @staticmethod
    def protocol_name() -> bytes:
        return b"Sparse polynomial evaluation proof"

    @staticmethod
    def prove(network, dense, derefs, evals, gens, transcript, random_tape):
        transcript.append_protocol_name(
            PolyEvalNetworkProof.protocol_name())
        proof_prod_layer, rand_mem, rand_ops = ProductLayerProof.prove(
            network.row_layers.prod_layer, network.col_layers.prod_layer,
            dense, derefs, evals, transcript)
        proof_hash_layer = HashLayerProof.prove(
            (rand_mem, rand_ops), dense, derefs, gens, transcript,
            random_tape)
        return PolyEvalNetworkProof(proof_prod_layer, proof_hash_layer)

    def verify(self, comm, comm_derefs, evals, gens, rx, ry, r_mem_check,
               nz, transcript):
        timer = Timer("verify_polyeval_proof")
        transcript.append_protocol_name(
            PolyEvalNetworkProof.protocol_name())
        num_instances = len(evals)
        r_hash, r_multiset_check = r_mem_check
        num_ops = next_pow2(nz)
        num_cells = 1 << len(rx)
        assert len(rx) == len(ry)

        claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops = \
            self.proof_prod_layer.verify(num_ops, num_cells, evals,
                                         transcript)
        assert len(claims_mem) == 4
        assert len(claims_ops) == 4 * num_instances
        assert len(claims_dotp) == 3 * num_instances

        claims_ops_row_read = claims_ops[:num_instances]
        claims_ops_row_write = claims_ops[num_instances:2 * num_instances]
        claims_ops_col_read = claims_ops[2 * num_instances:3 * num_instances]
        claims_ops_col_write = claims_ops[3 * num_instances:]

        self.proof_hash_layer.verify(
            (rand_mem, rand_ops),
            (claims_mem[0], claims_ops_row_read, claims_ops_row_write,
             claims_mem[1]),
            (claims_mem[2], claims_ops_col_read, claims_ops_col_write,
             claims_mem[3]),
            claims_dotp, comm, gens, comm_derefs, rx, ry, r_hash,
            r_multiset_check, transcript)
        timer.stop()


class SparseMatPolyEvalProof:
    __slots__ = ("comm_derefs", "poly_eval_network_proof")

    def __init__(self, comm_derefs, poly_eval_network_proof):
        self.comm_derefs = comm_derefs
        self.poly_eval_network_proof = poly_eval_network_proof

    @staticmethod
    def protocol_name() -> bytes:
        return b"Sparse polynomial evaluation proof"

    @staticmethod
    def _equalize(rx, ry):
        if len(rx) < len(ry):
            return [_ZERO] * (len(ry) - len(rx)) + list(rx), list(ry)
        if len(rx) > len(ry):
            return list(rx), [_ZERO] * (len(rx) - len(ry)) + list(ry)
        return list(rx), list(ry)

    @staticmethod
    def prove(dense, rx, ry, evals, gens, transcript, random_tape):
        transcript.append_protocol_name(
            SparseMatPolyEvalProof.protocol_name())
        assert len(evals) == dense.batch_size

        rx_ext, ry_ext = SparseMatPolyEvalProof._equalize(rx, ry)
        mem_rx = EqPolynomial(rx_ext).evals_dev()
        mem_ry = EqPolynomial(ry_ext).evals_dev()
        derefs = dense.deref(mem_rx, mem_ry)

        timer_commit = Timer("commit_nondet_witness")
        comm_derefs = derefs.commit(gens.gens_derefs)
        comm_derefs.append_to_transcript(b"comm_poly_row_col_ops_val",
                                         transcript)
        timer_commit.stop()

        r_mem_check = transcript.challenge_vector(b"challenge_r_hash", 2)
        timer_build = Timer("build_layered_network")
        net = PolyEvalNetwork(dense, derefs, mem_rx, mem_ry,
                              (r_mem_check[0], r_mem_check[1]))
        timer_build.stop()

        timer_eval = Timer("evalproof_layered_network")
        proof = PolyEvalNetworkProof.prove(net, dense, derefs, evals, gens,
                                           transcript, random_tape)
        timer_eval.stop()
        return SparseMatPolyEvalProof(comm_derefs, proof)

    def verify(self, comm, rx, ry, evals, gens, transcript):
        transcript.append_protocol_name(
            SparseMatPolyEvalProof.protocol_name())
        rx_ext, ry_ext = SparseMatPolyEvalProof._equalize(rx, ry)
        nz, num_mem_cells = comm.num_ops, comm.num_mem_cells
        assert (1 << len(rx_ext)) == num_mem_cells
        self.comm_derefs.append_to_transcript(b"comm_poly_row_col_ops_val",
                                              transcript)
        r_mem_check = transcript.challenge_vector(b"challenge_r_hash", 2)
        self.poly_eval_network_proof.verify(
            comm, self.comm_derefs, evals, gens, rx_ext, ry_ext,
            (r_mem_check[0], r_mem_check[1]), nz, transcript)
