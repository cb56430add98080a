"""Sparse R1CS matrix-vector kernels (Az/Bz/Cz and phase-2 ABC tables).

TPU-native counterpart of the reference's per-entry scalar loops
(src/sparse_mlpoly.rs:454 multiply_vec_disjoint_rounds and :505
compute_eval_table_sparse[_disjoint_rounds]). The COO entry list becomes
three device arrays (rows, cols, vals); the fold-over-entries becomes

    gather z[cols] -> Montgomery mul by vals -> scatter-add by rows

where the scatter accumulates RAW uint32 limbs (each < 2^16, so up to 2^15
addends cannot overflow) and a single carry+REDC pass (fq.resolve_lazy)
restores Montgomery form — the lazy-carry trick that keeps the whole SpMV
on the VPU with no per-row sequential chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import fq
from .kernel_cache import cached_kernel

# Scatter-add limb accumulation bound: values < 2^16 each; uint32 holds
# 2^16 of them. Matrices with a denser row would need splitting (not seen
# in practice: R1CS rows have a handful of terms).
MAX_ROW_NNZ = 1 << 15


@cached_kernel(static_argnames=("num_rows",))
def spmv_batched(rows, cols, vals, z, num_rows: int):
    """Batched sparse mat-vec: one matrix, many right-hand sides.

    rows, cols: (nnz,) int32; vals: (nnz, 16) Montgomery;
    z: (Q, ncols, 16) Montgomery. Returns (Q, num_rows, 16) Montgomery.
    """
    q = z.shape[0]
    zg = jnp.take(z, cols, axis=1)  # (Q, nnz, 16)
    prod = fq.mul(jnp.broadcast_to(vals[None], zg.shape), zg)
    acc = jnp.zeros((q, num_rows, 16), jnp.uint32)
    acc = acc.at[:, rows].add(prod)
    return fq.resolve_lazy(acc)


@cached_kernel(static_argnames=("num_cols",))
def eval_table(rows, cols, vals, rx_tab, num_cols: int):
    """M^T rx: out[col] = sum_{(r,c,v)} eq_rx[r] * v for c == col.

    rx_tab: (num_rows, 16) Montgomery eq-table over natural row order.
    Returns (num_cols, 16) Montgomery (natural col order).
    """
    g = jnp.take(rx_tab, rows, axis=0)  # (nnz, 16)
    prod = fq.mul(g, vals)
    acc = jnp.zeros((num_cols, 16), jnp.uint32)
    acc = acc.at[cols].add(prod)
    return fq.resolve_lazy(acc)


@cached_kernel()
def sparse_eval(rows, cols, vals, rx_tab, ry_tab):
    """M(rx, ry) = sum val * eq_rx[row] * eq_ry[col] (sparse_mlpoly.rs:427)."""
    t = fq.mul(jnp.take(rx_tab, rows, axis=0), jnp.take(ry_tab, cols, axis=0))
    return fq.sum_reduce(fq.mul(t, vals), axis=0)
