"""Multi-chip sharding for the prover (SURVEY.md §2.3 TPU mapping).

The reference is single-process (rayon only, dense_mlpoly.rs:183-197); the
TPU-native equivalent shards the big proof axes over a jax Mesh:

  * the data-parallel `q` axis of the phase-1 tables (Az/Bz/Cz and z) —
    each chip proves a slice of the executions; per-round partial sums
    cross ICI as ONE lazy-limb psum (integer-exact, so reduction order
    cannot perturb the Fiat-Shamir transcript);
  * MSM points for witness commitments — per-chip Pippenger buckets whose
    window sums tree-reduce over ICI.

Strategy: annotate shardings with NamedSharding under jit and let XLA
insert collectives; the fold kernels slice contiguous halves, which stays
communication-free while the folded axis is longer than the mesh (we shard
q, fold x first — by the time q folds cross shards the tables are tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fq, sumcheck as sck


def make_mesh(n_devices: int | None = None, axis: str = "q") -> Mesh:
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh2(n_hosts: int, n_chips: int,
               axes: tuple = ("host", "chip")) -> Mesh:
    """Two-axis (host, chip) mesh (SURVEY.md §2.3): the chip axis rides
    ICI within a slice, the host axis crosses DCN. Big prover tensors
    shard over BOTH axes (shard_big flattens them), so per-round
    contractions reduce over chips first (ICI) and only the (3, 16)
    partial per host crosses DCN; MSM partials reduce the same way."""
    import numpy as np

    devs = jax.devices()
    assert len(devs) >= n_hosts * n_chips, \
        f"need {n_hosts * n_chips} devices, have {len(devs)}"
    return Mesh(
        np.array(devs[: n_hosts * n_chips]).reshape(n_hosts, n_chips),
        axes)


def shard_q(mesh: Mesh, arr, axis: int = 1):
    """Place arr with its q axis sharded over the mesh."""
    spec = [None] * arr.ndim
    spec[axis] = "q"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


@functools.partial(jax.jit, static_argnames=("mode",))
def sharded_p1_round(tp, tq, tx, B, C, D, r, n_half, mode: int):
    """One full phase-1 sumcheck round: evals then bind, as a single jit.

    With B/C/D sharded on the q axis, the x-mode contraction reduces
    locally per shard and XLA inserts the cross-chip psum for the final
    (3, 16) result; the binds stay elementwise-local.
    """
    evals = sck.p1_evals.__wrapped_fn__(tp, tq, tx, B, C, D, n_half,
                                        mode=mode)
    bound = sck.p1_bind.__wrapped_fn__(tp, tq, tx, B, C, D, r, n_half,
                                       mode=mode)
    return evals, bound


def dryrun_step(mesh: Mesh, P_i=2, Q=8, X=8):
    """Build tiny sharded tables and run one jitted prover round on them.

    Used by the driver's multi-chip dry run and by the scaling tests.
    """
    import numpy as np

    rng = np.random.default_rng(0)

    def rand_tab(*shape):
        from ..core.consts import L

        n = int(np.prod(shape))
        vals = [int.from_bytes(rng.bytes(40), "little") % L for _ in range(n)]
        return jnp.asarray(fq.encode(vals)).reshape(*shape, 16)

    tp = replicate(mesh, rand_tab(P_i))
    tq = shard_q(mesh, rand_tab(Q), axis=0)
    tx = replicate(mesh, rand_tab(X))
    B = shard_q(mesh, rand_tab(P_i, Q, X))
    C = shard_q(mesh, rand_tab(P_i, Q, X))
    D = shard_q(mesh, rand_tab(P_i, Q, X))
    r = rand_tab()

    evals, bound = sharded_p1_round(tp, tq, tx, B, C, D, r,
                                    np.uint32(X // 2), sck.MODE_X)
    jax.block_until_ready(evals)
    return evals, bound
