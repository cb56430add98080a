"""Split the device sumcheck round cost: sweep-only vs full ZK round.

Runs a 20-round scan over the same (1, 1, 16, 2^20) sublane tables as
the NIZK 2^20 phase-1 sumcheck, but with the ZK tail replaced by a
fixed challenge — isolating the eval+bind sweep cost from the
transcript/commit/DotProductProof tail. One standalone kernel compile;
does not touch the product kernel cache keys.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.ops import fq, fqf
from spartan_parallel_tpu.ops import sumcheck_sl as scl
from spartan_parallel_tpu.ops.kernel_cache import cached_kernel
from spartan_parallel_tpu.ops.sumcheck import MODE_X


@cached_kernel(static_argnames=("k",))
def sweep_only_scan(tp, tq, tx, B, C, D, n_half0, rs, k: int):
    def body(carry, r):
        tp, tq, tx, B, C, D, n_half = carry
        evd = scl.p1_evals(tp, tq, tx, B, C, D, n_half, MODE_X)
        tp, tq, tx, B, C, D = scl.p1_bind(tp, tq, tx, B, C, D, r,
                                          n_half, MODE_X)
        return (tp, tq, tx, B, C, D,
                (n_half >> jnp.uint32(1)).astype(jnp.uint32)), evd

    carry, evs = jax.lax.scan(body, (tp, tq, tx, B, C, D, n_half0), rs)
    return evs


def main():
    logn = 20
    n = 1 << logn
    rng = np.random.default_rng(5)

    def rand(num):
        return fq.encode(
            [int.from_bytes(rng.bytes(40), "little") % L
             for i in range(num)])

    tp = fqf.to_sublane(jnp.asarray(rand(1)))
    tq = fqf.to_sublane(jnp.asarray(rand(1)))
    tx = fqf.to_sublane(jnp.asarray(rand(256))).repeat(n // 256, axis=-1)
    B = tx[None, None] + 0
    C = jnp.roll(tx, 7, axis=-1)[None, None]
    D = jnp.roll(tx, 13, axis=-1)[None, None]
    rs = jnp.asarray(rand(logn))
    nh = np.uint32(n // 2)

    t0 = time.perf_counter()
    out = jax.block_until_ready(sweep_only_scan(
        tp, tq, tx, B, C, D, nh, rs, k=logn))
    print("cold", round(time.perf_counter() - t0, 2), flush=True)
    t0 = time.perf_counter()
    out = jax.block_until_ready(sweep_only_scan(
        tp, tq, tx, B, C, D, nh, rs, k=logn))
    dt = time.perf_counter() - t0
    print(f"sweep-only 20-round scan: {dt:.3f} s "
          f"({dt / logn * 1000:.1f} ms/round)", flush=True)


if __name__ == "__main__":
    main()
