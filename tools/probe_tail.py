"""Break down the device ZK-round tail cost on the real chip.

The round-2 probe (tools/probe_scan.py) showed the eval+bind sweep is
~0.1 ms/round while a full device round costs ~0.5 s — so virtually all
the time is in the tail: STROBE transcript ops, comb-table commits, and
ristretto compression. This probe times each component as its own
20-iteration lax.scan (matching the per-round usage count) so the
per-round cost attribution is direct.

Run:  python tools/probe_tail.py            (on the attached TPU)
      JAX_PLATFORMS=cpu python tools/probe_tail.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.ops import fq, ristretto_dev as rdev
from spartan_parallel_tpu.ops import transcript_dev as tdev
from spartan_parallel_tpu.ops import zk_round as zkr
from spartan_parallel_tpu.models.commitments import MultiCommitGens
from spartan_parallel_tpu.utils.transcript import Transcript

K = 20  # rounds per scan


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn_j(*args))
    cold = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1000:9.1f} ms  ({best/K*1000:7.2f} ms/round)"
          f"   [cold {cold:.1f}s]", flush=True)
    return out


def main():
    rng = np.random.default_rng(7)

    def rand_mont(num):
        return jnp.asarray(fq.encode(
            [int.from_bytes(rng.bytes(40), "little") % L
             for _ in range(num)]))

    tr = Transcript(b"probe")
    s0 = tdev.from_host(tr)
    pt32 = jnp.asarray(rng.integers(0, 256, 32).astype(np.uint32))
    gens_n = MultiCommitGens(4, b"probe_n")
    gens_1 = MultiCommitGens(1, b"probe_1")
    tab_n = jnp.asarray(rdev.make_comb_tables(list(gens_n.G) + [gens_n.h]))
    tab_1 = jnp.asarray(rdev.make_comb_tables(list(gens_1.G) + [gens_1.h]))
    coeffs5 = rand_mont(5)
    coeffs2 = rand_mont(2)
    point = jnp.asarray(np.stack([np.asarray(rand_mont(4))] * 1)[0])

    # 1. keccak permute alone, K iterations
    def perm_scan(st):
        def body(st, _):
            return tdev.permute(st), None
        st, _ = jax.lax.scan(body, st, None, length=K)
        return st
    timeit(f"keccak permute x{K}", perm_scan, s0[0])

    # 2. typical per-round transcript traffic (appends + 4 challenges),
    #    no commits: append_point x5, challenge_scalar x4,
    #    append_scalar_vector(4)
    def transcript_scan(s):
        def body(s, _):
            s = tdev.append_point(s, b"comm_poly", pt32)
            s, r = tdev.challenge_scalar(s, b"challenge_nextround")
            s = tdev.append_point(s, b"comm_claim_per_round", pt32)
            s = tdev.append_point(s, b"comm_eval", pt32)
            s, w0 = tdev.challenge_scalar(s, b"combine_two_claims_to_one")
            s, w1 = tdev.challenge_scalar(s, b"combine_two_claims_to_one")
            s = tdev.append_message_const(s, b"protocol-name",
                                          b"dot product proof")
            s = tdev.append_point(s, b"Cx", pt32)
            s = tdev.append_point(s, b"Cy", pt32)
            s = tdev.append_scalar_vector(
                s, b"a", jnp.stack([r, w0, w1, r]))
            s = tdev.append_point(s, b"delta", pt32)
            s = tdev.append_point(s, b"beta", pt32)
            s, c = tdev.challenge_scalar(s, b"c")
            return s, c
        s, cs = jax.lax.scan(body, s, None, length=K)
        return s[0], cs
    timeit(f"transcript round traffic x{K}", transcript_scan, s0)

    # 3. comb commit (5-gen) x2 per round (comm_poly + batched Cy/beta ~=
    #    3 small commits; probe one 5-gen and one batched pair of 2-gen)
    def comb_scan(x):
        def body(c, _):
            out = zkr.comb_commit(tab_n, c)
            return fq.add(c, c), out
        _, outs = jax.lax.scan(body, x, None, length=K)
        return outs
    timeit(f"comb_commit 5-gen x{K}", comb_scan, coeffs5)

    def comb1_scan(x):
        def body(c, _):
            out = zkr.comb_commit(tab_1, c)
            return fq.add(c, c), out
        _, outs = jax.lax.scan(body, x, None, length=K)
        return outs
    timeit(f"comb_commit 2-gen x{K}", comb1_scan, coeffs2)

    # 4. ristretto compress x{K}
    def compress_scan(p):
        def body(p, _):
            by = rdev.compress(p)
            return curve_dbl(p), by
        _, outs = jax.lax.scan(body, p, None, length=K)
        return outs
    from spartan_parallel_tpu.ops import curve
    def curve_dbl(p):
        return curve.point_double(p)
    # a real point: use the first generator's extended coords
    gpt = jnp.asarray(curve.encode_points([gens_n.G[0]]))[0]
    timeit(f"ristretto compress x{K}", compress_scan, gpt)

    # 5. full tail x{K}
    def tail_scan(args):
        s, claim, comm_claim = args
        bp = rand_mont(K); be = rand_mont(K); bsc = rand_mont(K)
        dv = jnp.stack([rand_mont(4) for _ in range(K)])
        rd = rand_mont(K); rb = rand_mont(K)
        deltas = jnp.asarray(
            rng.integers(0, 256, (K, 32)).astype(np.uint32))
        e0 = rand_mont(K); e2 = rand_mont(K); e3 = rand_mont(K)

        def body(carry, x):
            s, claim, comm_claim = carry
            (bp_, be_, bsc_, dv_, rd_, rb_, d_, e0_, e2_, e3_) = x
            s, r, eval_, comm_eval, ys = zkr._zk_round_tail(
                s, claim, comm_claim, e0_, e2_, e3_,
                (bp_, be_, bsc_, dv_, rd_, rb_, d_), tab_n, tab_1)
            return (s, eval_, comm_eval), r
        carry, rs = jax.lax.scan(
            body, (s, claim, comm_claim),
            (bp, be, bsc, dv, rd, rb, deltas, e0, e2, e3))
        return carry[1], rs
    timeit(f"full zk round tail x{K}", tail_scan,
           (s0, coeffs5[0], pt32))


if __name__ == "__main__":
    main()
