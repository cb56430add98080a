"""Headline benchmark: Pippenger MSM throughput per chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

MSM is the prover's cost center (witness polycommit + Hyrax openings +
bullet rounds; SURVEY.md §3.3). Baseline: the reference's polycommit of a
2^20-entry witness takes 2.718 s on one CPU core (README.md:134,
BASELINE.md §A) — a 2^20-point Pedersen MSM — i.e. ~385.8k points/s.
vs_baseline is the throughput ratio (ours / reference).

Size via BENCH_MSM_LOGN (default 16). Set BENCH_NIZK_LOGN to instead run
the full NIZK prove benchmark (BASELINE config 1/3) — slower because it
exercises every kernel shape in the pipeline.
"""

from __future__ import annotations

import json
import os
import time


def bench_msm(logn: int) -> None:
    import jax
    import numpy as np

    from spartan_parallel_tpu.core.consts import L
    from spartan_parallel_tpu.core.edwards import RistrettoPoint
    from spartan_parallel_tpu.ops import curve, limbs as lb, msm

    n = 1 << logn
    rng = np.random.default_rng(3)
    # n pseudo-random points: cheap to derive as multiples of the basepoint
    # chain (point values don't affect MSM cost)
    base = RistrettoPoint.basepoint()
    pts = [base]
    for _ in range(10):
        pts.append(pts[-1].double())
    pts_dev = curve.encode_points(pts)
    idx = rng.integers(0, len(pts), n)
    points = jax.numpy.asarray(pts_dev[idx])

    scalars = [int.from_bytes(rng.bytes(40), "little") % L for _ in range(n)]
    limbs = lb.ints_to_limbs(scalars)

    # compile + warm
    msm.msm_single(points, limbs)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        msm.msm_single(points, limbs)
    dt = (time.perf_counter() - t0) / reps

    pts_per_s = n / dt
    baseline = (1 << 20) / 2.718  # reference polycommit rate (README.md:134)
    print(json.dumps({
        "metric": f"msm_points_per_s_2^{logn}",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / baseline, 3),
    }))


def bench_nizk(logn: int) -> None:
    from spartan_parallel_tpu.models.nizk import NIZK, NIZKGens
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.utils.transcript import Transcript

    n = 1 << logn
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 10, seed=1)
    gens = NIZKGens(n, n)
    t0 = time.perf_counter()
    transcript = Transcript(b"nizk_bench")
    proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens,
                       transcript)
    prove_s = time.perf_counter() - t0
    tv = Transcript(b"nizk_bench")
    proof.verify(inst, inputs_mat[0][0], gens, tv)
    baseline_s = 4.514 * n / (1 << 20)  # README.md:192, linear scaling
    print(json.dumps({
        "metric": f"nizk_prove_2^{logn}",
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / prove_s, 3),
    }))


def main() -> None:
    nizk_logn = os.environ.get("BENCH_NIZK_LOGN")
    if nizk_logn:
        bench_nizk(int(nizk_logn))
    else:
        bench_msm(int(os.environ.get("BENCH_MSM_LOGN", "16")))


if __name__ == "__main__":
    main()
