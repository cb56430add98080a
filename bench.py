"""Headline benchmarks. Prints one JSON line
{"metric", "value", "unit", "vs_baseline"} (+ aux lines to stderr).

Default: Pippenger MSM throughput per chip (the prover's cost center:
witness polycommit + Hyrax openings + bullet rounds; SURVEY.md §3.3).
Baseline: the reference's polycommit of a 2^20-entry witness takes
2.718 s on one CPU core (README.md:134, BASELINE.md §A) — a 2^20-point
Pedersen MSM ≈ 385.8k points/s. vs_baseline = ours / reference.

Env knobs:
  BENCH_MSM_LOGN   (default 16)  — MSM microbench size
  BENCH_NIZK_LOGN  — instead run the NIZK prove benchmark (BASELINE
                     config 1 at 10, config 3 at 20). Reference: 4.514 s
                     at 2^20 on one core (README.md:192), scaled linearly.
  BENCH_COLD=1     — skip the warm-up prove (include compile/trace time)

The timed region excludes one warm-up iteration: kernels are AOT-cached
(ops/kernel_cache.py) and XLA-persistent-cached, so steady-state is the
production-relevant number; cold-start is a once-per-machine cost.

Roofline accounting (BASELINE.json north star): each field mul is 256
16x16-bit limb products + carries (~700 int32 VPU ops); a point add is 9
muls (ops/curve.py). MSM work = 32 windows * (~2N scan adds + 512 bucket
adds). The msm bench reports field-muls/s alongside points/s.
"""

from __future__ import annotations

import json
import os
import sys
import time


_PEAK_CACHE: dict = {}

_CENSUS: dict = {"events": 0, "total_s": 0.0, "by_key": {}}


def _install_compile_census() -> None:
    """Count XLA trace/lower/compile events and their wall time (round-4
    verdict item 4: measure the cold-start compile budget per prove, so
    'the compiles ate it' becomes a number instead of a guess)."""
    try:
        import jax.monitoring as m
    except Exception:
        return

    def cb(event: str, duration: float, **kw) -> None:
        if "compil" not in event and "lower" not in event \
                and "trace" not in event:
            return
        _CENSUS["events"] += 1
        _CENSUS["total_s"] += duration
        k = event.strip("/").replace("/", ".")
        e = _CENSUS["by_key"].setdefault(k, [0, 0.0])
        e[0] += 1
        e[1] += duration

    m.register_event_duration_secs_listener(cb)


def _print_compile_census() -> None:
    if not _CENSUS["events"]:
        return
    print(json.dumps({
        "aux": "compile_census", "events": _CENSUS["events"],
        "total_s": round(_CENSUS["total_s"], 1),
        "by_key": {k: [v[0], round(v[1], 1)]
                   for k, v in sorted(_CENSUS["by_key"].items(),
                                      key=lambda kv: -kv[1][1])},
    }), file=sys.stderr, flush=True)


def _heartbeat(name: str, **kw) -> None:
    """Aux line BEFORE a long section starts: if the section later hangs
    past the rung cap, the artifact still shows it began (round-4 lesson:
    the NIZK rung produced zero bytes in 420 s — indistinguishable from
    never starting)."""
    rec = {"aux": name}
    rec.update(kw)
    print(json.dumps(rec), file=sys.stderr, flush=True)


def measured_field_mul_peak() -> float:
    """Measured chip throughput of the Montgomery field-mul kernel itself
    (Mmul/s): a pure fq.mul chain over a 2^18-element tensor, the roofline
    unit the north star is expressed in (BASELINE.json: MSM/sumcheck at
    >=80% of per-chip field-mul roofline). Cached per process."""
    if "peak" in _PEAK_CACHE:
        return _PEAK_CACHE["peak"]
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_parallel_tpu.core.consts import L
    from spartan_parallel_tpu.ops import fq

    # Enough muls per dispatch that compute (not the ~25 ms remote-relay
    # dispatch latency) dominates: 2^19 * 96 = 50M muls ~ tens of ms.
    # XLA:CPU runs ~1-5 Mmul/s on this 1-core host, so the same chain
    # would take minutes there (it ate the 2^14 NIZK rung's budget after
    # the metric landed); 2^15 * 32 = 1M muls is plenty to saturate one
    # core.
    if jax.default_backend() == "cpu":
        n, reps_inner = 1 << 15, 32
    else:
        n, reps_inner = 1 << 19, 96
    rng = np.random.default_rng(7)
    vals = [int.from_bytes(rng.bytes(40), "little") % L for _ in range(256)]
    a = jnp.asarray(np.tile(fq.encode(vals), (n // 256, 1)))

    @jax.jit
    def chain(x):
        # fori_loop: ONE fq.mul instantiation in the graph (the unrolled
        # 96-mul chain cost minutes of compile on a cold machine)
        return jax.lax.fori_loop(
            0, reps_inner, lambda i, y: fq.mul(y, x), x)

    jax.block_until_ready(chain(a))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = chain(a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    peak = n * reps_inner / dt / 1e6
    _PEAK_CACHE["peak"] = peak
    print(json.dumps({
        "aux": "field_mul_peak_measured",
        "value": round(peak, 1), "unit": "Mmul/s",
        "int32_ops_per_s_est": round(peak * 700 / 1e6, 3),
        "unit2": "Tops/s",
    }), file=sys.stderr)
    return peak



def _backend() -> str:
    import jax

    return jax.default_backend()

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

    # compile + warm. The remote axon compile helper can get OOM-killed
    # on the largest kernel graphs (observed: HTTP 500 "subprocess exit
    # signal SIGKILL" on the 2^20 flat-scan MSM); a number at a smaller N
    # beats no number, so retry once and then halve N down to 2^16.
    if not os.environ.get("BENCH_COLD"):
        for attempt in range(8):
            try:
                jax.block_until_ready(msm.msm_dev(points, limbs))
                break
            except Exception as e:  # jax.errors.JaxRuntimeError
                print(json.dumps({
                    "aux": "msm_compile_retry", "logn": logn,
                    "err": str(e)[:200]}), file=sys.stderr)
                if attempt % 2 == 1 and logn > 16:
                    logn -= 1
                    n = 1 << logn
                    points = points[:n]
                    limbs = limbs[:n]
        else:
            raise RuntimeError("msm bench: compile failed at every size")
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = msm.msm_dev(points, limbs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    pts_per_s = n / dt
    baseline = (1 << 20) / 2.718  # reference polycommit rate (README.md:134)
    # metric FIRST: the roofline aux below compiles the peak-measure
    # chain, which on a cold remote compiler can outlive the rung budget
    print(json.dumps({
        "metric": f"msm_points_per_s_2^{logn}",
        "backend": _backend(),
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / baseline, 3),
    }), flush=True)
    # roofline: ~2N adds/window scan + 512 bucket/suffix adds, 32 windows,
    # 9 field muls per add, ~700 int32 ops per field mul
    adds = 32 * (2 * n + 512)
    fmuls = adds * 9
    peak = measured_field_mul_peak()
    print(json.dumps({
        "aux": "msm_roofline",
        "field_muls_per_s": round(fmuls / dt / 1e6, 1),
        "unit": "Mmul/s",
        "pct_of_measured_peak": round(100 * fmuls / dt / 1e6 / peak, 1),
        "int32_ops_per_s_est": round(fmuls * 700 / dt / 1e12, 3),
        "unit2": "Tops/s",
    }), file=sys.stderr)


def bench_nizk(logn: int) -> None:
    import time

    from spartan_parallel_tpu import serialization as ser
    from spartan_parallel_tpu.models.nizk import NIZK, NIZKGens
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.utils.transcript import Transcript

    n = 1 << logn
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 10, seed=1)
    gens = NIZKGens(n, n)

    def prove_once():
        t0 = time.perf_counter()
        transcript = Transcript(b"nizk_bench")
        proof = NIZK.prove(inst, vars_mat[0][0], inputs_mat[0][0], gens,
                           transcript)
        return proof, time.perf_counter() - t0

    if not os.environ.get("BENCH_COLD"):
        _heartbeat("nizk_cold_prove_starting", logn=logn)
        wproof, cold_s = prove_once()  # warm-up: compiles + cache loads
        print(json.dumps({"aux": "nizk_cold_prove_s", "logn": logn,
                          "value": round(cold_s, 3)}),
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        wt = Transcript(b"nizk_bench")
        wproof.verify(inst, inputs_mat[0][0], gens, wt)
        print(json.dumps({"aux": "nizk_cold_verify_s",
                          "value": round(time.perf_counter() - t0, 3)}),
              file=sys.stderr, flush=True)
    proof, prove_s = prove_once()
    baseline_s = 4.514 * n / (1 << 20)  # README.md:192, linear scaling
    print(json.dumps({
        "metric": f"nizk_prove_2^{logn}",
        "backend": _backend(),
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / prove_s, 3),
    }), flush=True)

    t0 = time.perf_counter()
    tv = Transcript(b"nizk_bench")
    proof.verify(inst, inputs_mat[0][0], gens, tv)
    verify_s = time.perf_counter() - t0
    print(json.dumps({
        "aux": "nizk_detail", "verify_s": round(verify_s, 3),
        "proof_compressed_bytes": ser.compressed_size(proof),
        "reference_proof_bytes_2^20": 48134,
    }), file=sys.stderr)

    # roofline: phase-1 sumcheck sweeps the full (1,1,N) buffers every
    # round (fixed-shape discipline): per round ~3 tables * 3 eval points
    # * (1 g-mul + 1 contraction mul) + 3 binds ~= 12N field muls; logN+
    # rounds. Each field mul ~= 700 int32 VPU ops (bench header).
    from spartan_parallel_tpu.utils.timer import records
    sc1 = records.get("prove_sc_phase_one")
    if sc1:
        # chunked scans: round j sweeps N >> j down to the chunk tail, so
        # the fold geometry's true mul count is ~2x the first round's
        fmuls = 12 * 2 * n
        peak = measured_field_mul_peak()
        print(json.dumps({
            "aux": "sc1_roofline", "sc1_s": round(sc1, 3),
            "field_muls_per_s": round(fmuls / sc1 / 1e6, 1),
            "unit": "Mmul/s",
            "pct_of_measured_peak": round(
                100 * fmuls / sc1 / 1e6 / peak, 1),
            "int32_ops_per_s_est": round(fmuls * 700 / sc1 / 1e12, 3),
            "unit2": "Tops/s",
        }), file=sys.stderr)


def bench_snark(logn: int) -> None:
    """BASELINE config 2: upstream-style SNARK+SPARK on synthetic R1CS.

    Reference: SNARK::prove 39.13 s at 2^20 on one CPU core
    (README.md:155 — 4.44 s SAT + 34.29 s SPARK), scaled linearly."""
    import time

    from spartan_parallel_tpu import serialization as ser
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.models.snark_single import (
        SpartanSNARK,
        SpartanSNARKGens,
    )
    from spartan_parallel_tpu.utils.transcript import Transcript

    n = 1 << logn
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        1, [1], n, n, 10, seed=1)
    gens = SpartanSNARKGens(n, n, max(
        m.get_num_nz_entries()
        for m in (inst.A_list + inst.B_list + inst.C_list)))

    t0 = time.perf_counter()
    comm, decomm = SpartanSNARK.encode(inst, gens)
    encode_s = time.perf_counter() - t0

    def prove_once():
        t0 = time.perf_counter()
        tp = Transcript(b"snark_bench")
        proof = SpartanSNARK.prove(inst, comm, decomm, vars_mat[0][0],
                                   inputs_mat[0][0], gens, tp)
        return proof, time.perf_counter() - t0

    if not os.environ.get("BENCH_COLD"):
        _heartbeat("snark_cold_prove_starting", logn=logn)
        _, cold_s = prove_once()
        print(json.dumps({"aux": "snark_cold_prove_s",
                          "value": round(cold_s, 3)}),
              file=sys.stderr, flush=True)
    proof, prove_s = prove_once()
    baseline_s = 39.130 * n / (1 << 20)  # README.md:155, linear scaling
    print(json.dumps({
        "metric": f"snark_prove_2^{logn}",
        "backend": _backend(),
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / prove_s, 3),
    }), flush=True)

    t0 = time.perf_counter()
    tv = Transcript(b"snark_bench")
    proof.verify(comm, inputs_mat[0][0], gens, tv)
    verify_s = time.perf_counter() - t0
    print(json.dumps({
        "aux": "snark_detail", "encode_s": round(encode_s, 3),
        "verify_s": round(verify_s, 3),
        "proof_compressed_bytes": ser.compressed_size(proof),
        "reference_proof_bytes_2^20": 141768,
    }), file=sys.stderr)


def bench_dp(log_sigma_q: int) -> None:
    """BASELINE config 4: data-parallel R1CSProof over this host's chips.

    P=4 instances with skewed execution counts (Q = [Smax, Smax/4,
    Smax/16, Smax/16] summing to ~2^log_sigma_q), each 2^10 constraints —
    the spartan_parallel shape (many executions of small blocks).
    Baseline: the reference R1CSProof::prove is linear in total work
    SUM_p Q_p * num_cons; 4.44 s covers 2^20 (README.md:141)."""
    import time

    import jax

    from spartan_parallel_tpu.models.r1csproof import R1CSGens, R1CSProof
    from spartan_parallel_tpu.models.r1csinstance import (
        produce_synthetic_r1cs,
    )
    from spartan_parallel_tpu.models.r1csproof import (
        ProverWitnessSecInfo,
    )
    from spartan_parallel_tpu.parallel.context import prover_mesh
    from spartan_parallel_tpu.parallel.mesh import make_mesh
    from spartan_parallel_tpu.utils.random_tape import RandomTape
    from spartan_parallel_tpu.utils.transcript import Transcript

    ncons = 1 << 10
    smax = max(1, (1 << log_sigma_q) // ncons // 2)
    num_proofs = [smax, max(1, smax // 4), max(1, smax // 16),
                  max(1, smax // 16)]
    inst, vars_mat, inputs_mat = produce_synthetic_r1cs(
        4, num_proofs, ncons, ncons, 10, seed=2)
    # gens cover the largest committed witness poly: Q_max * per-sec vars
    gens = R1CSGens(b"gens_r1cs_sat", ncons, smax * ncons)
    sigma_work = sum(num_proofs) * ncons

    io_mat = [[[1] + list(io) + [0] * (ncons - 1 - len(io))
               for io in inputs_mat[p]] for p in range(4)]
    vars_sec = ProverWitnessSecInfo.from_scalars([ncons] * 4, vars_mat)
    io_sec = ProverWitnessSecInfo.from_scalars([ncons] * 4, io_mat)

    n_dev = jax.local_device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None

    def prove_once():
        t0 = time.perf_counter()
        tp = Transcript(b"dp_bench")
        tape = RandomTape(b"proof")
        ctx = prover_mesh(mesh) if mesh is not None else None
        if ctx is not None:
            with ctx:
                out = R1CSProof.prove(
                    4, max(num_proofs), num_proofs, ncons, [ncons] * 4,
                    [vars_sec, io_sec], inst, gens, tp, tape)
        else:
            out = R1CSProof.prove(
                4, max(num_proofs), num_proofs, ncons, [ncons] * 4,
                [vars_sec, io_sec], inst, gens, tp, tape)
        return out, time.perf_counter() - t0

    if not os.environ.get("BENCH_COLD"):
        _heartbeat("dp_cold_prove_starting", log_sigma_q=log_sigma_q)
        _, cold_s = prove_once()
        print(json.dumps({"aux": "dp_cold_prove_s",
                          "value": round(cold_s, 3)}),
              file=sys.stderr, flush=True)
    (dp_proof, _), prove_s = prove_once()
    baseline_s = 4.442 * sigma_work / (1 << 20)
    print(json.dumps({
        "metric": f"dp_r1cs_prove_sigma_work_2^{log_sigma_q}",
        "backend": _backend(),
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / prove_s, 3),
        "n_devices": n_dev,
    }), flush=True)

    from spartan_parallel_tpu import serialization as ser
    print(json.dumps({
        "aux": "dp_detail",
        "proof_compressed_bytes": ser.compressed_size(dp_proof,
                                                      "R1CSProof"),
        "num_proofs": num_proofs, "ncons": ncons,
    }), file=sys.stderr)


def _scaling_mesh_overhead(logn: int) -> None:
    """Time the sharded-MSM program on the local multi-device mesh vs the
    single-device MSM at identical compute, and print the overhead aux
    line. Requires jax.local_device_count() > 1 (the virtual 8-device CPU
    mesh in CI / the BENCH_SCALING_MESH_ONLY subprocess)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_parallel_tpu.core.consts import L
    from spartan_parallel_tpu.core.edwards import RistrettoPoint
    from spartan_parallel_tpu.ops import curve, limbs as lb, msm
    from spartan_parallel_tpu.parallel.mesh import make_mesh
    from spartan_parallel_tpu.parallel.msm_sharded import msm_sharded_dev

    n_dev = jax.local_device_count()
    if n_dev < 2:
        print(json.dumps({"aux": "mesh_overhead_skipped",
                          "n_devices": n_dev}), file=sys.stderr)
        return
    k = 1 << min(logn, 16)  # keep the CPU-backend run in seconds
    rng = np.random.default_rng(5)
    base = RistrettoPoint.basepoint()
    pts = [base]
    for _ in range(10):
        pts.append(pts[-1].double())
    pts_dev = curve.encode_points(pts)
    idx = rng.integers(0, len(pts), k)
    p_k = jnp.asarray(pts_dev[idx])
    s_k = jnp.asarray(lb.ints_to_limbs(
        [int.from_bytes(rng.bytes(40), "little") % L for _ in range(k)]))
    mesh = make_mesh(n_dev)

    def time_fn(f):
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    t_single = time_fn(lambda: msm.msm_dev(p_k, s_k))
    t_shard = time_fn(lambda: msm_sharded_dev(mesh, p_k, s_k))
    print(json.dumps({
        "aux": "msm_sharded_measured_virtual_mesh",
        "n_devices": n_dev, "logn": int(np.log2(k)),
        "t_single_dev_s": round(t_single, 4),
        "t_sharded_s": round(t_shard, 4),
        "sharding_overhead": round(t_shard / t_single, 3),
    }), file=sys.stderr)


def bench_scaling(logn: int = 20) -> None:
    """Measured scaling efficiency of the multi-chip decomposition
    (BASELINE config 5) on the available hardware.

    Only one physical chip is attached, so this measures the quantity
    that actually determines multi-chip efficiency: per-chip wall time of
    the 1/D work slice (the sharded-MSM point slice, parallel/
    msm_sharded.py, and the q-sharded phase-1 round sweep) plus the
    measured local cost of the combine step (tree-add of D point
    partials / field-add of D round partials). The cross-chip transfer
    itself is a few KB per combine — microseconds on ICI, and still sub-
    millisecond on DCN — so eff(D) = T(N) / (D * (T(N/D) + T_combine))
    is a faithful projection; bit-exactness of the decomposition is
    asserted separately on the virtual 8-device mesh (tests/
    test_msm_sharded.py, tests/test_sharding.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spartan_parallel_tpu.core.consts import L
    from spartan_parallel_tpu.core.edwards import RistrettoPoint
    from spartan_parallel_tpu.ops import curve, fq, limbs as lb, msm
    from spartan_parallel_tpu.ops import sumcheck as sck

    if os.environ.get("BENCH_SCALING_MESH_ONLY"):
        # subprocess mode (spawned below when the main run is on a
        # single-chip backend): time ONLY the sharded-vs-single MSM on
        # the virtual 8-device CPU mesh and exit — no metric line, so
        # the parent's chip-measured efficiency stays the headline.
        _scaling_mesh_overhead(logn)
        return

    n = 1 << logn
    rng = np.random.default_rng(5)
    base = RistrettoPoint.basepoint()
    pts = [base]
    for _ in range(10):
        pts.append(pts[-1].double())
    pts_dev = curve.encode_points(pts)
    idx = rng.integers(0, len(pts), n)
    points = jnp.asarray(pts_dev[idx])
    scalars = [int.from_bytes(rng.bytes(40), "little") % L
               for _ in range(n)]
    limbs = lb.ints_to_limbs(scalars)

    def time_msm(k):
        p, s = points[:k], jnp.asarray(limbs[:k])
        jax.block_until_ready(msm.msm_dev(p, s))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = msm.msm_dev(p, s)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    def time_reduce(d):
        parts = jnp.asarray(np.broadcast_to(
            pts_dev[idx[:1]][None], (d, 1, 4, 16)).copy())
        jax.block_until_ready(curve.tree_reduce(parts, axis=0))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = curve.tree_reduce(parts, axis=0)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    t_full = time_msm(n)
    effs = {}
    for d in (2, 4, 8):
        t_slice = time_msm(n // d)
        t_comb = time_reduce(d)
        effs[d] = t_full / (d * (t_slice + t_comb))
    print(json.dumps({
        "aux": "msm_scaling", "t_full_s": round(t_full, 4),
        "eff": {str(d): round(e, 3) for d, e in effs.items()},
    }), file=sys.stderr)

    # q-sharded phase-1 round sweep: per-chip slice of the (1, 1, X)
    # tables + the (3, 16) psum combine
    from spartan_parallel_tpu.ops import fq as _fq

    vals = [int.from_bytes(rng.bytes(40), "little") % L
            for _ in range(256)]
    tab = jnp.asarray(np.tile(_fq.encode(vals), (n // 256, 1)))
    B = tab.reshape(1, 1, n, 16)
    tp = tq = jnp.asarray(_fq.encode([1]))
    rm = jnp.asarray(_fq.encode([3])[0])

    def time_round(k):
        b = B[:, :, :k]
        tx = tab[:k]
        nh = np.uint32(k // 2)
        args = (tp, tq, tx, b, b, b)
        jax.block_until_ready(
            sck.p1_evals(*args, nh, mode=sck.MODE_X))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            ev = sck.p1_evals(*args, nh, mode=sck.MODE_X)
            out = sck.p1_bind(*args, rm, nh, mode=sck.MODE_X)
        jax.block_until_ready((ev, out))
        return (time.perf_counter() - t0) / reps

    t_round_full = time_round(n)
    sc_effs = {}
    for d in (2, 4, 8):
        sc_effs[d] = t_round_full / (d * time_round(n // d))
    # aux only: one sumcheck round's compute is ~12N muls (~1 ms at
    # 2^20 on this chip), far below the remote relay's ~25 ms dispatch
    # latency, so these slice timings measure the tunnel, not the
    # decomposition — on locally-attached multi-chip hardware (us-scale
    # dispatch) the q-sharded rounds scale like their compute. The
    # headline metric uses the MSM slices, whose compute dominates.
    print(json.dumps({
        "aux": "sumcheck_round_scaling_latency_bound",
        "t_full_s": round(t_round_full, 4),
        "eff": {str(d): round(e, 3) for d, e in sc_effs.items()},
    }), file=sys.stderr)

    # Measured (not projected) virtual-mesh run: the SAME sharded-MSM
    # program the multi-chip prover executes, timed on however many local
    # devices exist. On the 8-virtual-CPU-device mesh all shards share one
    # physical core, so this cannot show speedUP; what it measures is the
    # sharding OVERHEAD (collectives + partitioning) at identical compute:
    # t_sharded/t_single ~ 1.0 means the decomposition adds ~nothing and
    # the projection above is the binding estimate of real-chip scaling.
    import jax as _jax

    n_dev = _jax.local_device_count()
    if n_dev > 1:
        _scaling_mesh_overhead(min(logn, 16))
    elif not os.environ.get("BENCH_SCALING_NO_SUB"):
        # single-chip backend (the TPU): the mesh-overhead measure needs
        # >1 device, so take it on the virtual 8-device CPU mesh in a
        # subprocess (the projection above stays chip-measured — forcing
        # the WHOLE section onto CPU made eff collapse under XLA:CPU's
        # fixed per-dispatch overheads, not real scaling behavior).
        import subprocess

        env = dict(os.environ)
        env.update({"BENCH_FORCE_CPU": "1", "BENCH_SCALING": "1",
                    "BENCH_SCALING_MESH_ONLY": "1",
                    "BENCH_SCALING_LOGN": str(min(logn, 16))})
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=420, capture_output=True, text=True)
            sys.stderr.write(r.stderr or "")
            sys.stdout.write(r.stdout or "")
        except subprocess.TimeoutExpired:
            print(json.dumps({"aux": "mesh_overhead_subprocess_timeout"}),
                  file=sys.stderr)

    print(json.dumps({
        "metric": f"scaling_efficiency_8dev_2^{logn}",
        "backend": _backend(),
        "value": round(effs[8], 3),
        "unit": "fraction",
        "vs_baseline": round(effs[8] / 0.75, 3),
        # projected from same-chip slice timings of the sharded-MSM
        # decomposition (one physical chip attached); the virtual-mesh
        # subprocess above measures the collective/partition overhead of
        # the actual sharded program at identical compute
        "basis": "projected_from_chip_slice_timings",
    }))


def bench_findmin() -> None:
    """find_min-shaped workload (BASELINE §B): the full 9-stage SNARK on a
    synthetic zkVM trace with P=9 blocks of 8192 constraints and skewed
    execution counts — the reference's recorded find_min run proves this
    shape in 67.508 s and verifies in 318 ms
    (writeups/runtime_comparison/find_min.txt:64,232,307).

    BENCH_FINDMIN_SCALE shrinks the trace (default 1 = full shape);
    vs_baseline scales the reference time by the SAT-work ratio."""
    import time

    from spartan_parallel_tpu import examples as ex
    from spartan_parallel_tpu import serialization as ser

    scale = int(os.environ.get("BENCH_FINDMIN_SCALE", "1"))
    ncons = max(64, 8192 // scale)
    execs = [max(1, q // scale) for q in (64, 16, 16, 16, 4, 4, 4, 2, 2)]
    args, pa = ex.build_synthetic_zkvm(num_blocks=9, block_cons=ncons,
                                       num_execs=execs)
    t0 = time.perf_counter()
    ctx = ex.setup_program_instances(args, pa)
    encode_s = time.perf_counter() - t0

    def prove_once():
        t0 = time.perf_counter()
        proof = ex.prove_program(pa, ctx, label=b"findmin_bench")
        return proof, time.perf_counter() - t0

    if not os.environ.get("BENCH_COLD"):
        _heartbeat("findmin_cold_prove_starting", scale=scale,
                   encode_s=round(encode_s, 3))
        _, cold_s = prove_once()
        print(json.dumps({"aux": "findmin_cold_prove_s", "scale": scale,
                          "value": round(cold_s, 3)}),
              file=sys.stderr, flush=True)
    proof, prove_s = prove_once()
    # reference prove covers sigma_work = SUM_q ncons over the find_min
    # trace (9 blocks x 8192 cons, ~124 execs); scale linearly for
    # reduced shapes.
    work = sum(execs) * ncons
    ref_work = sum((64, 16, 16, 16, 4, 4, 4, 2, 2)) * 8192
    baseline_s = 67.508 * work / ref_work
    print(json.dumps({
        "metric": f"findmin_shaped_snark_prove_work_{work}",
        "backend": _backend(),
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / prove_s, 3),
    }), flush=True)

    t0 = time.perf_counter()
    ex.verify_program(proof, pa, ctx, label=b"findmin_bench")
    verify_s = time.perf_counter() - t0
    print(json.dumps({
        "aux": "findmin_detail", "encode_s": round(encode_s, 3),
        "verify_s": round(verify_s, 3),
        "reference_verify_s": 0.318,
        "proof_compressed_bytes": ser.compressed_size(proof, "SNARK"),
        "ncons": ncons, "num_execs": execs,
    }), file=sys.stderr)


def _is_remote_relay_backend() -> bool:
    """True when the default backend is the image's remote-TPU relay
    (axon PJRT plugin). Its compile helper takes 5-20+ minutes per
    kernel graph (measured: the NIZK 2^10 kernel set landed ZERO
    compiles in 420 s through the relay, vs a 116 s fully-cold prove on
    clean XLA:CPU), so cold end-to-end rungs can never fit a bench
    budget there. A locally-attached TPU would not take this path."""
    return os.environ.get("JAX_PLATFORMS", "").startswith("axon")


def _filter_stderr(text: str) -> str:
    """Drop the cpu_aot_loader feature-list spam (hundreds of lines of
    benign +prefer-no-gather/-scatter warnings per persistent-cache
    reload) so aux/metric lines survive in bounded artifact tails."""
    return "".join(
        ln for ln in text.splitlines(keepends=True)
        if "cpu_aot_loader" not in ln and "Machine type used" not in ln)


def _tpu_relay_alive() -> bool:
    """True if the remote-TPU relay accepts a TCP connection.

    The axon PJRT plugin dials 127.0.0.1:8082; when the relay process is
    dead, backend init blocks in a retry loop forever rather than
    failing, which would hang the whole bench. A 2 s connect probe is
    enough to tell the two states apart."""
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=2.0):
            return True
    except OSError:
        return False


def main() -> None:
    # silence the benign-but-bulky cpu_aot_loader reload errors (see
    # __graft_entry__.py) so metric lines survive in the artifact tail
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    if (not os.environ.get("BENCH_FORCE_CPU")
            and os.environ.get("JAX_PLATFORMS", "").startswith("axon")
            and not _tpu_relay_alive()):
        print(json.dumps({"aux": "tpu_relay_unreachable",
                          "note": "falling back to CPU backend"}),
              file=sys.stderr)
        os.environ["BENCH_FORCE_CPU"] = "1"
    if os.environ.get("BENCH_FORCE_CPU"):
        # debug/CI: virtual 8-device CPU mesh instead of the real chip.
        # The image's remote-TPU PJRT plugin wedges XLA:CPU executions
        # (spartan_parallel_tpu/envfix.py); it was injected at
        # interpreter startup, so a CPU run must re-exec itself with the
        # plugin's activation env stripped.
        if (os.environ.get("PALLAS_AXON_POOL_IPS")
                and not os.environ.get("SPARTAN_NO_REEXEC")):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from spartan_parallel_tpu.envfix import strip_axon_env

            env = strip_axon_env(dict(os.environ))
            env["SPARTAN_NO_REEXEC"] = "1"
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    nizk_logn = os.environ.get("BENCH_NIZK_LOGN")
    snark_logn = os.environ.get("BENCH_SNARK_LOGN")
    dp_logn = os.environ.get("BENCH_DP_LOGN")
    msm_logn = os.environ.get("BENCH_MSM_LOGN")
    if os.environ.get("BENCH_SCALING"):
        section = lambda: bench_scaling(  # noqa: E731
            int(os.environ.get("BENCH_SCALING_LOGN", "20")))
    elif os.environ.get("BENCH_FINDMIN"):
        section = bench_findmin
    elif nizk_logn:
        section = lambda: bench_nizk(int(nizk_logn))  # noqa: E731
    elif snark_logn:
        section = lambda: bench_snark(int(snark_logn))  # noqa: E731
    elif dp_logn:
        section = lambda: bench_dp(int(dp_logn))  # noqa: E731
    elif msm_logn:
        section = lambda: bench_msm(int(msm_logn))  # noqa: E731
    else:
        _ladder()
        return
    _install_compile_census()
    trace_dir = os.environ.get("SPARTAN_TRACE")
    try:
        if trace_dir:
            # capture an XLA profiler trace of the whole section (view
            # with tensorboard/xprof — the SURVEY §5 tracing facility)
            import jax

            with jax.profiler.trace(trace_dir):
                section()
        else:
            section()
    finally:
        _print_compile_census()


def _ladder() -> None:
    """Default mode: run the benchmark ladder cheapest-first under one
    global wall budget, so a stone-cold machine still lands its first
    metric within minutes and every remaining second buys a bigger one.

    Round-3 lesson: three sections with 2400-4200 s budgets, expensive
    compiles first, produced an EMPTY artifact when the driver's outer
    timeout fired before the first metric printed. Now each rung runs as
    a subprocess under min(its own cap, remaining global budget); its
    stdout is relayed immediately (so a metric printed before a later
    hang still reaches the artifact), and the parent finishes by
    re-printing every captured metric in headline order — the LAST line
    is the most headline-worthy metric that actually landed."""
    import subprocess

    budget_scale = float(os.environ.get("BENCH_BUDGET_SCALE", "1"))
    total = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1500"))
    total *= budget_scale
    t_start = time.perf_counter()

    # (env_var, value, cap_s, headline_rank) — round-4 lesson, inverted:
    # the NEVER-YET-CAPTURED cheap metrics run first (NIZK 2^10 =
    # BASELINE config 1, findmin at reduced scale, scaling, small MSM),
    # and the compile-walled 2^14+ rungs get whatever budget remains.
    # rank orders the final re-print; the largest-rank landed metric ends
    # up last on stdout (= the driver's parsed headline number).
    # End-to-end rungs (NIZK/DP/SNARK/findmin) run on clean XLA:CPU when
    # the chip is only reachable through the remote compile relay: the
    # relay cannot cold-compile the e2e kernel set inside any rung cap
    # (round 4: three rungs, 1440 s, zero output; round 5 measured: zero
    # kernels compiled in 420 s), while clean CPU cold-proves NIZK 2^10
    # in 116 s. Each metric line carries its backend. MSM/scaling rungs
    # stay on the chip — their kernel graphs are known to fit the relay.
    e2e_cpu = {"BENCH_FORCE_CPU": "1"} if _is_remote_relay_backend() else {}
    rungs = [
        # Round-5 validated-on-this-image rungs first (measured: NIZK
        # 2^10 lands in <120 s warm-cache, findmin scale-8 in ~300 s,
        # NIZK 2^14 in ~60 s), so three e2e metrics are banked before
        # the relay-dependent TPU rungs spend anything: through the
        # remote compile relay a cold kernel set can eat a whole cap
        # producing nothing (round-5 measured: zero NIZK kernels in
        # 420 s; round 4: three rungs, 1440 s, zero output).
        ("BENCH_NIZK_LOGN", "10", 420, 4, e2e_cpu),
        ("BENCH_FINDMIN", "1", 480, 5,
         {"BENCH_FINDMIN_SCALE": "8", **e2e_cpu}),
        ("BENCH_NIZK_LOGN", "14", 420, 6, e2e_cpu),
        ("BENCH_MSM_LOGN", "16", 300, 1),
        # scaling efficiency is PROJECTED from chip slice timings (run on
        # the default backend: forcing it onto XLA:CPU collapsed eff
        # under per-dispatch overheads); the virtual-8-device mesh
        # overhead measure runs in a CPU subprocess inside the section.
        # logn=20: through the remote relay every dispatch pays ~25 ms,
        # so slices below ~2^17 are latency- not compute-bound and the
        # projection collapses (measured eff(8)=0.001 at logn=16)
        ("BENCH_SCALING", "1", 420, 0, {"BENCH_SCALING_LOGN": "20"}),
        ("BENCH_MSM_LOGN", "20", 420, 2),
        ("BENCH_DP_LOGN", "18", 480, 3, e2e_cpu),
        ("BENCH_SNARK_LOGN", "16", 540, 7, e2e_cpu),
        # chunk step 2 halves the x/y-segment compile count (4 scans per
        # segment instead of 7) for ~33% more sweep work — the right
        # trade for a 600 s cold-compile window at 2^20
        ("BENCH_NIZK_LOGN", "20", 600, 8,
         {"SPARTAN_CHUNK_STEP": "2", **e2e_cpu}),
        ("BENCH_FINDMIN", "1", 600, 9, e2e_cpu),
    ]
    collected: list = []  # (rank, metric_line)
    for var, val, cap, rank, *extra in rungs:
        remaining = total - (time.perf_counter() - t_start)
        if remaining < 90:
            print(json.dumps({"aux": "bench_budget_exhausted",
                              "skipped_from": var}), file=sys.stderr)
            break
        env = dict(os.environ)
        env[var] = val
        if extra:
            env.update(extra[0])
        out = ""
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=min(cap * budget_scale, remaining),
                capture_output=True, text=True)
            out = r.stdout or ""
            sys.stderr.write(_filter_stderr(r.stderr or ""))
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"")
            out = out.decode() if isinstance(out, bytes) else out
            err = (e.stderr or b"")
            sys.stderr.write(_filter_stderr(
                err.decode() if isinstance(err, bytes) else err))
            print(json.dumps({"aux": "bench_section_timeout",
                              "section": f"{var}={val}", "cap_s": cap}),
                  file=sys.stderr)
        sys.stdout.write(out)
        sys.stdout.flush()
        for line in out.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if isinstance(rec, dict) and "metric" in rec:
                collected.append((rank, line))
    # Final summary: all landed metrics, least headline-worthy first.
    # "summary": true marks the re-prints so a consumer aggregating ALL
    # metric lines can drop one copy (the live relay already printed
    # each once).
    for _, line in sorted(collected, key=lambda t: t[0]):
        rec = json.loads(line)
        rec["summary"] = True
        print(json.dumps(rec))
    if not collected:
        print(json.dumps({"metric": "no_metric_landed", "value": 0,
                          "unit": "none", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
