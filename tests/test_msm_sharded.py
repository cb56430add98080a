"""Sharded MSM must be bit-identical to the single-device engine."""

import jax
import numpy as np

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.core.edwards import RistrettoPoint, _elligator_map
from spartan_parallel_tpu.ops import curve, limbs as lb, msm
from spartan_parallel_tpu.parallel.mesh import make_mesh
from spartan_parallel_tpu.parallel.msm_sharded import msm_sharded

rng = np.random.default_rng(23)


def test_msm_sharded_matches_single_device():
    n = 64
    pts = [_elligator_map(int.from_bytes(rng.bytes(32), "little"))
           for _ in range(8)]
    pts = (pts * (n // 8))[:n]
    pts_dev = curve.encode_points(pts)
    ks = [int.from_bytes(rng.bytes(40), "little") % L for _ in range(2 * n)]
    limbs = lb.ints_to_limbs(ks).reshape(2, n, 16)

    single = msm.msm(pts_dev, limbs)
    mesh = make_mesh(8)
    sharded = msm_sharded(mesh, pts_dev, limbs)
    for a, b in zip(single, sharded):
        assert a == b
