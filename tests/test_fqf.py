"""Limb-sublane field ops (ops/fqf.py) vs the limb-last oracle."""

import numpy as np
import pytest

from spartan_parallel_tpu.core.consts import L
from spartan_parallel_tpu.ops import fq, fqf

rng = np.random.default_rng(31)


def _rand(n):
    return [int.from_bytes(rng.bytes(40), "little") % L for _ in range(n)]


@pytest.mark.parametrize("impl", ["scan", "ks"])
def test_fqf_mul_add_sub_match_fq(impl, monkeypatch):
    monkeypatch.setenv("SPARTAN_CARRY_IMPL", impl)
    xs, ys = _rand(24), _rand(24)
    a = fqf.to_sublane(fq.encode(xs).reshape(2, 12, 16))
    b = fqf.to_sublane(fq.encode(ys).reshape(2, 12, 16))
    got_mul = fq.decode(np.asarray(fqf.from_sublane(fqf.mul(a, b))))
    got_add = fq.decode(np.asarray(fqf.from_sublane(fqf.add(a, b))))
    got_sub = fq.decode(np.asarray(fqf.from_sublane(fqf.sub(a, b))))
    assert got_mul == [x * y % L for x, y in zip(xs, ys)]
    assert got_add == [(x + y) % L for x, y in zip(xs, ys)]
    assert got_sub == [(x - y) % L for x, y in zip(xs, ys)]


@pytest.mark.parametrize("impl", ["scan", "ks"])
def test_fqf_sum_dot_match_fq(impl, monkeypatch):
    monkeypatch.setenv("SPARTAN_CARRY_IMPL", impl)
    xs, ys = _rand(40), _rand(40)
    a = fqf.to_sublane(fq.encode(xs)[None])   # (1, 16, 40)
    b = fqf.to_sublane(fq.encode(ys)[None])
    got_sum = fq.decode(np.asarray(
        fqf.from_sublane(fqf.sum_lanes(a))))[0]
    got_dot = fq.decode(np.asarray(
        fqf.from_sublane(fqf.dot_lanes(a, b))))[0]
    assert got_sum == sum(xs) % L
    assert got_dot == sum(x * y for x, y in zip(xs, ys)) % L
