"""Device merlin/STROBE transcript vs the host implementation, byte-exact."""

import numpy as np
import jax.numpy as jnp

from spartan_parallel_tpu.core.field import Scalar
from spartan_parallel_tpu.ops import fq
from spartan_parallel_tpu.ops import transcript_dev as td
from spartan_parallel_tpu.utils.keccak import permute_state
from spartan_parallel_tpu.utils.strobe import Strobe128
from spartan_parallel_tpu.utils.transcript import Transcript


def _dev_bytes(arr):
    return bytes(np.asarray(arr, dtype=np.uint8).tobytes())


def test_permute_matches_host():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 200).astype(np.uint8)
    host = bytearray(raw.tobytes())
    permute_state(host)
    dev = td.permute(jnp.asarray(raw.astype(np.uint32)))
    assert _dev_bytes(dev) == bytes(host)


def test_strobe_ops_match_host():
    """Random meta_ad/ad/prf schedule crossing rate boundaries."""
    rng = np.random.default_rng(1)
    host = Strobe128(b"test protocol")
    dev = (jnp.asarray(np.frombuffer(bytes(host.state), np.uint8)
                       .astype(np.uint32)),
           jnp.uint32(host.pos), jnp.uint32(host.pos_begin))
    for step in range(40):
        op = rng.integers(0, 3)
        n = int(rng.integers(1, 80))
        if op == 0:
            data = rng.integers(0, 256, n).astype(np.uint8)
            host.meta_ad(bytes(data), False)
            dev = td.meta_ad(dev, jnp.asarray(data.astype(np.uint32)), False)
        elif op == 1:
            data = rng.integers(0, 256, n).astype(np.uint8)
            host.ad(bytes(data), False)
            dev = td.ad(dev, jnp.asarray(data.astype(np.uint32)), False)
        else:
            want = host.prf(n, False)
            dev, got = td.prf(dev, n, False)
            assert _dev_bytes(got) == want, f"prf mismatch at step {step}"
        st, pos, pos_begin = dev
        assert _dev_bytes(st) == bytes(host.state), f"state at {step}"
        assert int(pos) == host.pos and int(pos_begin) == host.pos_begin


def test_merlin_schedule_matches_host():
    """The per-round sumcheck transcript schedule, host vs device."""
    rng = np.random.default_rng(2)
    host = Transcript(b"test transcript")
    dev = td.from_host(host)

    for _ in range(3):
        # append_point (32B), challenge_scalar, append_scalar_vector
        pt = rng.integers(0, 256, 32).astype(np.uint8)
        host.append_message(b"comm_poly", bytes(pt))
        dev = td.append_message(dev, b"comm_poly",
                                jnp.asarray(pt.astype(np.uint32)))
        c_host = host.challenge_scalar(b"challenge_nextround")
        dev, c_dev = td.challenge_scalar(dev, b"challenge_nextround")
        assert fq.decode(np.asarray(c_dev)[None])[0] == int(c_host)

        vals = [Scalar(int(rng.integers(1, 1 << 62))) for _ in range(4)]
        host.append_scalar_vector(b"a", vals)
        monts = jnp.asarray(fq.encode(vals))
        dev = td.append_scalar_vector(dev, b"a", monts)

        w_host = host.challenge_vector(b"combine_two_claims_to_one", 2)
        for k in range(2):
            dev, w_dev = td.challenge_scalar(
                dev, b"combine_two_claims_to_one")
            assert fq.decode(np.asarray(w_dev)[None])[0] == int(w_host[k])

    st, pos, pos_begin = td.to_host_state(dev)
    assert st == bytes(host.strobe.state)
    assert pos == host.strobe.pos and pos_begin == host.strobe.pos_begin
