"""Workaround for the image's remote-TPU PJRT plugin wedging XLA:CPU.

The sitecustomize on this image injects an `axon` PJRT plugin into every
interpreter (PYTHONPATH=/root/.axon_site + PALLAS_AXON_POOL_IPS). Its
background runtime non-deterministically wedges XLA:CPU executions: a
plain `device_get(jnp.ones((16,16)).reshape(4,64))` under
JAX_PLATFORMS=cpu stalls for 30-90 s per dispatch or hangs outright in
most runs (0% CPU, all threads in futex wait), and takes ~3 s total with
the plugin absent — measured on this host, 2026-08-21. Any CPU-only
subprocess (multichip dryrun stages, CPU bench sections, the test
suite) must therefore run with the plugin's activation env stripped.

TPU runs keep the plugin: it IS the backend there.
"""

from __future__ import annotations


def strip_axon_env(env: dict) -> dict:
    """Return a copy of `env` with the axon plugin's activation stripped
    (sitecustomize keys on PALLAS_AXON_POOL_IPS truthiness) and the
    platform pinned to CPU."""
    env = dict(env)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    return env
