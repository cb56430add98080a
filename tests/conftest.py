"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on the host platform with 8 virtual devices, exactly as the
driver's dryrun does.

Note: this image's sitecustomize registers an `axon` remote-TPU PJRT plugin
and programmatically forces the platform, so setting the JAX_PLATFORMS env
var is not enough — we must override jax.config after import."""

import os

if os.environ.get("SPARTAN_TEST_TPU"):
    # on-chip run (VERDICT item: exercise the device test matrix on the
    # real TPU backend, where Mosaic/XLA behavior differs from CPU):
    # keep the default platform (axon); sharding tests will see 1 device
    # and reduce to single-device checks.
    import jax  # noqa: F401
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

# The package __init__ enables the persistent compilation cache (the
# +prefer-no-gather/-scatter AOT reload warnings are XLA tuning
# pseudo-features, benign on the same machine — verified by a two-run
# bit-identical check). It cuts the suite's dominant cost: XLA compiles.
