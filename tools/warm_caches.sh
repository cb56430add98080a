#!/bin/bash
# Warm every persistent cache the driver's evidence runs depend on, with
# the CURRENT source tree. Run this after the last source edit of a
# round: kernel-cache keys hash the defining modules, so any later edit
# to ops/ re-colds the affected kernels.
#
#   1. multi-chip dryrun (CPU, 8 virtual devices)  -> XLA persistent cache
#   2. default test suite (CPU)                    -> XLA + AOT export caches
#   3. bench ladder (TPU via axon relay)           -> remote-compile + XLA caches
#
# All three consume the same fingerprinted cache dirs the driver's runs
# will read (~/.cache/spartan_parallel_tpu/...), so a subsequent driver
# invocation pays dispatch + compute only.

set -x
cd "$(dirname "$0")/.."

# 1. dryrun (generous budget: this run IS the compile; the driver's gets
#    the warm caches and finishes in minutes)
SPARTAN_DRYRUN_BUDGET_S=${WARM_DRYRUN_BUDGET:-5400} \
XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
timeout "${WARM_DRYRUN_TIMEOUT:-7200}" python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun warm OK")
EOF

# 2. test suite (also CI's regression gate)
timeout "${WARM_TEST_TIMEOUT:-7200}" python -m pytest tests/ -q -x \
    --ignore=tests/test_golden_kit.py

# 3. bench ladder on the real chip
BENCH_TOTAL_BUDGET_S=${WARM_BENCH_BUDGET:-5400} \
timeout "${WARM_BENCH_TIMEOUT:-7200}" python bench.py
