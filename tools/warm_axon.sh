#!/bin/sh
# Sequentially warm the TPU (axon) AOT kernel cache for every benchmark
# configuration the driver may run. One kernel trace+lower+compile costs
# ~5-20 minutes on this 1-core host, so cold benches time out; after this
# script every `python bench.py` mode is warm (ops/kernel_cache.py disk
# artifacts + the XLA persistent compile cache).
#
# Run from the repo root:  nohup sh tools/warm_axon.sh > /tmp/warm.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
python bench.py                         # MSM 2^20 (headline default)
BENCH_NIZK_LOGN=20 python bench.py      # BASELINE config 3
BENCH_NIZK_LOGN=10 python bench.py      # BASELINE config 1
BENCH_SNARK_LOGN=16 python bench.py     # BASELINE config 2
BENCH_DP_LOGN=20 python bench.py        # BASELINE config 4
