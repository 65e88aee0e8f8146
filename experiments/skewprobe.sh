#!/bin/bash
# Skewed-probe grid (no reference script: the reference never probes a zipf S
# at the top level — BASELINE.json config-5 single-chip analog).  PK build
# side probed by an unsorted zipf S over a skew-parameter sweep.
cd "$(dirname "$0")/.."
exec python -m htm_hashjoin_tpu.harness skewprobe --reps "${N:-5}" --scale "${SCALE:-27}" --outDir experiments/logs "$@"
