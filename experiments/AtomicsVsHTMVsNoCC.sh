#!/bin/bash
# Reference-parity wrapper: experiments/AtomicsVsHTMVsNoCC.sh of anilshanbhag/HTM-HashJoin.
# Runs the 'AtomicsVsHTMVsNoCC' grid at reference scale (rSize = 2^27) on the current
# JAX platform.  Use --scale to shrink for CPU smoke runs.
cd "$(dirname "$0")/.."
exec python -m htm_hashjoin_tpu.harness AtomicsVsHTMVsNoCC --reps "${N:-5}" --scale "${SCALE:-27}" --outDir experiments/logs "$@"
