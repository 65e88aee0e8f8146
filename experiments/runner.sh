#!/bin/bash
# experiments/runner.sh equivalent: every grid, N=5 repetitions, logs in
# experiments/logs/<grid>_log{1..5}.
cd "$(dirname "$0")/.."
exec python -m htm_hashjoin_tpu.harness all --reps "${N:-5}" --scale "${SCALE:-27}" --outDir experiments/logs
