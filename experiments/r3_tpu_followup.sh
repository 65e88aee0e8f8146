#!/bin/bash
# Round-3 TPU follow-up batch:
#   1. multipass scatter kernel hardware sanity (2^20) — warms the compile
#      cache for the crossover step; first proven 2026-08-20 after the
#      int32/8-row-group Mosaic fixes
#   2. skewprobe grid at 2^27 (zipf S, the TPU-safe generator)
#   3. TSizeAndShuffleWindowstoTime 3rd repetition (the w=8192 anomaly
#      re-measurement VERDICT r2 asked for: >=3 reps)
#   4. radix multipass-vs-sort crossover sweep
#   5. adaptive-dial measurement (adaptive vs both fixed plans)
#   6. one counters-enabled grid at 2^27
# Each step logs under experiments/results_tpu27r3/ and is independent —
# a failure moves on to the next step.
cd "$(dirname "$0")/.."
set -x
OUT=experiments/results_tpu27r3

timeout 1500 python - <<'EOF'
import time, numpy as np, jax.numpy as jnp
from htm_hashjoin_tpu.data.generators import shuffled_keys
from htm_hashjoin_tpu.ops.pallas.radix_kernels import multipass_radix_partition, MAXI32
t0=time.time()
keys = shuffled_keys(1<<20, 0)
res = multipass_radix_partition(keys, radix_bits=11, passes=2, key_bits=21)
out = np.asarray(res.partitioned2d).reshape(-1)
vals = out[out != MAXI32]
assert len(vals) == 1<<20 and vals.sum(dtype=np.int64) == (1<<20)*((1<<20)+1)//2
dig = (vals.astype(np.int64) >> 10) & 2047
assert np.all(np.diff(dig) >= 0)
print(f"HW SANITY OK multipass 2^20 in {time.time()-t0:.1f}s (incl. compile)")
EOF

timeout 3600 python -m htm_hashjoin_tpu.harness skewprobe --scale 27 --reps 2 \
  --outDir $OUT --pipelineDepth 5 || echo "SKEWPROBE FAILED"

timeout 3600 python -m htm_hashjoin_tpu.harness TSizeAndShuffleWindowstoTime \
  --scale 27 --reps 1 --outDir ${OUT}_rep3 --pipelineDepth 5 || echo "TSIZE REP3 FAILED"

timeout 3600 python experiments/radix_crossover.py --out $OUT/radix_crossover_log \
  || echo "CROSSOVER FAILED"

timeout 1800 python experiments/adaptive_dial_bench.py --out $OUT/adaptive_dial_log \
  || echo "ADAPTIVE DIAL FAILED"

timeout 1800 python -m htm_hashjoin_tpu.harness AtomicsVsHTMVsNoCC --scale 27 \
  --reps 1 --counters --outDir ${OUT}_counters || echo "COUNTERS GRID FAILED"

timeout 1200 python experiments/compare_reference.py $OUT || true
echo "FOLLOWUP DONE"
