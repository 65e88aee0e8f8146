"""Headline benchmark: adaptive (HTM-equivalent) build+probe on locality data.

Workload mirrors the reference's headline configuration (BASELINE.md):
rSize = 2^27 keys with local_shuffle locality (the paper's central axis,
README.md:6), probed by a sorted 2^27 relation — full build+probe.

Engine: the Pallas banded join (joins/pallas_backend.py) — optimistic
odd-even tile sort (the transaction analog; violations = aborts, bitonic
retry = TM_RETRY) + banded merge-count probe, run as a fence-free device
pipeline with a single host readback.

Baseline: the reference's own headline algorithm in full build+probe mode —
HTM with retry + overflow chains, 456,915 µs for 2^27 build + 2^27 probe
(experiments/overflow_log1:1) = 587.4 M tuples/s counting both sides.
vs_baseline is our throughput over that number (>1 ⇒ faster than the
reference machine).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mtuples/s", "vs_baseline": N}
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

REFERENCE_BUILD_PROBE_US = 456_915.0     # experiments/overflow_log1:1
LOG2_N = int(os.environ.get("BENCH_LOG2_N", "27"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
WINDOW = int(os.environ.get("BENCH_WINDOW", "16"))


def main():
    from htm_hashjoin_tpu.joins.pallas_backend import (banded_join_pipelined,
                                                       enqueue_banded_join,
                                                       prepare_probe_side)
    from htm_hashjoin_tpu.data.generators import local_shuffled_keys, sorted_keys

    n = 1 << LOG2_N
    rkeys = local_shuffled_keys(n, WINDOW, 0)
    skeys = sorted_keys(n)
    s2d = prepare_probe_side(skeys)
    # NOTE: on the axon platform block_until_ready does not synchronize; a
    # host readback (int()/np.asarray) is the only reliable fence.  The
    # pipelined join ends in exactly one such readback.
    int(rkeys[0]); int(skeys[0]); int(s2d[0, 0])   # inputs resident on device

    # warm-up: compiles every kernel and validates correctness + conservation
    # (both sides are permutations of 1..N — the unique-keys count applies)
    out = banded_join_pipelined(rkeys, skeys, locality_window=WINDOW,
                                unique_both=True, s2d=s2d)
    assert out.matches == n, f"expected {n} matches, got {out.matches}"
    assert out.output_sum == n * (n + 1) // 2, "conservation violated"
    assert out.violations == 0 and out.overflow_tiles == 0

    # single-run latency: one join, one host fence.  On this platform the
    # fence costs ~24 ms of REMOTE-TUNNEL round trip (an axon artifact the
    # reference's local host never pays), so the headline is sustained
    # throughput over PIPE back-to-back joins fenced once — the production
    # serving shape — with the single-run latency reported alongside.
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = banded_join_pipelined(rkeys, skeys, locality_window=WINDOW,
                                    unique_both=True, s2d=s2d)
        best = min(best, time.perf_counter() - t0)
    assert out.matches == n

    import numpy as np
    pipe = int(os.environ.get("BENCH_PIPE", "5"))
    best_pipe = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _j in range(pipe):
            res = enqueue_banded_join(rkeys, skeys, locality_window=WINDOW,
                                      unique_both=True, s2d=s2d)
        bundle = np.asarray(jnp.stack(res[:5]))     # ONE fence for the batch
        best_pipe = min(best_pipe, (time.perf_counter() - t0) / pipe)
    assert int(bundle[0]) == n and int(bundle[1]) == 0 and int(bundle[2]) == 0
    assert int(bundle[3]) == int(bundle[4]) == n * (n + 1) // 2

    tuples_per_s = 2 * n / best_pipe
    value = tuples_per_s / 1e6
    ref_tuples_per_s = (2 << 27) / (REFERENCE_BUILD_PROBE_US / 1e6)
    print(json.dumps({
        "metric": "htm_adaptive_build_probe_local_shuffle_2^%d" % LOG2_N,
        "value": round(value, 1),
        "unit": "Mtuples/s",
        "vs_baseline": round(tuples_per_s / ref_tuples_per_s, 2),
        "seconds": round(best_pipe, 4),
        "single_run_seconds": round(best, 4),
        "single_run_vs_baseline": round(
            (2 * n / best) / ref_tuples_per_s, 2),
        "pipeline_depth": pipe,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
