"""Headline benchmark: adaptive (HTM-equivalent) build+probe on locality data.

Workload mirrors the reference's headline configuration (BASELINE.md):
rSize = 2^27 keys with local_shuffle locality (the paper's central axis,
README.md:6), probed by a sorted 2^27 relation — full build+probe.

Baseline: the reference's own headline algorithm in full build+probe mode —
HTM with retry + overflow chains, 456,915 µs for 2^27 build + 2^27 probe
(experiments/overflow_log1:1) = 587.4 M tuples/s.  vs_baseline is our
throughput over that number (>1 ⇒ faster than the reference machine).

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


def main():
    from htm_hashjoin_tpu.ops import insert, probe
    from htm_hashjoin_tpu.relation import next_pow2
    from htm_hashjoin_tpu.data.generators import local_shuffled_keys, sorted_keys

    n = 1 << LOG2_N
    num_buckets = next_pow2(n // 3 + 1)

    rkeys = jax.block_until_ready(local_shuffled_keys(n, 16, 0))
    skeys = jax.block_until_ready(sorted_keys(n))

    @jax.jit
    def build_probe(rk, sk):
        res = insert.htm_optimistic_build(rk, num_buckets, retry=True,
                                          unique_keys=True)
        matches = probe.probe_buckets(res.table, sk, 3,
                                      lambda k, m: (k // 3) & m)
        return matches, probe.table_sum(res.table)

    # warm-up compile.  NOTE: on the axon platform block_until_ready does not
    # synchronize; a host readback (int()) is the only reliable fence.
    matches, out_sum = build_probe(rkeys, skeys)
    assert int(matches) == n, f"expected {n} matches, got {int(matches)}"
    assert int(out_sum) == n * (n + 1) // 2, "conservation violated"

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        m, _ = build_probe(rkeys, skeys)
        int(m)  # host readback fences device execution
        best = min(best, time.perf_counter() - t0)

    tuples_per_s = 2 * n / best
    value = tuples_per_s / 1e6
    ref_tuples_per_s = (2 << 27) / (REFERENCE_BUILD_PROBE_US / 1e6)
    print(json.dumps({
        "metric": "htm_adaptive_build_probe_local_shuffle_2^%d" % LOG2_N,
        "value": round(value, 1),
        "unit": "Mtuples/s",
        "vs_baseline": round(tuples_per_s / ref_tuples_per_s, 2),
        "seconds": round(best, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
