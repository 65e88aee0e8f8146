"""HBM bandwidth microbench — TestBed.cpp:10-38 re-done for device memory.

The reference times a TBB-parallel memcpy of 2^27 × 8 B to sanity-check the
machine's DRAM bandwidth (the roofline every build phase is judged
against).  Here the same fixture is a jitted device-to-device copy: an
elementwise identity forces a full HBM read + write of the buffer, so
GB/s ≈ 2 × bytes / time — the number to compare kernel throughput against.
"""

from __future__ import annotations

import json
import time
from typing import Dict

import jax
import jax.numpy as jnp


def memory_bandwidth(log2_elems: int = 27, reps: int = 5) -> Dict[str, float]:
    """Copy 2^log2_elems int64s on device; report GB/s (read+write)."""
    n = 1 << log2_elems
    src = jnp.arange(n, dtype=jnp.int64)
    copy = jax.jit(lambda a: a + 0)
    jax.block_until_ready(copy(src))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(copy(src))
        best = min(best, time.perf_counter() - t0)
    nbytes = n * 8
    return {
        "benchmark": "testbed_memcpy",
        "elems": n,
        "bytes": nbytes,
        "bestTimeUsecs": best * 1e6,
        "gbps": 2 * nbytes / best / 1e9,   # read + write traffic
    }


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log2Elems", type=int, default=27)
    p.add_argument("--reps", type=int, default=5)
    a = p.parse_args(argv)
    print(json.dumps(memory_bandwidth(a.log2Elems, a.reps)))
    return 0
