"""Round-4 profiling: decompose the 2^27 global-sort cost and measure the
candidate skew-repair primitives on the real chip.

Measurements (each pipelined: enqueue K, fence once — the platform pays
~25 ms per host fence, see .claude/skills/verify/SKILL.md):

  A. sort_tiles oddeven passes=1  — 1 HBM pass + ~4 CE stages (DMA anchor)
  B. sort_tiles bitonic           — 1 HBM pass + 136 CE stages (slope anchor)
  C. global_sort_tiles            — 27 passes + 378 stages (the 197 ms target)
  D. per-level gsort passes       — where the time goes by level
  E. jnp.sort (XLA)               — the baseline the megakernel replaced
  F. searchsorted 'scan' counts   — Q sorted queries into sorted 2^27 S
                                    (candidate θ-skew repair primitive)
  G. probe_sorted tagged sort     — the current repair primitive at 2^28

From A and B: per-CE-stage cost = (B - A) / 132, per-pass DMA floor ≈ A.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from htm_hashjoin_tpu.joins.pallas_backend import (to_tiles_2d,
                                                   to_tiles_2d_pow2)
from htm_hashjoin_tpu.ops.pallas.join_kernels import (GSORT_BITS,
                                                      call_with_big_stack,
                                                      _gsort_pass_jit,
                                                      _sort_tiles_jit,
                                                      global_sort_tiles)
from htm_hashjoin_tpu.ops import probe as probe_ops

N = 1 << 27
TILE = 65536
DEPTH = 4


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    # slice ON DEVICE before the readback — np.asarray of the full array
    # would stream hundreds of MB over the ~45 MB/s host tunnel
    return np.asarray(leaf.reshape(-1)[:1])


def timed(label, fn, *args, depth=DEPTH, **kwargs):
    out = fn(*args, **kwargs)          # compile + warm
    fence(out)
    t0 = time.perf_counter()
    for _ in range(depth):
        out = fn(*args, **kwargs)
    fence(out)
    dt = (time.perf_counter() - t0) / depth
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return dt


def main(steps):
    key = jax.random.PRNGKey(0)
    keys = jax.random.permutation(key, jnp.arange(1, N + 1, dtype=jnp.int32))
    r2d = to_tiles_2d_pow2(keys, TILE)
    fence(r2d)
    n_tiles = r2d.shape[0] // (TILE // 128)
    print(f"n = 2^27, tiles = {n_tiles}", flush=True)

    if "a" in steps or "b" in steps:
        a = timed("A sort_tiles oddeven p=1 (1 pass, ~4 st)",
                  lambda: call_with_big_stack(_sort_tiles_jit, r2d, tile=TILE,
                                              method="oddeven", passes=1)[0])
        b = timed("B sort_tiles bitonic (1 pass, 136 st)",
                  lambda: call_with_big_stack(_sort_tiles_jit, r2d, tile=TILE,
                                              method="bitonic")[0])
        per_stage = (b - a) / 132
        print(f"   -> per-CE-stage {per_stage*1e3:.3f} ms; "
              f"per-pass DMA floor ~{a*1e3:.1f} ms", flush=True)

    if "c" in steps:
        timed("C global_sort_tiles (27 passes, 378 st)",
              lambda: global_sort_tiles(r2d, tile=TILE))

    if "d" in steps:
        # D: individual gsort levels (level j, all its chunks)
        levels = n_tiles.bit_length() - 1
        srt = call_with_big_stack(_sort_tiles_jit, r2d, tile=TILE,
                                  method="bitonic_alt")[0]
        for j in (1, 4, 8, levels):
            stage_bits = list(range(j - 1, -1, -1))
            chunks = [tuple(stage_bits[i:i + GSORT_BITS])
                      for i in range(0, len(stage_bits), GSORT_BITS)]

            def run_level(x=srt, j=j, chunks=chunks):
                cur = x
                for ci, chunk in enumerate(chunks):
                    cur = call_with_big_stack(
                        _gsort_pass_jit, cur, tile=TILE, bits=chunk, level=j,
                        include_local=(ci == len(chunks) - 1),
                        final_level=(j == levels))
                return cur
            timed(f"D gsort level {j:2d} ({len(chunks)} pass, "
                  f"{j}+16 st)", run_level)

    if "e" in steps:
        timed("E jnp.sort 2^27 (XLA)", jax.jit(jnp.sort), keys)

    if "f" in steps:
        # F: searchsorted-scan counts: Q sorted queries into sorted S
        s_sorted = jnp.sort(keys)
        fence(s_sorted)

        @jax.jit
        def ss_counts(q, s):
            lo = jnp.searchsorted(s, q, side="left", method="scan")
            hi = jnp.searchsorted(s, q, side="right", method="scan")
            return jnp.sum((hi - lo).astype(jnp.int64))

        for qlog in (16, 20, 22):
            q = jnp.sort(jax.random.randint(jax.random.PRNGKey(1),
                                            (1 << qlog,), 1, N,
                                            dtype=jnp.int32))
            fence(q)
            timed(f"F searchsorted-scan 2^{qlog} -> 2^27", ss_counts, q,
                  s_sorted)

    if "g" in steps:
        s_sorted = jnp.sort(keys)
        qq = jax.random.randint(jax.random.PRNGKey(2), (1 << 22,), 1, N,
                                dtype=jnp.int32)
        fence(qq)
        timed("G probe_sorted tagged sort 2^22+2^27",
              jax.jit(probe_ops.probe_sorted), qq, s_sorted, depth=2)

    if "h" in steps:
        # H: Wisconsin match-bounds primitives — int64 vs int32 tagged
        # sort_key_val at multijoin scale
        rows = jnp.arange(N, dtype=jnp.int32)

        @jax.jit
        def skv64(k, v):
            return jax.lax.sort_key_val(k.astype(jnp.int64), v)

        @jax.jit
        def skv32(k, v):
            return jax.lax.sort_key_val(k, v)

        timed("H sort_key_val int64 2^27", skv64, keys, rows, depth=2)
        timed("H sort_key_val int32 2^27", skv32, keys, rows)

        @jax.jit
        def gather24(tbl, idx):
            return jnp.sum(tbl[idx], dtype=jnp.int64)

        tbl = jnp.arange(1 << 24, dtype=jnp.int32)
        idx = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, 1 << 24,
                                 dtype=jnp.int32)
        fence(idx)
        timed("H random gather 2^27 from 2^24", gather24, tbl, idx)


if __name__ == "__main__":
    main(set("".join(sys.argv[1:]).lower() or "abcdefgh"))
