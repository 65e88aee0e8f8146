"""Phase breakdown of the banded pipeline on the real chip (dev tool).

Times each device stage of banded_join_pipelined separately (sort, stats,
offsets, count) with one readback fence per measurement, min of REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from htm_hashjoin_tpu.joins.pallas_backend import (
    LANES, _banded_join_device, _slice_offsets, prepare_probe_side,
    to_tiles_2d)
from htm_hashjoin_tpu.ops.pallas.join_kernels import (banded_count,
                                                      banded_count_narrow,
                                                      sort_tiles, tile_stats)
from htm_hashjoin_tpu.data.generators import local_shuffled_keys, sorted_keys

LOG2_N = int(os.environ.get("BENCH_LOG2_N", "27"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
WINDOW = 16
TILE = 65536

n = 1 << LOG2_N
rkeys = local_shuffled_keys(n, WINDOW, 0)
skeys = sorted_keys(n)
r2d = to_tiles_2d(rkeys, TILE)
s2d = prepare_probe_side(skeys, TILE)
int(r2d[0, 0]); int(s2d[0, 0]); int(skeys[0])

rows_per_tile = TILE // LANES


@jax.jit
def _fence_scalar(x):
    return jnp.min(x.reshape(-1)[:1])


INNER = int(os.environ.get("BENCH_INNER", "10"))


def timeit(label, fn):
    # Enqueue INNER dispatches and fence ONCE on a derived scalar: the
    # ~25-40 ms (and noisy) tunnel sync is paid once per measurement, so
    # per-call time = (window - sync) / INNER with sync amortized away.
    out = fn()          # warm-up/compile
    _ = int(_fence_scalar(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _i in range(REPS):
        t0 = time.perf_counter()
        for _j in range(INNER):
            out = fn()
        _ = int(_fence_scalar(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / INNER)
    print(f"{label:28s} {best*1e3:9.2f} ms")
    return out


sorted2d, stats = timeit("sort+stats blocks(w=16)", lambda: sort_tiles(
    r2d, tile=TILE, method="blocks", passes=WINDOW))
timeit("sort+stats oddeven(w=16)", lambda: sort_tiles(
    r2d, tile=TILE, method="oddeven", passes=WINDOW))
timeit("sort+stats bitonic", lambda: sort_tiles(r2d, tile=TILE,
                                                method="bitonic"))
mins, maxs, viols = timeit("tile_stats (XLA)", lambda: tile_stats(
    sorted2d, rows_per_tile))
mins, maxs = stats[:, 0], stats[:, 1]
off, end = timeit("slice_offsets", lambda: _slice_offsets(skeys, mins, maxs))
row_off = (off // LANES).astype(jnp.int32)
n_chunks = jnp.minimum(
    ((jnp.maximum((end + LANES - 1) // LANES - off // LANES, 0)
      + rows_per_tile - 1) // rows_per_tile), 4).astype(jnp.int32)
int(row_off[0]); int(n_chunks[0])
timeit("banded_count unique", lambda: banded_count(
    sorted2d, s2d, row_off, n_chunks, tile=TILE, unique_both=True))
timeit("banded_count general", lambda: banded_count(
    sorted2d, s2d, row_off, n_chunks, tile=TILE, unique_both=False))
rows_needed = jnp.maximum((end + LANES - 1) // LANES - off // LANES,
                          0).astype(jnp.int32)
int(rows_needed[0])
timeit("narrow_count unique", lambda: banded_count_narrow(
    sorted2d, s2d, row_off, rows_needed, tile=TILE, unique_both=True))
timeit("narrow_count general", lambda: banded_count_narrow(
    sorted2d, s2d, row_off, rows_needed, tile=TILE, unique_both=False))
timeit("full pipeline chain", lambda: _banded_join_device(
    r2d, s2d, skeys, tile=TILE, method="oddeven", passes=WINDOW,
    max_chunks=4, unique_both=True, narrow=True, interpret=False)[0])
