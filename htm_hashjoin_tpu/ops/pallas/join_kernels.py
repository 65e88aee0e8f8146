"""Pallas join megakernels: streaming tile sort + banded merge-count.

The TPU-native replacement for the reference's hot loops (SURVEY.md §3): the
hash+insert scatter loop, the probe/count loop and the sort+merge loops all
become two *megakernels* built from dense VPU ops (linops.py): a single
gridless pallas_call whose internal fori_loop streams T-element tiles
HBM→VMEM→HBM with manual DMA.  (On this platform a Pallas grid and per-call
dispatch both carry pathological overhead — one kernel invocation per
relation is the efficient shape.)

  * `sort_tiles`     — streams tiles; each is sorted in VMEM (bitonic, or
                       odd-even transposition for bounded-displacement /
                       locality data — the optimistic fast path).  A
                       tile-sorted relation IS the build artifact:
                       partitioned sorted runs (the TPU analog of the
                       locality-bucketed hash table, HTMHashBuild.hpp:41-45).
  * `banded_count`   — for each sorted R tile, DMAs the S-slice covering the
                       tile's value range (offsets precomputed by one
                       vectorized searchsorted — the "partition offsets" of
                       parallel_radix_join.c:588-598), bitonic-merges the two
                       sorted runs in VMEM, and counts matches with a
                       segmented-scan formula:

                       sort (key, tag) with R-before-S; A = cumsum(tag==0);
                       prevA = segment-start fill of A;  matches = Σ_{tag==1}
                       (A - prevA)   ==   Σ_v count_R(v) · count_S(v).

Key packing: (key, tag) packs into one int32 composite key*4 + tag for keys
< 2^29 (tags: 0=R, 1=S, 3=padding; INT32_MAX ≡ 3 (mod 4) makes the sentinel
its own pad tag).  The planner certifies key density; larger keys take the
XLA fallback path.

Mosaic lowering gotchas encoded here (each cost a debugging session):
  - python-int roll shifts trace as i64 under x64 → pass jnp.int32 shifts;
  - jnp.sum upcasts int32→int64 under x64 → linops.sum_all;
  - jnp.where on *boolean* branch arrays crashes the backend compiler →
    boolean algebra;
  - scalar reads of computed VMEM values (x[0,0]) stall the compiler →
    reduce with jnp.min over an all-equal array;
  - any pallas grid hangs the compile service → gridless megakernel + fori.
"""

from __future__ import annotations

import functools
import sys
import threading

# Unrolled compare-exchange networks trace to deep expression chains and
# Mosaic lowering recurses per-equation: raise the Python limit and give the
# lowering a large thread stack (call_with_big_stack).
sys.setrecursionlimit(max(sys.getrecursionlimit(), 1_000_000))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import linops

LANES = 128
MAXI32 = jnp.iinfo(jnp.int32).max  # 2^31 - 1, ≡ 3 (mod 4)
PACK_LIMIT = 1 << 29               # keys must be < 2^29 to pack key*4+tag

_BIG_STACK_BYTES = 1 << 31  # 2 GB: lowering frames are fat (≈4 KB each)


def call_with_big_stack(fn, *args, **kwargs):
    """Invoke fn on a thread with a 512 MB stack (Mosaic lowering recursion).
    Compilation caches persist process-wide, so only compiling calls pay the
    thread hop."""
    box = {}

    def runner():
        sys.setrecursionlimit(1_000_000)
        try:
            box["v"] = fn(*args, **kwargs)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            box["e"] = e

    old = threading.stack_size(_BIG_STACK_BYTES)
    try:
        t = threading.Thread(target=runner, name="mosaic-lowering")
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if "e" in box:
        raise box["e"]
    return box["v"]


# ---------------------------------------------------------------------------
# Kernel A: streaming tile sort
# ---------------------------------------------------------------------------

def _sort_megakernel(r_hbm, out_hbm, buf, obuf, sem_in, sem_out, *,
                     n_tiles: int, rows_per_tile: int, method: str,
                     passes: int):
    """Double-buffered streaming sort: tile t+1's load and tile t-1's
    writeback ride the DMA engines while tile t sorts in VMEM — the loop is
    bound by max(DMA, sort) instead of their sum (serialized DMA latency
    dominated the single-buffer version: ~2048 round trips per relation)."""
    two = jnp.int32(2)

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(t * rows_per_tile, rows_per_tile), :],
            buf.at[slot], sem_in.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[pl.ds(t * rows_per_tile,
                                            rows_per_tile), :],
            sem_out.at[slot])

    in_dma(jnp.int32(0), jnp.int32(0)).start()

    def body(t, carry):
        slot = jax.lax.rem(t, two)

        @pl.when(t + 1 < n_tiles)
        def _():
            in_dma(jax.lax.rem(t + 1, two), t + 1).start()

        in_dma(slot, t).wait()
        v = buf[slot]
        if method == "bitonic":
            v = linops.bitonic_sort_keys(v)
        elif method == "blocks":
            # shifted-block sorter: exact for displacement <= passes, far
            # fewer stages than odd-even at windows >= ~8
            v = linops.shifted_block_sort_keys(v, passes)
        else:
            v = linops.odd_even_passes_keys(v, passes)

        @pl.when(t >= 2)            # this obuf slot's previous writeback
        def _():
            out_dma(slot, t - 2).wait()

        obuf[slot] = v
        out_dma(slot, t).start()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
    # drain the last (up to) two in-flight writebacks
    last = jnp.int32(n_tiles - 1)
    out_dma(jax.lax.rem(last, two), last).wait()
    if n_tiles >= 2:
        out_dma(jax.lax.rem(last - 1, two), last - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("tile", "method", "passes", "interpret"))
def _sort_tiles_jit(keys2d: jax.Array, *, tile: int = 65536,
                    method: str = "bitonic", passes: int = 16,
                    interpret: bool = False) -> jax.Array:
    rows_per_tile = tile // LANES
    total_rows = keys2d.shape[0]
    assert total_rows % rows_per_tile == 0, (total_rows, rows_per_tile)
    n_tiles = total_rows // rows_per_tile
    kernel = functools.partial(_sort_megakernel, n_tiles=n_tiles,
                               rows_per_tile=rows_per_tile, method=method,
                               passes=passes)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(keys2d)


@functools.partial(jax.jit, static_argnames=("rows_per_tile",))
def tile_stats(sorted2d: jax.Array, rows_per_tile: int):
    """Per-tile [min, max-excluding-padding, sortedness-violations] computed
    in XLA over the kernel's output (cheap streaming reductions).

    `violations` is the abort-fraction analog (HTMHashBuild.hpp:150-154): a
    nonzero count means the optimistic odd-even pass count underestimated the
    data's displacement and the caller must retry with the exact sorter.
    """
    f = sorted2d.shape[0] // rows_per_tile
    tiles = sorted2d.reshape(f, rows_per_tile * LANES)
    mins = tiles[:, 0]
    maxs = jnp.max(jnp.where(tiles == MAXI32, jnp.int32(-(1 << 31)), tiles),
                   axis=1)
    viols = jnp.sum(tiles[:, 1:] < tiles[:, :-1], axis=1, dtype=jnp.int64)
    return mins, maxs, viols


def sort_tiles(keys2d, **kwargs):
    """Sort each T-element tile of keys2d ((rows,128) int32, MAXI32-padded,
    rows divisible by tile/128).  method='oddeven' runs `passes` odd-even
    rounds — exact for displacement ≤ passes (the locality regime)."""
    return call_with_big_stack(_sort_tiles_jit, keys2d, **kwargs)


# ---------------------------------------------------------------------------
# Kernel B: banded merge-count
# ---------------------------------------------------------------------------

def _count_megakernel(row_off_smem, n_chunks_smem, r_hbm, s_hbm, out_ref,
                      rbuf, sbuf0, sbufn, sem_r, sem_s0, sem_sn, *,
                      n_tiles: int, rows_per_tile: int, max_chunks: int,
                      unique_both: bool = False):
    """Double-buffered banded count: the loop is bound by max(DMA, merge)
    instead of their sum (serialized per-tile DMA latency dominated the
    single-buffer version).  Three independent pipelines:

      rbuf[2]   R tiles, slot = tile parity, prefetched one tile ahead;
      sbuf0[2]  chunk 0 of each tile, slot = tile parity, prefetched
                UNCONDITIONALLY one tile ahead (row_off is a valid row even
                for chunkless tiles, and every body waits the DMA, so the
                semaphore stays balanced — no deadlock for any n_chunks
                pattern, including long overflow runs);
      sbufn[2]  chunks >= 1, slot = chunk parity, prefetched one chunk ahead
                within the tile.
    """
    del max_chunks  # chunk loop bound is dynamic per tile
    out_ref[:] = jnp.zeros((8, LANES), jnp.int32)
    merged_rows = 2 * rows_per_tile
    two = jnp.int32(2)
    # hoisted vector constants: Mosaic recurses on scalar where-branches and
    # bool→int astype inside kernel loops — keep every select vector/vector
    ones_m = jnp.ones((merged_rows, LANES), jnp.int32)
    zeros_m = jnp.zeros((merged_rows, LANES), jnp.int32)
    neg_m = -ones_m

    def r_dma(slot, t):
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(t * rows_per_tile, rows_per_tile), :],
            rbuf.at[slot], sem_r.at[slot])

    def s0_dma(slot, t):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(row_off_smem[t], rows_per_tile), :],
            sbuf0.at[slot], sem_s0.at[slot])

    def sn_dma(slot, t, c):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(row_off_smem[t] + c * rows_per_tile,
                           rows_per_tile), :],
            sbufn.at[slot], sem_sn.at[slot])

    r_dma(jnp.int32(0), jnp.int32(0)).start()
    s0_dma(jnp.int32(0), jnp.int32(0)).start()

    def body(t, carry):
        tslot = jax.lax.rem(t, two)
        nslot = jax.lax.rem(t + 1, two)

        @pl.when(t + 1 < n_tiles)
        def _():
            r_dma(nslot, t + 1).start()
            s0_dma(nslot, t + 1).start()

        r_dma(tslot, t).wait()
        s0_dma(tslot, t).wait()   # unconditional: keeps sem_s0 balanced
        rk = rbuf[tslot]
        comp_r = jnp.where(rk >= PACK_LIMIT, jnp.int32(MAXI32), rk * 4)

        def chunk_body(c, carry2):
            cslot = jax.lax.rem(c, two)

            @pl.when(c + 1 < n_chunks_smem[t])
            def _():
                sn_dma(jax.lax.rem(c + 1, two), t, c + 1).start()

            @pl.when(c >= 1)
            def _():
                sn_dma(cslot, t, c).wait()

            # chunk 0 lives in the tile-parity pool, later chunks in the
            # chunk-parity pool; a vector select keeps one merge instance
            is0 = jnp.broadcast_to(c == 0, (rows_per_tile, LANES))
            sk = jnp.where(is0, sbuf0[tslot], sbufn[cslot])
            comp_s = jnp.where(sk >= PACK_LIMIT, jnp.int32(MAXI32),
                               sk * 4 + 1)
            merged = linops.merge_two_sorted_keys(comp_r, comp_s)
            if unique_both:
                # both sides unique (PK ⋈ permutation — the headline
                # oracle): an S element (4k+1) matches iff its immediate
                # predecessor is its R copy (4k) — one shift replaces both
                # linear scans of the general formula.
                prev = linops.lshift(merged, -1, jnp.int32(-2))
                hit = ((merged - prev) == 1) & ((merged & 3) == 1)
                contrib = jnp.where(hit, ones_m, zeros_m)
            else:
                tag = merged & 3
                rcnt = jnp.where(tag == 0, ones_m, zeros_m)
                a = linops.cumsum_linear(rcnt)
                keyv = merged >> 2
                run_start = keyv != linops.lshift(keyv, -1, jnp.int32(-1))
                prev_a = linops.cummax_linear(
                    jnp.where(run_start, a - rcnt, neg_m))
                contrib = jnp.where(tag == 1, a - prev_a, zeros_m)
            # fold (2*rows, 128) contributions into the (8, 128) accumulator
            # with a mod-8 roll tree — no traced scalars anywhere
            y = contrib
            s = 8
            while s < merged_rows:
                y = y + pltpu.roll(y, jnp.int32(s), axis=0)
                s *= 2
            out_ref[:] = out_ref[:] + y[:8, :]
            return carry2

        jax.lax.fori_loop(jnp.int32(0), n_chunks_smem[t], chunk_body,
                          jnp.int32(0))
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))


@functools.partial(jax.jit,
                   static_argnames=("tile", "max_chunks", "unique_both",
                                    "interpret"))
def _banded_count_jit(r_sorted2d: jax.Array, s2d: jax.Array,
                      row_off: jax.Array, n_chunks: jax.Array, *,
                      tile: int = 65536, max_chunks: int = 4,
                      unique_both: bool = False,
                      interpret: bool = False) -> jax.Array:
    assert max_chunks <= LANES
    rows_per_tile = tile // LANES
    n_tiles = r_sorted2d.shape[0] // rows_per_tile
    kernel = functools.partial(_count_megakernel, n_tiles=n_tiles,
                               rows_per_tile=rows_per_tile,
                               max_chunks=max_chunks,
                               unique_both=unique_both)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row_off, n_chunks, r_sorted2d, s2d)


def banded_count(*args, **kwargs):
    """Match counts of tile-sorted R against sorted S.

    args: r_sorted2d (F*rows_per_tile, 128); s2d (rows, 128) globally sorted,
    end-padded with ≥ max_chunks*rows_per_tile rows of MAXI32; row_off (F,)
    int32 S-slice start rows; n_chunks (F,) int32 chunk counts (0 skips the
    tile — used for the host-side overflow fallback).

    Returns an (8, 128) int32 accumulator grid; sum for the total.
    """
    return call_with_big_stack(_banded_count_jit, *args, **kwargs)
