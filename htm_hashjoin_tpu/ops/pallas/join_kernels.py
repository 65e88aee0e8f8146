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
# Shared kernel bodies (one definition — these are the correctness-critical
# cores; the sort and count megakernels must never diverge on them)
# ---------------------------------------------------------------------------


def make_contributions(unique_both: bool):
    """Per-position match contributions of a merged (key*4+tag) sequence —
    the segmented-count formula (module docstring), or the single-shift
    adjacency form when BOTH sides are certified unique."""
    def contributions(merged, ones, zeros, neg):
        if unique_both:
            prev = linops.lshift(merged, -1, jnp.int32(-2))
            hit = ((merged - prev) == 1) & ((merged & 3) == 1)
            return jnp.where(hit, ones, zeros)
        tag = merged & 3
        rcnt = jnp.where(tag == 0, ones, zeros)
        a = linops.cumsum_linear(rcnt)
        keyv = merged >> 2
        run_start = keyv != linops.lshift(keyv, -1, jnp.int32(-1))
        prev_a = linops.cummax_linear(jnp.where(run_start, a - rcnt, neg))
        return jnp.where(tag == 1, a - prev_a, zeros)
    return contributions


def make_tile_stats_row(method: str, rows_per_tile: int):
    """Per-tile stats row: lane 0 = min, lane 1 = max (padding excluded),
    lane 2 = sortedness violations (0 for the exact bitonic sorters)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, LANES), 0)
    is_last = (row == rows_per_tile - 1) & (lane == LANES - 1)
    last_lane = lane == LANES - 1
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def tile_stats_row(v):
        mn = jnp.min(v)
        mx = jnp.max(jnp.where(v == MAXI32, jnp.int32(-(1 << 31)), v))
        if method.startswith("bitonic"):   # exact sorters: no violations
            cnt = jnp.int32(0)
        else:
            nxt = pltpu.roll(v, jnp.int32(LANES - 1), axis=1)  # v[i+1]
            nxt = jnp.where(
                last_lane, pltpu.roll(nxt, jnp.int32(rows_per_tile - 1),
                                      axis=0), nxt)
            bad = (v > nxt) & ~is_last
            # count as int32 (jnp.sum upcasts via int64 under x64 and
            # lax.reduce has no Mosaic lowering): roll-fold rows mod 8,
            # then the cheap small-array total
            y = jnp.where(bad, jnp.int32(1), jnp.int32(0))
            step = 8
            while step < rows_per_tile:
                y = y + pltpu.roll(y, jnp.int32(step), axis=0)
                step *= 2
            cnt = linops.sum_all(y[:8, :])
        return jnp.where(srow == 0, mn,
                         jnp.where(srow == 1, mx,
                                   jnp.where(srow == 2, cnt, jnp.int32(0))))
    return tile_stats_row


# ---------------------------------------------------------------------------
# Kernel A: streaming tile sort
# ---------------------------------------------------------------------------

def _sort_megakernel(r_hbm, out_hbm, stats_ref, buf, obuf, sem_in, sem_out, *,
                     n_tiles: int, rows_per_tile: int, method: str,
                     passes: int):
    """Double-buffered streaming sort: tile t+1's load and tile t-1's
    writeback ride the DMA engines while tile t sorts in VMEM — the loop is
    bound by max(DMA, sort) instead of their sum (serialized DMA latency
    dominated the single-buffer version: ~2048 round trips per relation).

    While each sorted tile is still in VMEM, its stats row is written to
    stats_ref[t]: lane 0 = min key, lane 1 = max key (padding excluded),
    lane 2 = sortedness violations.  This replaces a full XLA re-read of the
    sorted relation (the old tile_stats pass).  The exact sorter skips the
    violation count — its output is sorted by construction."""
    two = jnp.int32(2)
    tile_stats_row = make_tile_stats_row(method, rows_per_tile)

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
        elif method == "bitonic_alt":
            # global-sort phase A: tile t ascending iff t is even, so each
            # 2-tile block starts the cross-tile network bitonic
            v = linops.bitonic_sort_keys(v, final_asc=(jax.lax.rem(t, two)
                                                       == 0))
        elif method == "blocks":
            # shifted-block sorter: exact for displacement <= passes, far
            # fewer stages than odd-even at windows >= ~8
            v = linops.shifted_block_sort_keys(v, passes)
        else:
            v = linops.odd_even_passes_keys(v, passes)
        stats_ref[pl.ds(t, 1), :] = tile_stats_row(v)

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
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, LANES), jnp.int32)),
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
    rounds — exact for displacement ≤ passes (the locality regime).

    Returns (sorted2d, stats) where stats is (n_tiles, 128) int32 with
    lane 0 = per-tile min, lane 1 = max (padding excluded), lane 2 =
    sortedness violations (always 0 for the exact bitonic method)."""
    return call_with_big_stack(_sort_tiles_jit, keys2d, **kwargs)


# ---------------------------------------------------------------------------
# Kernel C: global bitonic sort (grouped cross-tile stages)
# ---------------------------------------------------------------------------
#
# The sort-first (radix) plan for data without locality needs R *globally*
# sorted.  XLA's jnp.sort costs ~423 ms at 2^27 on v5e — 6.7x our in-VMEM
# bitonic tile sort per element — so the global sort is built from the same
# megakernel machinery: phase A tile-sorts with alternating directions; then
# each bitonic level's cross-tile stages (partner tile = tile XOR 2^b) are
# processed in GROUPS of GSORT_BITS tile-index bits: the 2^GSORT_BITS tiles
# of a group are stacked in VMEM, where the group's stages become pure
# row-stride XOR exchanges (_ce_keys), and the level's final group fuses the
# 16 intra-tile stages before writeback.  HBM traffic: sum over levels j of
# ceil(j/GSORT_BITS) full read+write passes — vs jnp.sort's many.
#
# Direction bookkeeping: at level kk = T·2^j, ascending ⇔ global index bit
# kk is clear.  That bit is tile-index bit j, which is NEVER among the
# level's stage bits (those are j-1..0) — so the direction is one traced
# scalar per group, broadcast over the stack.

GSORT_BITS = 4   # 16-member groups: fewer full HBM passes per level.
# Admissible since the scoped-vmem budget is raised on the pass kernel
# (r5): measured 147.6 -> 140.7 ms single-fenced at 2^27.

# Phase-A blocks span 2^GSORT_PHASE_A_BITS tiles (2^18 elements at the
# default tile): the in-VMEM bitonic network over the bigger block replaces
# levels 1..2 of the cross-tile phase at IDENTICAL compare-exchange count
# (the n·log² invariance) while deleting those levels' two full HBM
# passes and their dispatch latency.  VMEM: 2 slots × 2 buffers × 1 MB.
# NOT 3: the 2^19-block network (190 stages × 512 vregs) wedged the remote
# Mosaic compile service for >20 min; the 2^18 program compiles.
GSORT_PHASE_A_BITS = 2


def _gsort_pass_kernel(in_hbm, out_hbm, buf, obuf, sem_in, sem_out, *,
                       n_tiles: int, rows_per_tile: int, bits: tuple,
                       level: int, include_local: bool, final_level: bool):
    """One pass of cross-tile stages for tile-index `bits` (descending) of
    bitonic level `level` (blocks of 2^level tiles), double-buffered."""
    g = len(bits)
    members = 1 << g
    stack_rows = members * rows_per_tile
    n_groups = n_tiles // members
    two = jnp.int32(2)

    # tile_id(group, m) = base(group) with member bits spread over `bits`
    def tile_of(gi, m):
        # insert the member bits into the group index at positions `bits`
        # (static positions, traced gi) — lowest position first
        tid = gi
        for pos in sorted(bits):
            low = jax.lax.rem(tid, jnp.int32(1 << pos))
            high = tid - low
            tid = high * 2 + low
        for k, pos in enumerate(sorted(bits, reverse=True)):
            tid = tid + jnp.int32(((m >> (g - 1 - k)) & 1)) * (1 << pos)
        return tid

    def in_dma(slot, gi, m):
        # m is a static python int; index as int32 (a bare int traces as
        # i64 under x64, which Mosaic's memref_slice rejects)
        return pltpu.make_async_copy(
            in_hbm.at[pl.ds(tile_of(gi, m) * rows_per_tile, rows_per_tile),
                      :],
            buf.at[slot, pl.ds(m * rows_per_tile, rows_per_tile), :],
            sem_in.at[slot, jnp.int32(m)])

    def out_dma(slot, gi, m):
        return pltpu.make_async_copy(
            obuf.at[slot, pl.ds(m * rows_per_tile, rows_per_tile), :],
            out_hbm.at[pl.ds(tile_of(gi, m) * rows_per_tile, rows_per_tile),
                       :],
            sem_out.at[slot, jnp.int32(m)])

    for m in range(members):
        in_dma(jnp.int32(0), jnp.int32(0), m).start()

    def body(gi, carry):
        slot = jax.lax.rem(gi, two)

        @pl.when(gi + 1 < n_groups)
        def _():
            for m in range(members):
                in_dma(jax.lax.rem(gi + 1, two), gi + 1, m).start()

        for m in range(members):
            in_dma(slot, gi, m).wait()
        v = buf[slot]
        if final_level:
            flip = None
        else:
            # direction bit: tile-index bit `level` of the group's base —
            # equal across members; one traced scalar broadcast.  Descending
            # groups run in the FLIP representation (~v reverses order), so
            # every stage uses the cheap ascending compare-exchange (5 ops
            # instead of the 8-op dual-direction select — linops.
            # bitonic_sort_keys has the same optimization)
            d = (jax.lax.rem(jax.lax.div(tile_of(gi, 0),
                                         jnp.int32(1 << level)), two) == 0)
            flip = jnp.broadcast_to(~d, (stack_rows, LANES))
            v = jnp.where(flip, ~v, v)
        for k, pos in enumerate(sorted(bits, reverse=True)):
            s = (1 << (g - 1 - k)) * rows_per_tile * LANES
            v = linops._ce_keys(v, s)
        if include_local:
            s = rows_per_tile * LANES // 2
            while s >= 1:
                v = linops._ce_keys(v, s)
                s //= 2
        if flip is not None:
            v = jnp.where(flip, ~v, v)

        @pl.when(gi >= 2)
        def _():
            for m in range(members):
                out_dma(slot, gi - 2, m).wait()

        obuf[slot] = v
        for m in range(members):
            out_dma(slot, gi, m).start()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_groups), body, jnp.int32(0))
    last = jnp.int32(n_groups - 1)
    for m in range(members):
        out_dma(jax.lax.rem(last, two), last, m).wait()
    if n_groups >= 2:
        for m in range(members):
            out_dma(jax.lax.rem(last - 1, two), last - 1, m).wait()


@functools.partial(jax.jit, static_argnames=("tile", "bits", "level",
                                             "include_local", "final_level",
                                             "interpret"))
def _gsort_pass_jit(keys2d, *, tile: int, bits: tuple, level: int,
                    include_local: bool, final_level: bool,
                    interpret: bool = False):
    rows_per_tile = tile // LANES
    n_tiles = keys2d.shape[0] // rows_per_tile
    members = 1 << len(bits)
    kernel = functools.partial(
        _gsort_pass_kernel, n_tiles=n_tiles, rows_per_tile=rows_per_tile,
        bits=bits, level=level, include_local=include_local,
        final_level=final_level)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, members * rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, members * rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2, members)),
            pltpu.SemaphoreType.DMA((2, members)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # allow wider groupings (bits=4: 16-member stacks) than the
            # 16 MB scoped-vmem compiler default admits
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(keys2d)


def global_sort_tiles(keys2d, *, tile: int = 65536, interpret: bool = False):
    """Globally sort keys2d ((rows,128) int32, MAXI32-padded) ascending via
    the grouped bitonic megakernels.  The tile count must be a power of two
    (to_tiles_2d_pow2 pads).  Returns the sorted (rows,128) array."""
    rows_per_tile = tile // LANES
    n_tiles = keys2d.shape[0] // rows_per_tile
    assert n_tiles & (n_tiles - 1) == 0, n_tiles
    levels = n_tiles.bit_length() - 1
    # phase A: in-VMEM sort of 2^pa_bits-tile blocks, direction alternating
    # by BLOCK parity (= tile-index bit pa_bits — exactly the direction
    # level pa_bits+1 expects)
    pa_bits = min(GSORT_PHASE_A_BITS, levels)
    cur = call_with_big_stack(
        _sort_tiles_jit, keys2d, tile=tile << pa_bits,
        method="bitonic" if levels == pa_bits else "bitonic_alt",
        interpret=interpret)[0]
    for j in range(pa_bits + 1, levels + 1):
        stage_bits = list(range(j - 1, -1, -1))
        chunks = [stage_bits[i:i + GSORT_BITS]
                  for i in range(0, len(stage_bits), GSORT_BITS)]
        for ci, chunk in enumerate(chunks):
            cur = call_with_big_stack(
                _gsort_pass_jit, cur, tile=tile, bits=tuple(chunk), level=j,
                include_local=(ci == len(chunks) - 1),
                final_level=(j == levels), interpret=interpret)
    return cur


# ---------------------------------------------------------------------------
# Kernel C-kv: key-value global sort (the partition-split engine)
# ---------------------------------------------------------------------------
#
# Same grouped-bitonic structure as Kernel C, carrying a 32-bit value array
# through every compare-exchange (linops._ce_kv).  Exists for the probe-side
# partition split at reference scale: XLA's stable sort_key_val moves the
# 256M-row (key, payload) table in ~1.7 s; this network does it in ~0.6 s
# (keys-only gsort measures 0.30 s at 2^28 — r5_split_bench).  VMEM budget
# halves the member count (GSORT_KV_BITS=2) and the phase-A block
# (GSORT_KV_PHASE_A_BITS=1): buffers are 2 arrays x 2 slots x in/out.

GSORT_KV_BITS = 3
GSORT_KV_PHASE_A_BITS = 1


def _sort_kv_megakernel(k_hbm, v_hbm, ok_hbm, ov_hbm, kbuf, vbuf, okbuf,
                        ovbuf, sem_ki, sem_vi, sem_ko, sem_vo, *,
                        n_tiles: int, rows_per_tile: int, method: str):
    """Double-buffered streaming per-tile KV sort (phase A of the kv global
    sort; method 'bitonic' or 'bitonic_alt' — see _sort_megakernel)."""
    two = jnp.int32(2)

    def in_dma(buf_hbm, buf_vmem, sem, slot, t):
        return pltpu.make_async_copy(
            buf_hbm.at[pl.ds(t * rows_per_tile, rows_per_tile), :],
            buf_vmem.at[slot], sem.at[slot])

    def out_dma(buf_vmem, buf_hbm, sem, slot, t):
        return pltpu.make_async_copy(
            buf_vmem.at[slot],
            buf_hbm.at[pl.ds(t * rows_per_tile, rows_per_tile), :],
            sem.at[slot])

    in_dma(k_hbm, kbuf, sem_ki, jnp.int32(0), jnp.int32(0)).start()
    in_dma(v_hbm, vbuf, sem_vi, jnp.int32(0), jnp.int32(0)).start()

    def body(t, carry):
        slot = jax.lax.rem(t, two)

        @pl.when(t + 1 < n_tiles)
        def _():
            nxt = jax.lax.rem(t + 1, two)
            in_dma(k_hbm, kbuf, sem_ki, nxt, t + 1).start()
            in_dma(v_hbm, vbuf, sem_vi, nxt, t + 1).start()

        in_dma(k_hbm, kbuf, sem_ki, slot, t).wait()
        in_dma(v_hbm, vbuf, sem_vi, slot, t).wait()
        k = kbuf[slot]
        v = vbuf[slot]
        if method == "bitonic_alt":
            k, v = linops.bitonic_sort_kv(
                k, v, final_asc=(jax.lax.rem(t, two) == 0))
        else:
            k, v = linops.bitonic_sort_kv(k, v)

        @pl.when(t >= 2)
        def _():
            out_dma(okbuf, ok_hbm, sem_ko, slot, t - 2).wait()
            out_dma(ovbuf, ov_hbm, sem_vo, slot, t - 2).wait()

        okbuf[slot] = k
        ovbuf[slot] = v
        out_dma(okbuf, ok_hbm, sem_ko, slot, t).start()
        out_dma(ovbuf, ov_hbm, sem_vo, slot, t).start()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
    last = jnp.int32(n_tiles - 1)
    out_dma(okbuf, ok_hbm, sem_ko, jax.lax.rem(last, two), last).wait()
    out_dma(ovbuf, ov_hbm, sem_vo, jax.lax.rem(last, two), last).wait()
    if n_tiles >= 2:
        p = jax.lax.rem(last - 1, two)
        out_dma(okbuf, ok_hbm, sem_ko, p, last - 1).wait()
        out_dma(ovbuf, ov_hbm, sem_vo, p, last - 1).wait()


@functools.partial(jax.jit, static_argnames=("tile", "method", "interpret"))
def _sort_kv_tiles_jit(keys2d, vals2d, *, tile: int, method: str = "bitonic",
                       interpret: bool = False):
    rows_per_tile = tile // LANES
    n_tiles = keys2d.shape[0] // rows_per_tile
    kernel = functools.partial(_sort_kv_megakernel, n_tiles=n_tiles,
                               rows_per_tile=rows_per_tile, method=method)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
                   jax.ShapeDtypeStruct(vals2d.shape, jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the kv network keeps ~2x the keys network's live temporaries;
            # the default 16 MB SCOPED vmem budget (a compiler default, not
            # the chip) rejects it — raise toward the hardware's capacity
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(keys2d, vals2d)


def _gsort_kv_pass_kernel(k_hbm, v_hbm, ok_hbm, ov_hbm, kbuf, vbuf, okbuf,
                          ovbuf, sem_ki, sem_vi, sem_ko, sem_vo, *,
                          n_tiles: int, rows_per_tile: int, bits: tuple,
                          level: int, include_local: bool,
                          final_level: bool):
    """One KV pass of cross-tile stages (see _gsort_pass_kernel; flips
    apply to keys only, values ride the compare masks)."""
    g = len(bits)
    members = 1 << g
    stack_rows = members * rows_per_tile
    n_groups = n_tiles // members
    two = jnp.int32(2)

    def tile_of(gi, m):
        tid = gi
        for pos in sorted(bits):
            low = jax.lax.rem(tid, jnp.int32(1 << pos))
            high = tid - low
            tid = high * 2 + low
        for k_, pos in enumerate(sorted(bits, reverse=True)):
            tid = tid + jnp.int32(((m >> (g - 1 - k_)) & 1)) * (1 << pos)
        return tid

    def in_dma(src, dst, sem, slot, gi, m):
        return pltpu.make_async_copy(
            src.at[pl.ds(tile_of(gi, m) * rows_per_tile, rows_per_tile), :],
            dst.at[slot, pl.ds(m * rows_per_tile, rows_per_tile), :],
            sem.at[slot, jnp.int32(m)])

    def out_dma(src, dst, sem, slot, gi, m):
        return pltpu.make_async_copy(
            src.at[slot, pl.ds(m * rows_per_tile, rows_per_tile), :],
            dst.at[pl.ds(tile_of(gi, m) * rows_per_tile, rows_per_tile), :],
            sem.at[slot, jnp.int32(m)])

    for m in range(members):
        in_dma(k_hbm, kbuf, sem_ki, jnp.int32(0), jnp.int32(0), m).start()
        in_dma(v_hbm, vbuf, sem_vi, jnp.int32(0), jnp.int32(0), m).start()

    def body(gi, carry):
        slot = jax.lax.rem(gi, two)

        @pl.when(gi + 1 < n_groups)
        def _():
            nxt = jax.lax.rem(gi + 1, two)
            for m in range(members):
                in_dma(k_hbm, kbuf, sem_ki, nxt, gi + 1, m).start()
                in_dma(v_hbm, vbuf, sem_vi, nxt, gi + 1, m).start()

        for m in range(members):
            in_dma(k_hbm, kbuf, sem_ki, slot, gi, m).wait()
            in_dma(v_hbm, vbuf, sem_vi, slot, gi, m).wait()
        k = kbuf[slot]
        v = vbuf[slot]
        if final_level:
            flip = None
        else:
            d = (jax.lax.rem(jax.lax.div(tile_of(gi, 0),
                                         jnp.int32(1 << level)), two) == 0)
            flip = jnp.broadcast_to(~d, (stack_rows, LANES))
            k = jnp.where(flip, ~k, k)
        for k_, pos in enumerate(sorted(bits, reverse=True)):
            s = (1 << (g - 1 - k_)) * rows_per_tile * LANES
            k, v = linops._ce_kv(k, v, s)
        if include_local:
            s = rows_per_tile * LANES // 2
            while s >= 1:
                k, v = linops._ce_kv(k, v, s)
                s //= 2
        if flip is not None:
            k = jnp.where(flip, ~k, k)

        @pl.when(gi >= 2)
        def _():
            for m in range(members):
                out_dma(okbuf, ok_hbm, sem_ko, slot, gi - 2, m).wait()
                out_dma(ovbuf, ov_hbm, sem_vo, slot, gi - 2, m).wait()

        okbuf[slot] = k
        ovbuf[slot] = v
        for m in range(members):
            out_dma(okbuf, ok_hbm, sem_ko, slot, gi, m).start()
            out_dma(ovbuf, ov_hbm, sem_vo, slot, gi, m).start()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_groups), body, jnp.int32(0))
    last = jnp.int32(n_groups - 1)
    for m in range(members):
        out_dma(okbuf, ok_hbm, sem_ko, jax.lax.rem(last, two), last,
                m).wait()
        out_dma(ovbuf, ov_hbm, sem_vo, jax.lax.rem(last, two), last,
                m).wait()
    if n_groups >= 2:
        p = jax.lax.rem(last - 1, two)
        for m in range(members):
            out_dma(okbuf, ok_hbm, sem_ko, p, last - 1, m).wait()
            out_dma(ovbuf, ov_hbm, sem_vo, p, last - 1, m).wait()


@functools.partial(jax.jit, static_argnames=("tile", "bits", "level",
                                             "include_local", "final_level",
                                             "interpret"))
def _gsort_kv_pass_jit(keys2d, vals2d, *, tile: int, bits: tuple,
                       level: int, include_local: bool, final_level: bool,
                       interpret: bool = False):
    rows_per_tile = tile // LANES
    n_tiles = keys2d.shape[0] // rows_per_tile
    members = 1 << len(bits)
    kernel = functools.partial(
        _gsort_kv_pass_kernel, n_tiles=n_tiles, rows_per_tile=rows_per_tile,
        bits=bits, level=level, include_local=include_local,
        final_level=final_level)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
                   jax.ShapeDtypeStruct(vals2d.shape, jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((2, members * rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, members * rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, members * rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, members * rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2, members)),
            pltpu.SemaphoreType.DMA((2, members)),
            pltpu.SemaphoreType.DMA((2, members)),
            pltpu.SemaphoreType.DMA((2, members)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the kv network keeps ~2x the keys network's live temporaries;
            # the default 16 MB SCOPED vmem budget (a compiler default, not
            # the chip) rejects it — raise toward the hardware's capacity
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(keys2d, vals2d)


def global_sort_kv_tiles(keys2d, vals2d, *, tile: int = 65536,
                         interpret: bool = False):
    """Globally sort (keys2d, vals2d) by key ascending, values riding the
    exchanges — the kv counterpart of global_sort_tiles.  NOT stable
    between equal keys (bitonic networks are not); callers needing tie
    order must disambiguate in the key.  Tile count must be a power of
    two (pad keys with MAXI32, values arbitrarily)."""
    rows_per_tile = tile // LANES
    n_tiles = keys2d.shape[0] // rows_per_tile
    assert n_tiles & (n_tiles - 1) == 0, n_tiles
    levels = n_tiles.bit_length() - 1
    pa_bits = min(GSORT_KV_PHASE_A_BITS, levels)
    cur = call_with_big_stack(
        _sort_kv_tiles_jit, keys2d, vals2d, tile=tile << pa_bits,
        method="bitonic" if levels == pa_bits else "bitonic_alt",
        interpret=interpret)
    for j in range(pa_bits + 1, levels + 1):
        stage_bits = list(range(j - 1, -1, -1))
        chunks = [stage_bits[i:i + GSORT_KV_BITS]
                  for i in range(0, len(stage_bits), GSORT_KV_BITS)]
        for ci, chunk in enumerate(chunks):
            cur = call_with_big_stack(
                _gsort_kv_pass_jit, cur[0], cur[1], tile=tile,
                bits=tuple(chunk), level=j,
                include_local=(ci == len(chunks) - 1),
                final_level=(j == levels), interpret=interpret)
    return cur


# ---------------------------------------------------------------------------
# Kernel B-narrow: single-merge banded count for narrow bands
# ---------------------------------------------------------------------------
#
# The general kernel below (B) pays one full 2T-wide bitonic merge PER CHUNK,
# and a tile's S band virtually always straddles a chunk boundary (band width
# ≈ tile + row-alignment slack + locality window ⇒ n_chunks == 2): every tile
# costs TWO full merges.  For the narrow-band plans (locality-sorted build,
# unique keys, presorted build) the overhang past the first chunk is tiny —
# ≤ OV_ROWS rows — so this kernel does ONE full merge against the first
# T-element S window plus one 2·OV_ROWS-row mini-merge against the overhang:
# ~half the VPU work of the general kernel.
#
# Exactness is preserved by the optimistic/abort protocol: the mini-merge is
# exact iff (a) the band fits in the loaded window (rows_needed <= rpt + OV)
# and (b) every R key that can match the overhang lives in the tile's last
# OV rows (max(R[: -OV]) < first overhang key).  Tiles failing either check
# contribute nothing and raise a per-tile flag; the host recounts just those
# tiles (the conflict-spill path, same as band overflow in the general plan).

OV_ROWS = 8   # overhang window: covers row-alignment slack (≤127 elements)
              # plus locality windows up to ~896


def _count_narrow_megakernel(row_off_smem, rows_needed_smem, r_hbm, s_hbm,
                             out_ref, flags_ref, rbuf, sbuf, acc,
                             sem_r, sem_s, *, n_tiles: int,
                             rows_per_tile: int, unique_both: bool = False):
    """Double-buffered narrow-band count: one (rpt+OV)-row S DMA per tile,
    one full merge + one mini-merge, per-tile repair flags."""
    merged_rows = 2 * rows_per_tile
    rpt = rows_per_tile
    two = jnp.int32(2)
    acc[:] = jnp.zeros((merged_rows, LANES), jnp.int32)
    ones_m = jnp.ones((merged_rows, LANES), jnp.int32)
    zeros_m = jnp.zeros((merged_rows, LANES), jnp.int32)
    neg_m = -ones_m
    ones_s = jnp.ones((2 * OV_ROWS, LANES), jnp.int32)
    zeros_s = jnp.zeros((2 * OV_ROWS, LANES), jnp.int32)
    neg_s = -ones_s
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def r_dma(slot, t):
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(t * rpt, rpt), :], rbuf.at[slot], sem_r.at[slot])

    def s_dma(slot, t):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(row_off_smem[t], rpt + OV_ROWS), :],
            sbuf.at[slot], sem_s.at[slot])

    contributions = make_contributions(unique_both)

    r_dma(jnp.int32(0), jnp.int32(0)).start()
    s_dma(jnp.int32(0), jnp.int32(0)).start()

    def body(t, carry):
        tslot = jax.lax.rem(t, two)
        nslot = jax.lax.rem(t + 1, two)

        @pl.when(t + 1 < n_tiles)
        def _():
            r_dma(nslot, t + 1).start()
            s_dma(nslot, t + 1).start()

        r_dma(tslot, t).wait()
        s_dma(tslot, t).wait()
        rk = rbuf[tslot]
        s_all = sbuf[tslot]
        comp_r = jnp.where(rk >= PACK_LIMIT, jnp.int32(MAXI32), rk * 4)
        rev_r = linops.lreverse(comp_r)

        sk0 = s_all[:rpt]
        comp_s0 = jnp.where(sk0 >= PACK_LIMIT, jnp.int32(MAXI32),
                            sk0 * 4 + 1)
        merged = linops.bitonic_merge_keys(
            jnp.concatenate([comp_s0, rev_r], axis=0))
        contrib0 = contributions(merged, ones_m, zeros_m, neg_m)

        # overhang mini-merge: S rows [rpt, rpt+OV) vs the tile's last OV rows
        skm = s_all[rpt:]
        ovh_min = jnp.min(skm[0:1, :])          # first overhang key (sorted)
        mx_pre = jnp.max(rk[rpt - OV_ROWS - 1:rpt - OV_ROWS, :])
        rk_top = rk[rpt - OV_ROWS:, :]
        # no value mask: rk_top stays ascending (a mask to MAXI32 would
        # break bitonicity), and R keys < ovh_min simply match nothing in
        # the overhang
        comp_rm = jnp.where(rk_top >= PACK_LIMIT, jnp.int32(MAXI32),
                            rk_top * 4)
        comp_sm = jnp.where(skm >= PACK_LIMIT, jnp.int32(MAXI32),
                            skm * 4 + 1)
        mergedm = linops.bitonic_merge_keys(
            jnp.concatenate([comp_sm, linops.lreverse(comp_rm)], axis=0))
        contribm = contributions(mergedm, ones_s, zeros_s, neg_s)

        # exactness certificate; failing tiles contribute 0 and get flagged.
        # A band that fits the first window needs no overhang check at all:
        # overhang S keys are then all > the tile max (they sit past the
        # searchsorted end), so the mini-merge contributes 0 — this also
        # clears the spurious flag on padded tiles, where mx_pre reads the
        # MAXI32 sentinel.
        ok = (rows_needed_smem[t] <= rpt) | (
            (mx_pre < ovh_min) & (rows_needed_smem[t] <= rpt + OV_ROWS))
        acc[:] = acc[:] + jnp.where(ok, contrib0, zeros_m)
        acc[0:2 * OV_ROWS, :] = (acc[0:2 * OV_ROWS, :]
                                 + jnp.where(ok, contribm, zeros_s))
        flag = jnp.where(ok, jnp.int32(0), jnp.int32(1))
        flags_ref[pl.ds(t, 1), :] = jnp.where(srow == 0, flag, jnp.int32(0))
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
    y = acc[:]
    s = 8
    while s < merged_rows:
        y = y + pltpu.roll(y, jnp.int32(s), axis=0)
        s *= 2
    out_ref[:] = y[:8, :]


@functools.partial(jax.jit,
                   static_argnames=("tile", "unique_both", "interpret"))
def _banded_count_narrow_jit(r_sorted2d: jax.Array, s2d: jax.Array,
                             row_off: jax.Array, rows_needed: jax.Array, *,
                             tile: int = 65536, unique_both: bool = False,
                             interpret: bool = False):
    rows_per_tile = tile // LANES
    assert rows_per_tile > OV_ROWS
    n_tiles = r_sorted2d.shape[0] // rows_per_tile
    kernel = functools.partial(_count_narrow_megakernel, n_tiles=n_tiles,
                               rows_per_tile=rows_per_tile,
                               unique_both=unique_both)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, LANES), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile + OV_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2 * rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row_off, rows_needed, r_sorted2d, s2d)


def banded_count_narrow(*args, **kwargs):
    """Narrow-band match counts of tile-sorted R against sorted S.

    args: r_sorted2d (F*rows_per_tile, 128); s2d globally sorted, end-padded
    with >= OV_ROWS rows of MAXI32; row_off (F,) int32 S-slice start rows;
    rows_needed (F,) int32 band row counts.

    Returns (counts (8,128) int32, flags (F,128) int32) — flags[:,0] == 1
    marks tiles the caller must recount exactly (band overflow or overhang
    participants outside the tile's last OV_ROWS rows)."""
    return call_with_big_stack(_banded_count_narrow_jit, *args, **kwargs)


# ---------------------------------------------------------------------------
# Kernel D: FUSED sort + narrow banded count
# ---------------------------------------------------------------------------
#
# The two-kernel pipeline (sort_tiles → XLA stats/offsets → count) serializes
# on a global barrier: the count kernel cannot start until the whole sorted
# relation is written back and re-read.  But the count's only cross-tile
# dependency is each tile's S-band offset, and a tile's [min, max] is
# SORT-INVARIANT — so the offsets are computed in XLA from the UNSORTED
# input, scalar-prefetched, and one kernel then sorts each tile in VMEM and
# immediately merges it against its S band: the sorted relation never makes
# an extra HBM round trip, and the per-tile loop is bound by
# max(DMA, sort+count) instead of the two kernels' sum of overheads.
#
# Body = _sort_megakernel's sort/stats + _count_narrow_megakernel's
# merge/overhang/flags, unchanged semantics: stats lane 2 carries the
# optimistic sorter's violations (abort → caller retries exact), flags mark
# tiles needing the host recount (band overflow / overhang escape).


def _fused_sort_count_kernel(row_off_smem, rows_needed_smem, r_hbm, s_hbm,
                             out_hbm, stats_ref, cnt_ref, flags_ref,
                             rbuf, obuf, sbuf, acc, sem_in, sem_out, sem_s, *,
                             n_tiles: int, rows_per_tile: int, method: str,
                             passes: int, unique_both: bool):
    merged_rows = 2 * rows_per_tile
    rpt = rows_per_tile
    two = jnp.int32(2)
    acc[:] = jnp.zeros((merged_rows, LANES), jnp.int32)
    ones_m = jnp.ones((merged_rows, LANES), jnp.int32)
    zeros_m = jnp.zeros((merged_rows, LANES), jnp.int32)
    neg_m = -ones_m
    ones_s = jnp.ones((2 * OV_ROWS, LANES), jnp.int32)
    zeros_s = jnp.zeros((2 * OV_ROWS, LANES), jnp.int32)
    neg_s = -ones_s
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    tile_stats_row = make_tile_stats_row(method, rpt)
    contributions = make_contributions(unique_both)

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(t * rpt, rpt), :], rbuf.at[slot], sem_in.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[pl.ds(t * rpt, rpt), :],
            sem_out.at[slot])

    def s_dma(slot, t):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(row_off_smem[t], rpt + OV_ROWS), :],
            sbuf.at[slot], sem_s.at[slot])

    in_dma(jnp.int32(0), jnp.int32(0)).start()
    s_dma(jnp.int32(0), jnp.int32(0)).start()

    def body(t, carry):
        slot = jax.lax.rem(t, two)

        @pl.when(t + 1 < n_tiles)
        def _():
            in_dma(jax.lax.rem(t + 1, two), t + 1).start()
            s_dma(jax.lax.rem(t + 1, two), t + 1).start()

        in_dma(slot, t).wait()
        v = rbuf[slot]
        if method == "bitonic":
            v = linops.bitonic_sort_keys(v)
        elif method == "blocks":
            v = linops.shifted_block_sort_keys(v, passes)
        else:
            v = linops.odd_even_passes_keys(v, passes)
        stats_ref[pl.ds(t, 1), :] = tile_stats_row(v)

        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        obuf[slot] = v
        out_dma(slot, t).start()

        s_dma(slot, t).wait()
        s_all = sbuf[slot]
        comp_r = jnp.where(v >= PACK_LIMIT, jnp.int32(MAXI32), v * 4)
        rev_r = linops.lreverse(comp_r)
        sk0 = s_all[:rpt]
        comp_s0 = jnp.where(sk0 >= PACK_LIMIT, jnp.int32(MAXI32),
                            sk0 * 4 + 1)
        merged = linops.bitonic_merge_keys(
            jnp.concatenate([comp_s0, rev_r], axis=0))
        contrib0 = contributions(merged, ones_m, zeros_m, neg_m)

        skm = s_all[rpt:]
        ovh_min = jnp.min(skm[0:1, :])
        mx_pre = jnp.max(v[rpt - OV_ROWS - 1:rpt - OV_ROWS, :])
        rk_top = v[rpt - OV_ROWS:, :]
        comp_rm = jnp.where(rk_top >= PACK_LIMIT, jnp.int32(MAXI32),
                            rk_top * 4)
        comp_sm = jnp.where(skm >= PACK_LIMIT, jnp.int32(MAXI32),
                            skm * 4 + 1)
        mergedm = linops.bitonic_merge_keys(
            jnp.concatenate([comp_sm, linops.lreverse(comp_rm)], axis=0))
        contribm = contributions(mergedm, ones_s, zeros_s, neg_s)

        # same relaxed certificate as the narrow count kernel: a band inside
        # the first window is complete without the overhang check
        ok = (rows_needed_smem[t] <= rpt) | (
            (mx_pre < ovh_min) & (rows_needed_smem[t] <= rpt + OV_ROWS))
        acc[:] = acc[:] + jnp.where(ok, contrib0, zeros_m)
        acc[0:2 * OV_ROWS, :] = (acc[0:2 * OV_ROWS, :]
                                 + jnp.where(ok, contribm, zeros_s))
        flag = jnp.where(ok, jnp.int32(0), jnp.int32(1))
        flags_ref[pl.ds(t, 1), :] = jnp.where(srow == 0, flag, jnp.int32(0))
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
    last = jnp.int32(n_tiles - 1)
    out_dma(jax.lax.rem(last, two), last).wait()
    if n_tiles >= 2:
        out_dma(jax.lax.rem(last - 1, two), last - 1).wait()
    y = acc[:]
    s = 8
    while s < merged_rows:
        y = y + pltpu.roll(y, jnp.int32(s), axis=0)
        s *= 2
    cnt_ref[:] = y[:8, :]


@functools.partial(jax.jit,
                   static_argnames=("tile", "method", "passes", "unique_both",
                                    "interpret"))
def _fused_sort_count_jit(r2d: jax.Array, s2d: jax.Array, row_off: jax.Array,
                          rows_needed: jax.Array, *, tile: int = 65536,
                          method: str = "bitonic", passes: int = 1,
                          unique_both: bool = False,
                          interpret: bool = False):
    rows_per_tile = tile // LANES
    assert rows_per_tile > OV_ROWS
    n_tiles = r2d.shape[0] // rows_per_tile
    kernel = functools.partial(_fused_sort_count_kernel, n_tiles=n_tiles,
                               rows_per_tile=rows_per_tile, method=method,
                               passes=max(1, passes), unique_both=unique_both)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(r2d.shape, jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, LANES), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, rows_per_tile + OV_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2 * rows_per_tile, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row_off, rows_needed, r2d, s2d)


def fused_sort_count(*args, **kwargs):
    """Fused tile-sort + narrow banded count.

    args: r2d (F*rows_per_tile, 128) UNSORTED MAXI32-padded; s2d globally
    sorted, end-padded with >= OV_ROWS rows of MAXI32; row_off (F,) int32
    S-band start rows (from the sort-invariant per-tile min); rows_needed
    (F,) int32 band row counts.

    Returns (sorted2d, stats (F,128) [min,max,violations], counts (8,128),
    flags (F,128)) — flags[:,0] == 1 marks tiles to recount exactly."""
    return call_with_big_stack(_fused_sort_count_jit, *args, **kwargs)


# ---------------------------------------------------------------------------
# Kernel B: banded merge-count
# ---------------------------------------------------------------------------

def _count_megakernel(row_off_smem, n_chunks_smem, r_hbm, s_hbm, out_ref,
                      rbuf, sbuf0, sbufn, acc, sem_r, sem_s0, sem_sn, *,
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
    merged_rows = 2 * rows_per_tile
    # per-position contribution accumulator, folded to (8,128) ONCE at the
    # end — saves the log(merged_rows) roll-add tree per chunk.  int32 is
    # NOT unconditionally safe (the chunk loop is data-driven and callers
    # may pass unbounded n_chunks): a position's total is bounded by
    # (chunk visits) x (merged rows x lanes) coarsely, and tightly by
    # (#tiles) x (max S duplicate multiplicity).  Every caller certifies
    # one of these before trusting the count (pallas_backend._acc_unsafe;
    # joins/htm.py dial bundle) and reroutes to the skew-oblivious
    # tagged_count otherwise — the abort-safety invariant of CLAUDE.md.
    acc[:] = jnp.zeros((merged_rows, LANES), jnp.int32)
    two = jnp.int32(2)
    # hoisted vector constants: Mosaic recurses on scalar where-branches and
    # bool→int astype inside kernel loops — keep every select vector/vector
    ones_m = jnp.ones((merged_rows, LANES), jnp.int32)
    zeros_m = jnp.zeros((merged_rows, LANES), jnp.int32)
    neg_m = -ones_m
    contributions = make_contributions(unique_both)

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
        # reverse the R side ONCE per tile (concat(S, rev R) is just as
        # bitonic as concat(R, rev S) — and S changes per chunk, R doesn't)
        rev_r = linops.lreverse(comp_r)

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
            merged = linops.bitonic_merge_keys(
                jnp.concatenate([comp_s, rev_r], axis=0))
            acc[:] = acc[:] + contributions(merged, ones_m, zeros_m, neg_m)
            return carry2

        jax.lax.fori_loop(jnp.int32(0), n_chunks_smem[t], chunk_body,
                          jnp.int32(0))
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
    # fold (2*rows, 128) accumulated contributions into the (8, 128) output
    # with a mod-8 roll tree — no traced scalars anywhere
    y = acc[:]
    s = 8
    while s < merged_rows:
        y = y + pltpu.roll(y, jnp.int32(s), axis=0)
        s *= 2
    out_ref[:] = y[:8, :]


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
            pltpu.VMEM((2 * rows_per_tile, LANES), jnp.int32),
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
