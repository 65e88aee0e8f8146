"""Multi-pass, fanout-bounded radix partitioning — the PRO pass machinery.

The reference's defining mechanism is the 2-pass parallel radix partition
(/root/reference/mc/src/parallel_radix_join.c:559-627 per-pass histogram →
prefix-sum → scatter with inter-partition padding; :869-956 the NUM_PASSES
pass structure; mc/src/prj_params.h:15-22 the cache fanout contract:
per-pass fanout bounded so the scatter's write targets fit cache/TLB).

TPU re-expression.  A per-element scatter cannot run at rate on TPU (no
per-element stores in Mosaic; XLA scatter ~150 M elem/s), so the pass is
restructured around *sorted runs*:

  pass p =
    1. tile sort (the existing bitonic megakernel — runs at VPU rate);
       within a sorted tile the pass-digit runs are contiguous,
    2. XLA planning on (T, F) tables: per-tile digit boundaries by vmapped
       searchsorted, destination row offsets by prefix sums — the histogram
       + cross-thread prefix-sum of the reference collapsed to one cumsum,
    3. scatter megakernel: re-read each sorted tile, expand runs to
       CH-row-quantized staging positions in VMEM (a log-shift network —
       runs move forward by per-run δ, decomposed over δ's bits), then DMA
       each run to its destination rows in chunks of CH rows.

Fanout contract (the prj_params.h analog): per-pass fanout F ≤ 128 — one
SMEM table row and one VMEM staging span per tile must hold F entries — and
every intermediate pass's output regions are padded to tile multiples so
the next pass sees single-region tiles (contiguous digit runs).  Fanout
beyond 128 therefore REQUIRES another pass, exactly like the reference's
cache bound forces NUM_PASSES=2 at NUM_RADIX_BITS=14.

Destination layout: region (= partition) f gets exact row-granular space
(per-(tile,f) runs padded to full 128-lane rows with MAXI32) plus CH slack
rows.  Chunked DMAs may overhang a run's rows by < CH rows; the overhang
content is MAXI32 staging fill and is overwritten by the next tile's run
(the kernel orders tile t's scatter completions before tile t+1's issue),
so the last writer is always either real data or MAXI32 padding.

The output is value-ordered across partitions (MSB digits), so after the
final pass a plain tile sort yields the banded engine's build artifact
(per-tile sorted runs + min/max directory) with interspersed MAXI32 pads
that every downstream kernel already ignores.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import linops
from .join_kernels import LANES, MAXI32, call_with_big_stack

CH = 16          # scatter chunk rows (CH*128 = 2048-element DMA granule)
MAX_FANOUT = 128  # per-pass fanout bound (one SMEM/VMEM table row)


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# XLA planning: per-tile digit boundaries + destination tables
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("fanout", "shift", "rows_per_tile"))
def tile_digit_bounds(sorted2d: jax.Array, *, fanout: int, shift: int,
                      rows_per_tile: int) -> jax.Array:
    """(T, F+1) int32: bounds[t, f] = first element index in tile t whose
    pass digit is >= f.  Valid because each sorted tile holds one region
    (value-monotone ⇒ digit-monotone within the pass's bit window) and
    MAXI32 padding has digit F-1 (all ones in any sub-top-bit window)."""
    t = sorted2d.shape[0] // rows_per_tile
    tiles = sorted2d.reshape(t, rows_per_tile * LANES)
    digits = ((tiles >> shift) & (fanout - 1)).astype(jnp.int32)
    queries = jnp.arange(fanout + 1, dtype=jnp.int32)
    return jax.vmap(
        lambda d: jnp.searchsorted(d, queries, side="left", method="scan")
    )(digits).astype(jnp.int32)


class ScatterPlan(NamedTuple):
    a_elem: jax.Array      # (T, F) run start element index within tile
    delta: jax.Array       # (T, F) staging shift per run (elements)
    dest_row: jax.Array    # (T, F) destination start row in the output
    n_chunks: jax.Array    # (T, F) number of CH-row chunks to DMA
    hist: jax.Array        # (T, F) run sizes in elements (MAXI32 pads of
                           #        the tile count toward digit F-1)
    region_rows: jax.Array  # (R,) rows per output region (incl. slack/align)
    out_rows: int          # static output row bound


@functools.partial(jax.jit,
                   static_argnames=("fanout", "rows_per_tile", "align_tiles",
                                    "n_parents"))
def _scatter_plan_jit(bounds: jax.Array, parent_of_tile: jax.Array, *,
                      fanout: int, rows_per_tile: int, align_tiles: bool,
                      n_parents: int):
    """Destination bookkeeping from the per-tile digit bounds.

    Regions are (parent, digit) pairs; tiles of one parent are contiguous
    (the tile-alignment invariant), so per-region tile prefixes are global
    prefixes minus each parent's first-tile prefix."""
    f = fanout
    hist = jnp.diff(bounds, axis=1)                       # (T, F)
    a_elem = bounds[:, :f]
    rows_tf = _cdiv(hist, LANES)                          # dest rows per run

    # staging (obuf) layout: run f at the CH-quantized cumsum of ceil rows
    q_rows = _cdiv(rows_tf, CH) * CH
    q_start = jnp.cumsum(q_rows, axis=1) - q_rows         # exclusive, (T, F)
    delta = q_start * LANES - a_elem

    # regions: parent-major, digit-minor (= value order under MSB digits)
    parent_onehot = (parent_of_tile[:, None] ==
                     jnp.arange(n_parents, dtype=jnp.int32)[None, :]
                     ).astype(jnp.int32)
    region_sizes = parent_onehot.T @ rows_tf              # (P, F) rows
    region_rows = region_sizes + jnp.where(region_sizes > 0, CH, 0)
    if align_tiles:
        region_rows = _cdiv(region_rows, rows_per_tile) * rows_per_tile
    region_flat = region_rows.reshape(-1)                 # parent-major
    region_base = jnp.cumsum(region_flat) - region_flat   # exclusive

    # within-region tile prefix: global prefix of rows_tf down tiles minus
    # the prefix at each parent's first tile
    tile_prefix = jnp.cumsum(rows_tf, axis=0) - rows_tf   # (T, F) exclusive
    first_tile = jnp.argmax(parent_onehot, axis=0)        # (P,)
    start_prefix = tile_prefix[first_tile]                # (P, F)
    within = tile_prefix - start_prefix[parent_of_tile]   # (T, F)

    base_tf = region_base.reshape(n_parents, f)[parent_of_tile]  # (T, F)
    dest_row = base_tf + within
    n_chunks = _cdiv(rows_tf, CH)
    return (a_elem.astype(jnp.int32), delta.astype(jnp.int32),
            dest_row.astype(jnp.int32), n_chunks.astype(jnp.int32),
            hist.astype(jnp.int32), region_flat)


def scatter_plan(bounds: jax.Array, parent_of_tile: jax.Array, *,
                 fanout: int, rows_per_tile: int, align_tiles: bool,
                 n_parents: int) -> ScatterPlan:
    """Static worst-case output rows: every (tile, digit) run rounds up one
    row, every region takes CH slack (+ tile alignment).  The bound, not
    the data-dependent total, sizes the output buffer — trailing rows stay
    MAXI32 and flow to the top partition of later passes (harmless, pads
    are excluded everywhere downstream)."""
    t = bounds.shape[0]
    n_regions = n_parents * fanout
    out_rows = t * rows_per_tile + t * fanout + n_regions * CH
    if align_tiles:
        out_rows += n_regions * (rows_per_tile - 1)
    out_rows = _cdiv(out_rows, rows_per_tile) * rows_per_tile
    parts = _scatter_plan_jit(bounds, parent_of_tile, fanout=fanout,
                              rows_per_tile=rows_per_tile,
                              align_tiles=align_tiles, n_parents=n_parents)
    return ScatterPlan(*parts, out_rows)


# ---------------------------------------------------------------------------
# Scatter megakernel
# ---------------------------------------------------------------------------


def _scatter_megakernel(tbl_hbm, r_hbm, prefill_hbm, out_hbm, buf, obuf,
                        tbl_smem, sem_in, sem_out, sem_tbl, *,
                        n_tiles: int, rows_per_tile: int, fanout: int,
                        stage_rows: int):
    """Streaming scatter: for each sorted tile, expand digit runs to
    CH-quantized staging rows (log-shift network over δ's bits) and DMA
    each run's chunks to its destination rows.

    The (T, 4F) plan table [a | δ | dest | nch] stays in HBM (it is far
    too big for SMEM at production scale) and is streamed in GROUPS of 8
    rows (Mosaic requires HBM slice shapes 8-row aligned for int32) into
    a 3-slot SMEM group ring: tile t reads row t%8 of group t//8; group
    g+1 is prefetched when tile 8g enters, by which point group g-2's
    rows (the slot being overwritten) had their last read in tile
    8(g-1)'s wait phase.

    Ordering: tile t's out-DMAs are waited before tile t+1 issues any —
    consecutive tiles' runs in one region share an overhang row and the
    later tile must win.  In-DMAs still prefetch one tile ahead, and the
    expansion compute for tile t overlaps tile t-1's write completions."""
    del prefill_hbm  # aliased to out_hbm (prefilled MAXI32 by the caller)
    two = jnp.int32(2)
    three = jnp.int32(3)
    f_ = fanout
    max_delta_bits = max(1, (stage_rows * LANES - 1).bit_length())
    shape = (rows_per_tile, LANES)

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            r_hbm.at[pl.ds(t * rows_per_tile, rows_per_tile), :],
            buf.at[slot], sem_in.at[slot])

    eight = jnp.int32(8)

    def tbl_dma(slot, g):
        """Plan-table group g (tile rows 8g..8g+7): Mosaic requires HBM
        slice shapes 8-row aligned for int32, so rows stream by group."""
        return pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(g * eight, 8), :], tbl_smem.at[slot],
            sem_tbl.at[slot])

    def trow(t, j):
        """Plan entry j of tile t out of the group ring."""
        return tbl_smem[jax.lax.rem(t // eight, three), jax.lax.rem(t, eight),
                        j]

    def run_chunk_dma(t, f, k):
        """Chunk k of run f of tile t: staging rows [qf + k*CH, +CH) ->
        out rows [dest + k*CH, +CH).  Staging is double-buffered by tile
        parity: tile t's writes are waited at t+1, so slot t%2 is free
        for re-fill at t+2."""
        # int32-wrapped scalars: python ints are weak i64 under x64 and
        # their convert_element_type has no Mosaic lowering (recursion).
        q_row = (trow(t, f) + trow(t, f_ + f)) // jnp.int32(LANES)
        k_ch = k * jnp.int32(CH)
        return pltpu.make_async_copy(
            obuf.at[jax.lax.rem(t, two), pl.ds(q_row + k_ch, CH), :],
            out_hbm.at[pl.ds(trow(t, 2 * f_ + f) + k_ch, CH), :],
            sem_out)

    def for_each_chunk(t, op):
        def digit_body(f, c):
            def chunk_body(k, cc):
                op(t, f, k)
                return cc
            return jax.lax.fori_loop(jnp.int32(0), trow(t, 3 * f_ + f),
                                     chunk_body, c)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(fanout), digit_body,
                          jnp.int32(0))

    n_groups = _cdiv(n_tiles, 8)
    in_dma(jnp.int32(0), jnp.int32(0)).start()
    tbl_dma(jnp.int32(0), jnp.int32(0)).start()

    def body(t, carry):
        slot = jax.lax.rem(t, two)
        g = t // eight
        g3 = jax.lax.rem(g, three)

        @pl.when(t + 1 < n_tiles)
        def _():
            in_dma(jax.lax.rem(t + 1, two), t + 1).start()

        # group ring: wait group g and prefetch g+1 at the group boundary.
        # Slot (g+1)%3 holds group g-2, whose rows had their last read in
        # tile 8(g-1)'s wait phase — free to overwrite now.
        @pl.when(jax.lax.rem(t, eight) == 0)
        def _():
            tbl_dma(g3, g).wait()

            @pl.when(g + 1 < n_groups)
            def _():
                tbl_dma(jax.lax.rem(g + 1, three), g + 1).start()

        in_dma(slot, t).wait()
        v = buf[slot]

        # per-element staging shift: δ of the element's run, looked up by
        # digit via run boundaries (table a-section) — the tile is
        # digit-monotone, so "element i in run f" ⇔ a[f] <= i < a[f+1]
        idx = linops.linear_iota(shape)

        def blend(f, d):
            return jnp.where(idx >= trow(t, f), trow(t, f_ + f), d)
        dlt = jax.lax.fori_loop(jnp.int32(0), jnp.int32(fanout), blend,
                                jnp.zeros(shape, jnp.int32))

        # expansion: move every element forward by its δ through a log-shift
        # network.  δ is non-decreasing along the tile, so processing δ's
        # bits high→low is order-preserving and collision-free (receiver
        # gap proof: floor(δ/2^{b+1}) is monotone over element order, so
        # when u would land on a staying v at stage b, their gap is in fact
        # > 2^b — impossible).  Elements carry (value, remaining-δ);
        # staging fill is MAXI32 with δ=0 (it never moves, and arrivals
        # always win over it).  Tile-tail MAXI32 pads ride with run F-1.
        tail = stage_rows - rows_per_tile
        ev = jnp.concatenate(
            [v, jnp.full((tail, LANES), MAXI32, jnp.int32)])
        ed = jnp.concatenate(
            [dlt, jnp.zeros((tail, LANES), jnp.int32)])
        mx32 = jnp.int32(MAXI32)
        zero32 = jnp.int32(0)
        for b in reversed(range(max_delta_bits)):
            step = 1 << b
            step32 = jnp.int32(step)
            want = (ed & step32) != 0
            # position j receives from j-step when that element still owes
            # this bit; it keeps its own element unless that element leaves
            mv_v = linops.lshift(jnp.where(want, ev, mx32), -step, mx32)
            mv_d = linops.lshift(jnp.where(want, ed, zero32), -step,
                                 zero32)
            arrived = linops.lshift(
                jnp.where(want, jnp.int32(1), zero32), -step,
                zero32) != 0
            ev = jnp.where(arrived, mv_v, jnp.where(want, mx32, ev))
            ed = jnp.where(arrived, mv_d - step32,
                           jnp.where(want, zero32, ed))
        obuf[jax.lax.rem(t, two)] = ev

        @pl.when(t >= 1)                  # ordered: finish tile t-1's writes
        def _():
            for_each_chunk(t - 1, lambda tt, f, k:
                           run_chunk_dma(tt, f, k).wait())

        for_each_chunk(t, lambda tt, f, k: run_chunk_dma(tt, f, k).start())
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
    last = jnp.int32(n_tiles - 1)
    for_each_chunk(last, lambda tt, f, k: run_chunk_dma(tt, f, k).wait())


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "fanout",
                                             "out_rows", "interpret"))
def _scatter_tiles_jit(sorted2d, a_elem, delta, dest_row, n_chunks, *,
                       rows_per_tile: int, fanout: int, out_rows: int,
                       interpret: bool = False):
    n_tiles = sorted2d.shape[0] // rows_per_tile
    # staging span: data rows + worst-case CH quantization per run
    stage_rows = rows_per_tile + fanout * CH
    prefill = jnp.full((out_rows, LANES), MAXI32, jnp.int32)
    # combined plan table, one row per tile: [a | delta | dest | nch],
    # zero-padded to an 8-row multiple (one DMA group per 8 tiles; the
    # pad rows are never read — n_tiles bounds the loop)
    tbl = jnp.concatenate([a_elem, delta, dest_row, n_chunks], axis=1)
    pad_rows = _cdiv(n_tiles, 8) * 8 - n_tiles
    if pad_rows:
        tbl = jnp.concatenate(
            [tbl, jnp.zeros((pad_rows, tbl.shape[1]), jnp.int32)])
    # lane-dim pad: HBM slice widths must be 128-lane multiples (small
    # fanouts give 4F < 128); the pad columns are never read
    tbl_cols = _cdiv(tbl.shape[1], LANES) * LANES
    if tbl_cols != tbl.shape[1]:
        tbl = jnp.concatenate(
            [tbl, jnp.zeros((tbl.shape[0], tbl_cols - tbl.shape[1]),
                            jnp.int32)], axis=1)
    kernel = functools.partial(_scatter_megakernel, n_tiles=n_tiles,
                               rows_per_tile=rows_per_tile, fanout=fanout,
                               stage_rows=stage_rows)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, LANES), jnp.int32),
            pltpu.VMEM((2, stage_rows, LANES), jnp.int32),
            pltpu.SMEM((3, 8, _cdiv(4 * fanout, LANES) * LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tbl, sorted2d, prefill)


def scatter_tiles(sorted2d, plan: ScatterPlan, *, rows_per_tile: int,
                  fanout: int, interpret: bool = False):
    return call_with_big_stack(
        _scatter_tiles_jit, sorted2d, plan.a_elem, plan.delta, plan.dest_row,
        plan.n_chunks, rows_per_tile=rows_per_tile, fanout=fanout,
        out_rows=plan.out_rows, interpret=interpret)


# ---------------------------------------------------------------------------
# Multi-pass driver
# ---------------------------------------------------------------------------


class RadixPassPlan(NamedTuple):
    shift: int
    bits: int


def plan_passes(key_bits: int, radix_bits: int, passes: int
                ) -> List[RadixPassPlan]:
    """Split the radix-bit budget across passes, MSB first — the NUM_PASSES
    structure (parallel_radix_join.c:869-956) with the per-pass fanout
    clamped to MAX_FANOUT (the SMEM/VMEM fanout contract, prj_params.h
    analog).  More bits than fit the pass budget add passes implicitly."""
    radix_bits = max(1, min(radix_bits, key_bits))
    per = _cdiv(radix_bits, max(1, passes))
    per = min(per, MAX_FANOUT.bit_length() - 1)
    plans = []
    used = 0
    while used < radix_bits:
        b = min(per, radix_bits - used)
        shift = key_bits - used - b
        plans.append(RadixPassPlan(shift=max(0, shift), bits=b))
        used += b
    return plans


class RadixPartitionResult(NamedTuple):
    partitioned2d: jax.Array   # (rows, 128) value-partitioned, MAXI32 pads
    pass_plans: List[RadixPassPlan]
    pass_hists: List[jax.Array]  # per-pass (T, F) run-size tables
    n: int                     # real element count


@functools.partial(jax.jit, static_argnames=("n_tiles", "rows_per_tile"))
def _parents_from_regions(region_rows: jax.Array, *, n_tiles: int,
                          rows_per_tile: int) -> jax.Array:
    """Next pass's tile → parent map from this pass's region rows (regions
    are tile-aligned, so each tile falls inside exactly one region; empty
    regions share a start with their successor and searchsorted resolves
    to the spanning one)."""
    starts = jnp.cumsum(region_rows) - region_rows
    tile_starts = jnp.arange(n_tiles, dtype=region_rows.dtype) * rows_per_tile
    return (jnp.searchsorted(starts, tile_starts, side="right",
                             method="scan").astype(jnp.int32) - 1)


def _to_tiles(keys: jax.Array, tile: int) -> jax.Array:
    """MAXI32-pad to a tile multiple, reshape (rows, 128) row-major."""
    n = keys.shape[0]
    padded = _cdiv(max(n, 1), tile) * tile
    if padded != n:
        keys = jnp.concatenate(
            [keys, jnp.full((padded - n,), MAXI32, jnp.int32)])
    return keys.reshape(-1, LANES)


def multipass_radix_partition(keys: jax.Array, *, radix_bits: int = 14,
                              passes: int = 2, key_bits: int = 29,
                              tile: int = 65536,
                              interpret: bool = False
                              ) -> RadixPartitionResult:
    """The full multi-pass engine: value-partition keys into 2^radix_bits
    MSB ranges in `passes` fanout-bounded passes.  Output is partition-
    contiguous (value-ordered) with interspersed MAXI32 row padding; a
    final tile sort turns it into the banded build artifact."""
    from .join_kernels import _sort_tiles_jit

    rows_per_tile = tile // LANES
    n = int(keys.shape[0])
    plans = plan_passes(key_bits, radix_bits, passes)
    cur = _to_tiles(keys, tile)
    n_tiles = cur.shape[0] // rows_per_tile
    parent = jnp.zeros((n_tiles,), jnp.int32)
    n_parents = 1
    hists = []
    for i, p in enumerate(plans):
        fanout = 1 << p.bits
        sorted2d = call_with_big_stack(
            _sort_tiles_jit, cur, tile=tile, method="bitonic",
            interpret=interpret)[0]
        bounds = tile_digit_bounds(sorted2d, fanout=fanout, shift=p.shift,
                                   rows_per_tile=rows_per_tile)
        align = i + 1 < len(plans)       # intermediate regions tile-aligned
        plan = scatter_plan(bounds, parent, fanout=fanout,
                            rows_per_tile=rows_per_tile, align_tiles=align,
                            n_parents=n_parents)
        cur = scatter_tiles(sorted2d, plan, rows_per_tile=rows_per_tile,
                            fanout=fanout, interpret=interpret)
        hists.append(plan.hist)
        n_tiles = cur.shape[0] // rows_per_tile
        n_parents *= fanout            # region ids are parent-major
        if align:
            parent = _parents_from_regions(plan.region_rows, n_tiles=n_tiles,
                                           rows_per_tile=rows_per_tile)
    return RadixPartitionResult(cur, plans, hists, n)
