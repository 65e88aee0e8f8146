"""Host orchestration of the Pallas banded join.

The production single-chip engine: tile-sort the build side (odd-even fast
path under locality, bitonic otherwise), compute per-tile S-slice offsets
with one vectorized searchsorted, then the banded merge-count megakernel.

Phase structure mirrors the reference protocol (build → probe with the host
boundary as the barrier), and the optimistic/abort/retry pattern of the HTM
build maps exactly:

  optimistic  = odd-even passes assuming bounded displacement
  abort       = per-tile sortedness violations (tile_stats)
  retry       = bitonic re-sort when violations appear
  conflicts   = tiles whose S-slice exceeds the chunk budget (skew) fall
                back to the XLA sorted-probe path, counted & reported
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.join_kernels import (MAXI32, OV_ROWS, banded_count,
                                       banded_count_narrow, fused_sort_count,
                                       sort_tiles, tile_stats)

LANES = 128
DEFAULT_TILE = 65536

# The general count kernel's INLINE band budget: a tile whose S band needs
# more chunks than this is flagged for the batched repair.  The kernel's
# chunk loop is dynamic (any count streams fine); the budget only sizes the
# S-side end padding and draws the inline/repair line.  16 keeps the
# moderate-skew tiles (5-16 chunk bands at zipf θ≈0.75-1.0) on the ~17
# stages/chunk inline path.  Raising it to 32 was MEASURED a wash (r5):
# at θ=1.0/1.25 the flagged tiles' bands exceed even 32 chunks (true
# heavy hitters), so the repair round still runs and the absorbed
# moderate tiles' inline cost equals the repair's marginal saving
# (370.3/383.6 vs 368.2/380.5 Mt/s — noise); the remaining skew gap is
# the repair's ~55 ms FIXED overhead, not the budget.
MAX_CHUNKS_DEFAULT = 16


def to_tiles_2d(keys: jax.Array, tile: int) -> jax.Array:
    """Pad a 1-D key array with INT32_MAX to a tile multiple and reshape to
    (rows, 128) row-major."""
    n = keys.shape[0]
    padded = ((n + tile - 1) // tile) * tile
    if padded != n:
        keys = jnp.concatenate(
            [keys, jnp.full((padded - n,), MAXI32, jnp.int32)])
    return keys.reshape(-1, LANES)


def to_tiles_2d_pow2(keys: jax.Array, tile: int) -> jax.Array:
    """Like to_tiles_2d but pads to a POWER-OF-TWO tile count (the global
    bitonic sort network needs one)."""
    n = keys.shape[0]
    n_tiles = max(1, (n + tile - 1) // tile)
    n_tiles = 1 << (n_tiles - 1).bit_length()
    padded = n_tiles * tile
    if padded != n:
        keys = jnp.concatenate(
            [keys, jnp.full((padded - n,), MAXI32, jnp.int32)])
    return keys.reshape(-1, LANES)


class BandedBuild(NamedTuple):
    """The build artifact: partitioned sorted runs + per-tile value ranges.
    This is the TPU-native 'hash table' (tile ranges play the role of the
    bucket directory)."""
    sorted2d: jax.Array   # (F*rows_per_tile, 128)
    mins: jax.Array       # (F,) per-tile min key
    maxs: jax.Array       # (F,) per-tile max key (padding excluded)
    tile: int
    n: int
    violations: int       # sortedness failures of the optimistic pass
    resorted: bool        # True if the bitonic retry ran


def _sort_method(locality_window: Optional[int], tile: int):
    """Pick the optimistic sorter by window.  Measured crossovers on v5e at
    2^27 (odd-even scales linearly in w, shifted block-sort+merge ~log(w)
    stages, bitonic log²(tile)): odd-even to w=8 (14.6 vs 15.1 ms),
    shifted-block to w=512 (w=16: 19.4 vs odd-even 23.8 ms), bitonic
    beyond."""
    w = locality_window
    if w is None or w <= 0 or w > min(512, tile // 2):
        return "bitonic", 0
    return ("oddeven", w) if w <= 8 else ("blocks", w)


def banded_build(rkeys: jax.Array, *, tile: int = DEFAULT_TILE,
                 locality_window: Optional[int] = None,
                 interpret: bool = False) -> BandedBuild:
    """Build phase.  locality_window=w picks an optimistic bounded-
    displacement sorter (exact for displacement ≤ w); None or large w picks
    bitonic directly."""
    r2d = to_tiles_2d(rkeys, tile)
    method, passes = _sort_method(locality_window, tile)
    use_oddeven = method != "bitonic"
    sorted2d, stats = sort_tiles(r2d, tile=tile, method=method,
                                 passes=max(1, passes), interpret=interpret)
    violations = 0
    resorted = False
    if use_oddeven:
        violations = int(jnp.sum(stats[:, 2], dtype=jnp.int64))
        if violations:  # abort → retry with the exact sorter
            sorted2d, stats = sort_tiles(r2d, tile=tile, method="bitonic",
                                         interpret=interpret)
            resorted = True
    return BandedBuild(sorted2d, stats[:, 0], stats[:, 1], tile,
                       int(rkeys.shape[0]), violations, resorted)


def banded_build_from_sorted(sorted_keys: jax.Array, *,
                             tile: int = DEFAULT_TILE) -> BandedBuild:
    """Build artifact from a globally sorted relation (the radix/sort path:
    XLA global sort first, then tiles are disjoint ranges so S-slices are
    always narrow — no overflow regardless of distribution)."""
    r2d = to_tiles_2d(sorted_keys, tile)
    mins, maxs, _ = tile_stats(r2d, tile // LANES)
    return BandedBuild(r2d, mins, maxs, tile, int(sorted_keys.shape[0]),
                       0, False)


@jax.jit
def _segmented_count_tagged(comp_sorted: jax.Array) -> jax.Array:
    """Multiset match count from a SORTED key*2+tag composite stream
    (tag 0 = build, 1 = probe): per probe element, the number of build
    elements in its key run — the banded kernels' contribution formula
    (join_kernels.make_contributions) in XLA over the whole stream.
    MAXI32 padding is odd-tagged and self-cancels (its run has bcnt 0,
    so a - prev_a == 0)."""
    tag = comp_sorted & 1
    bcnt = 1 - tag
    a = jax.lax.cumsum(bcnt)               # int32: n_build < 2^31
    key = comp_sorted >> 1
    run_start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 key[1:] != key[:-1]])
    prev_a = jax.lax.cummax(jnp.where(run_start, a - bcnt, -1))
    return jnp.sum(jnp.where(tag == 1, a - prev_a, 0).astype(jnp.int64))


def tagged_count(r_keys: jax.Array, skeys: jax.Array, *, tile: int,
                 interpret: bool = False) -> jax.Array:
    """Skew-oblivious multiset join count: ONE Pallas global sort of the
    int32 tagged composite + a streaming segmented count.  Keys must be
    < 2^29 (the engine's PACK_LIMIT certificate; key*2+1 < 2^30).
    MAXI32-valued R entries are treated as padding (their composite stays
    MAXI32, an odd-tagged self-cancelling run).

    This replaces the searchsorted-scan repair (ops/probe.count_in_sorted),
    whose binary-search gathers measured 5.06 s for 2^22 queries into a
    2^27 S on v5e (r4_profile F) — the whole θ≥1.25 skew cliff.  The
    composite global sort runs at the megakernel rate (~132 ms at 2^27)
    and the count pass is elementwise scans."""
    comp_r = jnp.where(r_keys == MAXI32, MAXI32, r_keys * 2)
    comp_s = skeys * 2 + 1
    comp = jnp.concatenate([comp_r.reshape(-1), comp_s.reshape(-1)])
    from ..ops.pallas.join_kernels import global_sort_tiles
    comp2d = global_sort_tiles(to_tiles_2d_pow2(comp, tile), tile=tile,
                               interpret=interpret)
    n = comp.shape[0]
    return _segmented_count_tagged(comp2d.reshape(-1)[:n])


def _overflow_tile_matches(sorted2d, skeys_sorted, bad_tiles,
                           tile: int, interpret: bool = False,
                           s2d: Optional[jax.Array] = None) -> int:
    """Exact counts for band-overflow tiles in ONE batched program.

    Measured designs at theta=1.25 (46 overflow tiles, 2^27): per-tile
    probe_sorted over pow2-bucketed band segments (3.5 s, fenced per
    tile); batched count_in_sorted against full S (the searchsorted-scan
    gathers alone cost ~3.6 s for 3M queries, r4_profile F); one tagged-
    sort count of (bad tiles ‖ S) (the concat pads to a 2^28 global sort
    — ~380 ms even for 3 bad tiles).  Production design: GLOBALLY SORT
    just the gathered bad keys (b·2^16 ≤ 2^24 — a few ms), then stream
    the existing banded-count megakernel over them with UNBOUNDED chunk
    counts: the kernel's dynamic per-tile chunk loop (its n_chunks bound
    was always data-driven) merges exactly the S bands the wide tiles
    need, duplicate-multiplicity exact.  Pad tiles are MAXI32 rows (band
    offsets land at S's end padding, zero chunks).

    Mass overflow (> 1/8 of all tiles, e.g. a mis-planned run under
    extreme skew) skips the gather entirely and counts ALL of R with the
    skew-oblivious tagged sort — the gathered buffer stays bounded
    (ADVICE r3: the unbounded batched gather was a memory/latency
    cliff)."""
    flat = sorted2d.reshape(-1)
    b = len(bad_tiles)
    if not b:
        return 0
    n_tiles = sorted2d.shape[0] * sorted2d.shape[1] // tile
    if b > max(4, n_tiles // 8):
        return int(tagged_count(flat, skeys_sorted, tile=tile,
                                interpret=interpret))
    b_cap = max(1, 1 << (b - 1).bit_length())
    idx = np.zeros((b_cap,), np.int32)
    idx[:b] = np.asarray(bad_tiles, np.int32)
    tiles2d = jax.vmap(
        lambda t: jax.lax.dynamic_slice(flat, (t * tile,), (tile,)))(
        jnp.asarray(idx))
    valid = (jnp.arange(b_cap) < b)[:, None]
    keys = jnp.where(valid, tiles2d, MAXI32).reshape(-1)
    from ..ops.pallas.join_kernels import global_sort_tiles
    bad2d = global_sort_tiles(to_tiles_2d_pow2(keys, tile), tile=tile,
                              interpret=interpret)
    rows_per_tile = tile // LANES
    mins, maxs, _ = tile_stats(bad2d, rows_per_tile)
    off, end = _slice_offsets(skeys_sorted, mins, maxs)
    row_off = off // LANES
    rows_needed = jnp.maximum((end + LANES - 1) // LANES - row_off, 0)
    n_chunks = (rows_needed + rows_per_tile - 1) // rows_per_tile
    if s2d is None:
        s2d = prepare_probe_side(skeys_sorted, tile)
    counts = banded_count(bad2d, s2d, row_off.astype(jnp.int32),
                          n_chunks.astype(jnp.int32), tile=tile,
                          interpret=interpret)
    # ONE fence for count + certificate inputs: the repair's chunk counts
    # are data-driven and UNBOUNDED, so the int32 per-position accumulator
    # needs its certificate enforced (ADVICE r4 #2: a heavy hitter with
    # ~2^24 copies on each side can push one position past 2^31).  The
    # optimistic count is enqueued first and discarded if uncertified —
    # a second readback here would cost another ~25 ms tunnel round trip
    # on every repair.
    head = np.asarray(jnp.stack([_sum_i64(counts), _sum_i64(n_chunks)]))
    if _acc_unsafe(int(head[1]), b, skeys_sorted, tile):
        return int(tagged_count(flat, skeys_sorted, tile=tile,
                                interpret=interpret))
    return int(head[0])


@jax.jit
def _slice_offsets(skeys_sorted, mins, maxs):
    # F queries against a huge sorted array: binary-search 'scan' is O(F log n);
    # method='sort' would re-sort the full S array (catastrophic here).
    off = jnp.searchsorted(skeys_sorted, mins, side="left", method="scan")
    end = jnp.searchsorted(skeys_sorted, maxs, side="right", method="scan")
    return off.astype(jnp.int32), end.astype(jnp.int32)


@jax.jit
def _sum_i64(x):
    return jnp.sum(x.astype(jnp.int64))


@jax.jit
def _max_run_length(sorted_keys: jax.Array) -> jax.Array:
    """Longest equal-key run in a sorted stream — the maximum S-side
    duplicate multiplicity.  The TIGHT per-position accumulator bound of
    the banded count kernels: a merged-buffer position's total int32
    contribution is <= (#tiles it serves) x (its key's S multiplicity), so
    n_tiles * max_run < 2^31 certifies the int32 accumulator exactly
    (join_kernels._count_megakernel acc)."""
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             sorted_keys[1:] != sorted_keys[:-1]])
    run_start = jax.lax.cummax(jnp.where(start, idx, -1))
    return jnp.max(idx - run_start).astype(jnp.int64) + 1


def _acc_unsafe(visits: int, n_tiles: int, skeys_sorted,
                tile: int) -> bool:
    """Two-tier int32-accumulator certificate (ADVICE r4 #2): coarse
    visit-count bound first (free), tight max-duplicate bound only when
    the coarse one trips (one extra device pass, rare)."""
    per_visit = 2 * tile   # merged buffer positions upper bound
    if visits * per_visit < (1 << 31):
        return False
    max_run = int(np.asarray(_max_run_length(skeys_sorted)))
    return n_tiles * max_run >= (1 << 31)


@functools.partial(jax.jit, static_argnames=("rows_per_tile",))
def _tile_minmax(r2d, rows_per_tile: int):
    """Per-tile [min, max-excluding-padding] of the UNSORTED input — sort-
    invariant, so the S-band offsets can be computed before sorting (what
    lets the fused kernel exist)."""
    f = r2d.shape[0] // rows_per_tile
    tiles = r2d.reshape(f, rows_per_tile * LANES)
    mins = jnp.min(tiles, axis=1)
    maxs = jnp.max(jnp.where(tiles == MAXI32, jnp.int32(-(1 << 31)), tiles),
                   axis=1)
    return mins, maxs


def prepare_probe_side(skeys_sorted: jax.Array, tile: int = DEFAULT_TILE,
                       max_chunks: int = MAX_CHUNKS_DEFAULT) -> jax.Array:
    """Tile and end-pad sorted S once (reusable across probes).  Padding
    covers the general kernel's max_chunks window AND the narrow/fused
    kernels' OV_ROWS overhang past it (a row_off at the very end of S must
    still have rpt+OV_ROWS readable rows)."""
    rows_per_tile = tile // LANES
    s2d = to_tiles_2d(skeys_sorted, tile)
    return jnp.concatenate(
        [s2d, jnp.full((max_chunks * rows_per_tile + OV_ROWS, LANES), MAXI32,
                       jnp.int32)])


def banded_probe(build: BandedBuild, skeys_sorted: jax.Array, *,
                 max_chunks: int = MAX_CHUNKS_DEFAULT, interpret: bool = False,
                 s2d: Optional[jax.Array] = None):
    """Probe phase: count matches of sorted S against the build artifact.
    Returns (matches, overflow_tiles)."""
    tile = build.tile
    rows_per_tile = tile // LANES
    if s2d is None:
        s2d = prepare_probe_side(skeys_sorted, tile, max_chunks)
    off, end = _slice_offsets(skeys_sorted, build.mins, build.maxs)
    row_off = off // LANES
    end_row = (end + LANES - 1) // LANES
    rows_needed = jnp.maximum(end_row - row_off, 0)
    n_chunks_np = np.asarray((rows_needed + rows_per_tile - 1)
                             // rows_per_tile)
    overflow = n_chunks_np > max_chunks
    visits = int(n_chunks_np[~overflow].sum())
    if _acc_unsafe(visits, int(n_chunks_np.shape[0]), skeys_sorted, tile):
        m = int(tagged_count(build.sorted2d.reshape(-1), skeys_sorted,
                             tile=tile, interpret=interpret))
        return m, int(overflow.sum())
    n_chunks_clipped = jnp.asarray(np.where(overflow, 0, n_chunks_np)
                                   .astype(np.int32))
    counts = banded_count(build.sorted2d, s2d, row_off.astype(jnp.int32),
                          n_chunks_clipped, tile=tile,
                          max_chunks=max_chunks, interpret=interpret)
    matches = int(_sum_i64(counts))

    overflow_tiles = np.nonzero(overflow)[0]
    if len(overflow_tiles):
        matches += _overflow_tile_matches(build.sorted2d, skeys_sorted,
                                          overflow_tiles, tile,
                                          interpret=interpret, s2d=s2d)
    return matches, len(overflow_tiles)


def banded_join(rkeys: jax.Array, skeys_sorted: jax.Array, *,
                tile: int = DEFAULT_TILE,
                locality_window: Optional[int] = None,
                max_chunks: int = MAX_CHUNKS_DEFAULT, interpret: bool = False):
    """Full build+probe.  Returns (matches, BandedBuild, overflow_tiles)."""
    build = banded_build(rkeys, tile=tile, locality_window=locality_window,
                         interpret=interpret)
    matches, overflow = banded_probe(build, skeys_sorted,
                                     max_chunks=max_chunks,
                                     interpret=interpret)
    return matches, build, overflow


# ---------------------------------------------------------------------------
# Fence-free pipeline
# ---------------------------------------------------------------------------
#
# banded_build/banded_probe above sync with the host three times per join
# (violation check, overflow check, match readback).  Off-host TPU access
# pays a ~25 ms round trip PER SYNC on this platform — 2x the entire device
# compute for a 2^24 join.  The production entry point therefore keeps the
# whole pipeline on device and reads back ONE scalar bundle; the rare repair
# paths (optimistic-sort violations, band overflow under extreme skew) are
# detected in that same bundle and re-run only when actually needed.

class BandedJoinOutcome(NamedTuple):
    matches: int
    violations: int      # optimistic-sort failures (the abort count analog)
    overflow_tiles: int  # tiles whose S band exceeded max_chunks (skew)
    output_sum: int      # Σ keys in the build artifact (conservation oracle)
    resorted: bool       # bitonic retry ran (TM_RETRY analog)
    input_sum: int = 0   # Σ input keys (== output_sum ⇔ no tuple lost)


def _banded_join_device(r2d: jax.Array, s2d: jax.Array,
                        skeys_sorted: jax.Array, *, tile: int, method: str,
                        passes: int, max_chunks: int, unique_both: bool,
                        narrow: bool, interpret: bool):
    """The full join as one async device chain: sort → stats → offsets →
    count, with violations/overflow/conservation folded into the outputs.
    Nothing here blocks; the caller fences once.

    narrow=True routes through the single-merge narrow-band kernel (half the
    VPU work); its per-tile exactness flags feed the same repair path as
    band overflow.  Narrow non-presorted plans take the FUSED kernel: band
    offsets come from the sort-invariant per-tile min/max of the unsorted
    input, so one kernel sorts each tile and counts it immediately — no
    global sort→offsets→count barrier, no extra HBM round trip."""
    rows_per_tile = tile // LANES
    if narrow and method != "presorted":
        mins, maxs = _tile_minmax(r2d, rows_per_tile)
        off, end = _slice_offsets(skeys_sorted, mins, maxs)
        row_off = off // LANES
        rows_needed = jnp.maximum((end + LANES - 1) // LANES - row_off, 0)
        sorted2d, stats, counts, flags = fused_sort_count(
            r2d, s2d, row_off.astype(jnp.int32),
            rows_needed.astype(jnp.int32), tile=tile, method=method,
            passes=max(1, passes), unique_both=unique_both,
            interpret=interpret)
        viols = stats[:, 2].astype(jnp.int64)
        bad = flags[:, 0] > 0
        matches = _sum_i64(counts)
        out_sum = _sum_i64(jnp.where(sorted2d == MAXI32, 0, sorted2d))
        in_sum = _sum_i64(jnp.where(r2d == MAXI32, 0, r2d))
        # accumulator-certificate visit count (see _acc_unsafe): the
        # narrow/fused kernels do one bounded merge per tile
        visits = jnp.full((), r2d.shape[0] * LANES // tile, jnp.int64)
        return (matches, _sum_i64(viols), _sum_i64(bad), out_sum, in_sum,
                sorted2d, off, end, bad, visits)
    if method == "presorted":     # globally sorted input is tile-sorted
        sorted2d = r2d
        mins, maxs, viols = tile_stats(sorted2d, rows_per_tile)
    else:
        sorted2d, stats = sort_tiles(r2d, tile=tile, method=method,
                                     passes=max(1, passes),
                                     interpret=interpret)
        mins, maxs = stats[:, 0], stats[:, 1]
        viols = stats[:, 2].astype(jnp.int64)
    off, end = _slice_offsets(skeys_sorted, mins, maxs)
    row_off = off // LANES
    end_row = (end + LANES - 1) // LANES
    rows_needed = jnp.maximum(end_row - row_off, 0)
    if narrow:
        counts, flags = banded_count_narrow(
            sorted2d, s2d, row_off.astype(jnp.int32),
            rows_needed.astype(jnp.int32), tile=tile,
            unique_both=unique_both, interpret=interpret)
        bad = flags[:, 0] > 0
        visits = jnp.full((), r2d.shape[0] * LANES // tile, jnp.int64)
    else:
        n_chunks = (rows_needed + rows_per_tile - 1) // rows_per_tile
        bad = n_chunks > max_chunks
        n_chunks_clipped = jnp.where(bad, 0, n_chunks).astype(jnp.int32)
        counts = banded_count(sorted2d, s2d, row_off.astype(jnp.int32),
                              n_chunks_clipped, tile=tile,
                              max_chunks=max_chunks,
                              unique_both=unique_both, interpret=interpret)
        visits = _sum_i64(n_chunks_clipped)
    matches = _sum_i64(counts)
    out_sum = _sum_i64(jnp.where(sorted2d == MAXI32, 0, sorted2d))
    in_sum = _sum_i64(jnp.where(r2d == MAXI32, 0, r2d))
    return (matches, _sum_i64(viols), _sum_i64(bad), out_sum, in_sum,
            sorted2d, off, end, bad, visits)


def enqueue_banded_join(rkeys: jax.Array, skeys_sorted: jax.Array, *,
                        tile: int = DEFAULT_TILE,
                        locality_window: Optional[int] = None,
                        unique_both: bool = False, max_chunks: int = MAX_CHUNKS_DEFAULT,
                        s2d: Optional[jax.Array] = None):
    """Enqueue one full optimistic build+probe on the device WITHOUT any
    host sync; returns the device result tuple (matches, violations,
    flagged, out_sum, in_sum, ...).  For back-to-back throughput (the
    production serving shape): enqueue K joins, fence once on the last
    result, then verify every bundle.  Callers must check violations==0 and
    flagged==0 (else re-run via banded_join_pipelined, which repairs)."""
    r2d = to_tiles_2d(rkeys, tile)
    method, passes = _sort_method(locality_window, tile)
    if s2d is None:
        s2d = prepare_probe_side(skeys_sorted, tile, max_chunks)
    return _banded_join_device(r2d, s2d, skeys_sorted, tile=tile,
                               method=method, passes=passes,
                               max_chunks=max_chunks,
                               unique_both=unique_both, narrow=True,
                               interpret=False)


@functools.partial(jax.jit, static_argnames=("rows_per_tile",))
def _tile_dup_counts(sorted2d: jax.Array, rows_per_tile: int) -> jax.Array:
    """Per-tile duplicate-alias counts: adjacent equal keys in the sorted
    tile (padding excluded).  The TM_TRACK _XABORT_CONFLICT analog
    (HTMHashBuild.hpp:136-137): two equal keys alias the same table slot,
    which is exactly what made reference transactions conflict."""
    f = sorted2d.shape[0] // rows_per_tile
    tiles = sorted2d.reshape(f, rows_per_tile * LANES)
    eq = (tiles[:, 1:] == tiles[:, :-1]) & (tiles[:, 1:] != MAXI32)
    return jnp.sum(eq, axis=1, dtype=jnp.int64)


def _enqueue_build(rkeys: jax.Array, *, tile: int,
                   locality_window: Optional[int], presort: bool,
                   presorted: bool, interpret: bool, track: bool = False):
    """Enqueue the build-only device chain WITHOUT any host sync.

    Returns (head, viols, dups, r2d, optimistic): head stacks
    [Σviolations, outputSum, inputSum]; viols is the per-tile violation
    vector and dups the per-tile duplicate-alias vector (the TM_TRACK
    cause-histogram sources; dups only computed when ``track``)."""
    rows_per_tile = tile // LANES
    if presorted:
        r2d = to_tiles_2d(rkeys, tile)
        out_sum = _sum_i64(jnp.where(r2d == MAXI32, 0, r2d))
        # certified-sorted input: zero aborts per tile by construction
        viols = jnp.zeros((r2d.shape[0] // rows_per_tile,), jnp.int64)
        dups = _tile_dup_counts(r2d, rows_per_tile) if track else viols
        return jnp.stack([jnp.zeros((), jnp.int64), out_sum,
                          out_sum]), viols, dups, r2d, False
    if presort:
        from ..ops.pallas.join_kernels import global_sort_tiles
        r2d = to_tiles_2d_pow2(rkeys, tile)
        sorted2d = global_sort_tiles(r2d, tile=tile, interpret=interpret)
        viols = jnp.zeros((r2d.shape[0] // rows_per_tile,), jnp.int64)
        optimistic = False
    else:
        r2d = to_tiles_2d(rkeys, tile)
        method, passes = _sort_method(locality_window, tile)
        optimistic = method != "bitonic"
        sorted2d, stats = sort_tiles(r2d, tile=tile, method=method,
                                     passes=max(1, passes),
                                     interpret=interpret)
        # stats lane 2 is identically 0 for the exact bitonic sorter, so the
        # per-tile vector is correct for BOTH plans (the TM_TRACK histogram
        # rides the same readback either way)
        viols = stats[:, 2].astype(jnp.int64)
    dups = (_tile_dup_counts(sorted2d, rows_per_tile) if track else
            jnp.zeros_like(viols))
    out_sum = _sum_i64(jnp.where(sorted2d == MAXI32, 0, sorted2d))
    in_sum = _sum_i64(jnp.where(r2d == MAXI32, 0, r2d))
    return jnp.stack([_sum_i64(viols), out_sum, in_sum]), viols, dups, r2d, \
        optimistic


def enqueue_banded_build(rkeys: jax.Array, *, tile: int = DEFAULT_TILE,
                         locality_window: Optional[int] = None,
                         presort: bool = False, presorted: bool = False,
                         interpret: bool = False) -> jax.Array:
    """Enqueue one build-only pipeline without a fence; returns the device
    head [Σviolations, outputSum, inputSum].  For sustained-throughput
    timing: enqueue K, np.asarray the last head once."""
    head, _, _, _, _ = _enqueue_build(rkeys, tile=tile,
                                      locality_window=locality_window,
                                      presort=presort, presorted=presorted,
                                      interpret=interpret)
    return head


def banded_build_pipelined(rkeys: jax.Array, *, tile: int = DEFAULT_TILE,
                           locality_window: Optional[int] = None,
                           presort: bool = False, presorted: bool = False,
                           return_tile_violations: bool = False,
                           interpret: bool = False):
    """Build-only banded pipeline (the reference's default ENABLE_PROBE=off
    grids, config.h:4): produce the probe-able sorted-tile artifact with ONE
    host readback.  Locality plans take the optimistic bounded-displacement
    sorter (violations = the abort count, bitonic retry = TM_RETRY);
    unbounded distributions take a tile-local bitonic — per-tile sorted runs
    + the per-tile directory are a probe-able artifact (the wide-band plan's
    build half), so no global sort is needed when no probe follows.
    ``presorted`` = generator-certified sorted input: the input IS the
    artifact, so the build reduces to the stats/conservation pass (the
    planner analog of timsort's O(n) on sorted runs, which the reference's
    own SortMerge leans on, SortMerge.cpp:18).  matches is 0 (no probe
    side).

    With ``return_tile_violations`` (TM_TRACK) the return is
    (outcome, per_tile_violations, per_tile_duplicate_aliases) — both cause
    vectors ride the single readback (HTMHashBuild.hpp:134-142's abort-cause
    bits, decomposed the TPU way: displacement violations of the optimistic
    sorter vs duplicate-key slot aliases)."""
    head, viols, dups, r2d, optimistic = _enqueue_build(
        rkeys, tile=tile, locality_window=locality_window, presort=presort,
        presorted=presorted, interpret=interpret,
        track=return_tile_violations)
    n_tiles = viols.shape[0]
    if return_tile_violations:
        # per-tile cause counts (the TM_TRACK abort-histogram analog) ride
        # the SAME readback — a second np.asarray would cost another ~27 ms
        # tunnel round trip per grid point
        head = jnp.concatenate([head, viols.reshape(-1), dups.reshape(-1)])
    bundle = np.asarray(head)
    resorted = False
    if optimistic and bundle[0] > 0:    # abort → exact retry
        sorted2d, _ = sort_tiles(r2d, tile=tile, method="bitonic",
                                 interpret=interpret)
        out_sum = _sum_i64(jnp.where(sorted2d == MAXI32, 0, sorted2d))
        bundle[1] = np.asarray(out_sum)
        if return_tile_violations:
            # dup counts over a violated tile are unreliable — recompute on
            # the exact retry artifact (aborts are the rare path; the extra
            # readback is paid only when a retry actually ran)
            bundle[3 + n_tiles:3 + 2 * n_tiles] = np.asarray(
                _tile_dup_counts(sorted2d, tile // LANES))
        resorted = True
    out = BandedJoinOutcome(0, int(bundle[0]), 0, int(bundle[1]),
                            resorted, int(bundle[2]))
    if return_tile_violations:
        return out, bundle[3:3 + n_tiles], bundle[3 + n_tiles:]
    return out


def sort_probe_side(skeys: jax.Array, tile: int = DEFAULT_TILE,
                    max_chunks: int = MAX_CHUNKS_DEFAULT, interpret: bool = False):
    """Globally sort an UNSORTED probe side on device (the zipf/fk/nonunique
    S relations arrive unsorted, mc/src/main.c:393-412) and produce the
    (skeys_sorted, s2d) pair the banded engine consumes.  Sorting S is the
    probe-side half of the sort-merge plan — one 197 ms megakernel pass at
    2^27 instead of forfeiting the banded engine entirely."""
    from ..ops.pallas.join_kernels import global_sort_tiles
    rows_per_tile = tile // LANES
    s_sorted2d = global_sort_tiles(to_tiles_2d_pow2(skeys, tile), tile=tile,
                                   interpret=interpret)
    skeys_sorted = s_sorted2d.reshape(-1)[: skeys.shape[0]]
    s2d = jnp.concatenate(
        [s_sorted2d, jnp.full((max_chunks * rows_per_tile + OV_ROWS, LANES),
                              MAXI32, jnp.int32)])
    return skeys_sorted, s2d


def _prepare_join(rkeys, skeys_sorted, *, tile, locality_window, presort,
                  presorted, sort_s, unique_both, max_chunks, narrow,
                  interpret, s2d):
    """Shared prologue of the full-join pipelines (plan → device inputs);
    enqueues the R/S sorts, fences nothing."""
    if sort_s:
        skeys_sorted, s2d = sort_probe_side(skeys_sorted, tile, max_chunks,
                                            interpret=interpret)
    if presorted:
        r2d = to_tiles_2d(rkeys, tile)
        method, passes = "presorted", 0
    elif presort:
        # global sort via the grouped bitonic megakernels — ~2x XLA's
        # jnp.sort at 2^27 on v5e (and the same code path CPU tests cover
        # in interpret mode)
        from ..ops.pallas.join_kernels import global_sort_tiles
        r2d = global_sort_tiles(to_tiles_2d_pow2(rkeys, tile), tile=tile,
                                interpret=interpret)
        method, passes = "presorted", 0
    else:
        r2d = to_tiles_2d(rkeys, tile)
        method, passes = _sort_method(locality_window, tile)
    if narrow is None:
        # narrow bands are certain for unique keys and expected for
        # locality-sorted builds; presorted DUPLICATE-heavy plans can have
        # arbitrarily wide bands (a key run straddling a tile boundary), so
        # they keep the general multi-chunk kernel unless keys are unique
        narrow = unique_both or method in ("oddeven", "blocks")
    if s2d is None:
        s2d = prepare_probe_side(skeys_sorted, tile, max_chunks)
    return r2d, s2d, skeys_sorted, method, passes, narrow


def enqueue_full_join(rkeys: jax.Array, skeys_sorted: jax.Array, *,
                      tile: int = DEFAULT_TILE,
                      locality_window: Optional[int] = None,
                      presort: bool = False, presorted: bool = False,
                      sort_s: bool = False, unique_both: bool = False,
                      max_chunks: int = MAX_CHUNKS_DEFAULT, narrow: Optional[bool] = None,
                      interpret: bool = False,
                      s2d: Optional[jax.Array] = None):
    """Enqueue one full build+probe on ANY plan tier (unlike
    enqueue_banded_join, which is narrow-only) without a fence; returns the
    raw device result tuple — fence via np.asarray(jnp.stack(res[:5]))."""
    (r2d, s2d, skeys_sorted, method, passes,
     narrow) = _prepare_join(rkeys, skeys_sorted, tile=tile,
                             locality_window=locality_window,
                             presort=presort, presorted=presorted,
                             sort_s=sort_s, unique_both=unique_both,
                             max_chunks=max_chunks, narrow=narrow,
                             interpret=interpret, s2d=s2d)
    return _banded_join_device(r2d, s2d, skeys_sorted, tile=tile,
                               method=method, passes=passes,
                               max_chunks=max_chunks, unique_both=unique_both,
                               narrow=narrow, interpret=interpret)


def banded_join_pipelined(rkeys: jax.Array, skeys_sorted: jax.Array, *,
                          tile: int = DEFAULT_TILE,
                          locality_window: Optional[int] = None,
                          presort: bool = False, presorted: bool = False,
                          sort_s: bool = False, unique_both: bool = False,
                          max_chunks: int = MAX_CHUNKS_DEFAULT, narrow: Optional[bool] = None,
                          interpret: bool = False,
                          s2d: Optional[jax.Array] = None
                          ) -> BandedJoinOutcome:
    """Full build+probe with exactly one host sync on the fast path.

    The optimistic plan (odd-even sort under a locality window) streams
    through; violations or band overflow surface in the single readback and
    trigger the exact repair pass — the HTM abort→retry protocol
    (HTMHashBuild.hpp:188-238) with the host round trip paid only on actual
    aborts.  ``presort=True`` globally sorts R first (XLA sort) — the
    radix-path plan for data without locality: tiles become disjoint ranges,
    so bands stay narrow regardless of distribution.

    ``narrow`` selects the single-merge narrow-band count kernel (default:
    on for unique keys, locality plans, and presorted builds — everywhere
    bands are expected to stay within one tile + a small overhang; tiles
    that break the expectation are repaired host-side, exactly).
    ``presorted`` = generator-certified sorted R: skip the sort megakernel,
    take the tile_stats directory straight off the input (violations there
    surface in the readback as failedTransactions).
    ``sort_s`` = the probe side arrives UNSORTED (zipf/fk/nonunique S):
    globally sort it on device first."""
    (r2d, s2d, skeys_sorted, method, passes,
     narrow) = _prepare_join(rkeys, skeys_sorted, tile=tile,
                             locality_window=locality_window,
                             presort=presort, presorted=presorted,
                             sort_s=sort_s, unique_both=unique_both,
                             max_chunks=max_chunks, narrow=narrow,
                             interpret=interpret, s2d=s2d)
    res = _banded_join_device(r2d, s2d, skeys_sorted, tile=tile,
                              method=method, passes=passes,
                              max_chunks=max_chunks, unique_both=unique_both,
                              narrow=narrow, interpret=interpret)
    (matches, viols, overflow, out_sum, in_sum, sorted2d, off, end, bad,
     visits) = res

    def _fence(res_):
        # the per-tile bad flags ride the SAME readback as the scalars: a
        # separate np.asarray(bad) on the repair path costs another
        # ~25 ms tunnel round trip per repaired join
        head = jnp.stack([res_[0], res_[1], res_[2], res_[3], res_[4],
                          res_[9]])
        return np.asarray(jnp.concatenate(
            [head, res_[8].astype(jnp.int64)]))

    bundle = _fence(res)
    resorted = False
    viols_i = int(bundle[1])   # abort count survives the retry (the
                               # failedTransactions analog must report the
                               # aborts that happened, not the retry's zero)
    if method in ("oddeven", "blocks") and viols_i > 0:  # abort → retry
        res = _banded_join_device(r2d, s2d, skeys_sorted, tile=tile,
                                  method="bitonic", passes=0,
                                  max_chunks=max_chunks,
                                  unique_both=unique_both, narrow=narrow,
                                  interpret=interpret)
        (matches, viols, overflow, out_sum, in_sum, sorted2d, off, end,
         bad, visits) = res
        bundle = _fence(res)
        resorted = True
    matches_i = int(bundle[0])
    overflow_i = int(bundle[2])
    n_tiles = r2d.shape[0] // (tile // LANES)
    if _acc_unsafe(int(bundle[5]), n_tiles, skeys_sorted, tile):
        # inline int32 accumulator not certified for this data (extreme
        # duplicate mass): recount everything with the skew-oblivious
        # tagged sort — exactness over the optimistic fast path
        # (CLAUDE.md invariant: fast-path assumptions certified or
        # checked with a repair path)
        matches_i = int(tagged_count(rkeys, skeys_sorted, tile=tile,
                                     interpret=interpret))
        return BandedJoinOutcome(matches_i, viols_i, overflow_i,
                                 int(bundle[3]), True, int(bundle[4]))
    if overflow_i > max(4, n_tiles // 8):
        # mass overflow means the plan was wrong for this data: bands wider
        # than the kernel certifies everywhere — a mis-sized locality window
        # (→ replan with a global sort), or heavy-hitter skew where one key
        # run spans many tiles (→ the fused-tagged-sort count, which is
        # skew-oblivious).  One replan beats thousands of per-tile host
        # round trips — the abort→replan analog of HTM_SWITCH, not a repair.
        if not presort and not presorted:
            out = banded_join_pipelined(rkeys, skeys_sorted, tile=tile,
                                        presort=True,
                                        unique_both=unique_both,
                                        max_chunks=max_chunks, narrow=narrow,
                                        interpret=interpret, s2d=s2d)
            return out._replace(violations=viols_i,
                                overflow_tiles=overflow_i, resorted=True)
        # skew-oblivious full count: one tagged megakernel sort (the
        # searchsorted/tagged-int64 fallbacks both measured seconds here)
        matches_i = int(tagged_count(rkeys, skeys_sorted, tile=tile,
                                     interpret=interpret))
        return BandedJoinOutcome(matches_i, viols_i, overflow_i,
                                 int(bundle[3]), True, int(bundle[4]))
    if overflow_i:                      # skew spill → batched tagged count
        bad_tiles = np.nonzero(bundle[6:])[0]     # flags rode the bundle
        matches_i += _overflow_tile_matches(sorted2d, skeys_sorted,
                                            bad_tiles, tile,
                                            interpret=interpret, s2d=s2d)
    return BandedJoinOutcome(matches_i, viols_i, overflow_i,
                             int(bundle[3]), resorted, int(bundle[4]))
