"""Linear-order vector ops over (rows, 128) VMEM tiles.

TPU has no per-element scatter/gather inside kernels (Mosaic: "Cannot do int
indexing"), and XLA's 1-D scatter/gather run at ~150 M elem/s on this chip —
far below HBM bandwidth.  Everything here is therefore built from *dense*
primitives only: `pltpu.roll`, `broadcasted_iota`, `where`, min/max — which
the VPU executes at full rate.

An array of L = rows*128 elements is interpreted in row-major linear order
(index i = row*128 + lane).  On top of a cyclic linear roll we build:

  * compare-exchange networks → bitonic sort / bitonic merge,
  * Hillis-Steele inclusive scans (cumsum / cummax),
  * linear reversal,

which together give sort-based join kernels with zero irregular memory
traffic — the TPU-native replacement for the reference's per-tuple hash
chasing (SURVEY.md §3 hot loops).

These functions are pure jnp/pltpu code: they run inside Pallas kernels and
(via interpret mode) in tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def linear_iota(shape) -> jax.Array:
    """i = row*128 + lane for each element of a (rows, 128) tile."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return rows * LANES + lanes


def _roll_back(x: jax.Array, s: int, axis: int) -> jax.Array:
    """y[..i..] = x[..(i+s) mod size..] along axis (jnp.roll by -s);
    pltpu.roll only accepts non-negative shifts, so roll by size - s."""
    size = x.shape[axis]
    s %= size
    if s == 0:
        return x
    # jnp.int32 shift: a python int would trace as i64 under x64 mode, which
    # tpu.dynamic_rotate rejects.
    return pltpu.roll(x, jnp.int32(size - s), axis=axis)


def lroll(x: jax.Array, s: int) -> jax.Array:
    """Cyclic linear roll: y[i] = x[(i + s) mod L].  s may be any integer;
    decomposed into a row roll plus a lane roll with row carry."""
    rows, lanes = x.shape
    assert lanes == LANES
    L = rows * LANES
    s %= L
    if s == 0:
        return x
    q, r = divmod(s, LANES)
    if q:
        x = _roll_back(x, q, axis=0)
    if r:
        a = _roll_back(x, r, axis=1)           # a[row, l] = x[row, (l+r)%128]
        b = _roll_back(a, 1, axis=0)           # b[row, l] = x[row+1, (l+r)%128]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(lane < LANES - r, a, b)
    return x


def lshift(x: jax.Array, s: int, fill) -> jax.Array:
    """Non-cyclic linear shift toward lower indices: y[i] = x[i+s] for
    i+s < L else fill.  Negative s shifts toward higher indices
    (y[i] = x[i+s] for i+s >= 0 else fill)."""
    rows, lanes = x.shape
    L = rows * lanes
    # Coerce the fill scalar to the payload dtype: under x64 a python-int
    # fill would enter jnp.where as a weak i64 literal whose i64->i32
    # convert_element_type sends Mosaic's _convert_helper into unbounded
    # recursion (no 64-bit lowering on the TC core).
    fill = jnp.asarray(fill, x.dtype)
    y = lroll(x, s)
    i = linear_iota(x.shape)
    if s >= 0:
        return jnp.where(i < L - s, y, fill)
    return jnp.where(i >= -s, y, fill)


def _butterfly_reverse_axis(x: jax.Array, axis: int) -> jax.Array:
    """Reverse an axis (index i → size-1-i == i XOR (size-1)) as a butterfly:
    one partner-exchange per index bit, built purely from rotates (Mosaic has
    no `rev` lowering; sizes are powers of two)."""
    size = x.shape[axis]
    s = 1
    while s < size:
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
        bit = (idx & s) != 0
        up = _roll_back(x, s, axis)                    # x[i+s]
        down = pltpu.roll(x, jnp.int32(s), axis=axis)  # x[i-s]
        x = jnp.where(bit, down, up)                   # y[i] = x[i ^ s]
        s *= 2
    return x


def lreverse(x: jax.Array) -> jax.Array:
    """y[i] = x[L-1-i] over linear order: flip rows and lanes."""
    return _butterfly_reverse_axis(_butterfly_reverse_axis(x, 0), 1)


def _index_bit(shape, s: int) -> jax.Array:
    """Boolean mask: bit of the linear index selected by power-of-two s."""
    if s >= LANES:
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        return (idx & (s // LANES)) != 0
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (idx & s) != 0


# ---------------------------------------------------------------------------
# Compare-exchange networks.
#
# Every bitonic stage pairs element i with partner i XOR s for a power-of-two
# stride s.  Because the tile axes are powers of two, that partner never
# crosses an axis boundary from the side that reads it: strides < 128 stay
# within a row (lane ^ s < 128 when lane's bit s is clear), strides that are
# multiples of 128 stay within a lane column.  Each stage is therefore TWO
# single-axis rotates plus min/max/select — ~5 vector ops — instead of the
# generic linear-roll pair (~10-17 ops) a cyclic lroll chain costs.  Keys are
# single int32 arrays: the hot path packs (key, tag) into one composite
# key*4 + tag (valid for keys < 2^29 — the planner certifies density).
# ---------------------------------------------------------------------------

def _stage_axis(shape, s: int):
    """Axis decomposition of a power-of-two stride: (axis, size, shift)."""
    if s >= LANES:
        return 0, shape[0], s // LANES
    return 1, LANES, s


def _partner_plus(x: jax.Array, s: int) -> jax.Array:
    """y[i] = x[i + s], valid at positions whose index bit s is CLEAR
    (there i + s == i XOR s stays on the same axis line).  Bit-set positions
    receive wrapped values — callers never read them there."""
    axis, size, t = _stage_axis(x.shape, s)
    return pltpu.roll(x, jnp.int32(size - t), axis=axis)


def _partner_minus(x: jax.Array, s: int) -> jax.Array:
    """y[i] = x[i - s], valid at positions whose index bit s is SET."""
    axis, size, t = _stage_axis(x.shape, s)
    return pltpu.roll(x, jnp.int32(t), axis=axis)


def _ce_keys(key, s: int, asc_mask=None):
    """One compare-exchange stage with partner i XOR s.

    min/max form: the pair minimum computed at the bit-clear position and the
    pair maximum rotated to the bit-set position replace the explicit
    compare-and-keep algebra.  asc_mask=None means the whole tile sorts
    ascending (the merge case) — one rotate cheaper."""
    bit = _index_bit(key.shape, s)
    a = _partner_plus(key, s)
    mn = jnp.minimum(key, a)        # pair min, valid at bit-clear positions
    mx = jnp.maximum(key, a)        # pair max, valid at bit-clear positions
    mxb = _partner_minus(mx, s)     # pair max, valid at bit-set positions
    if asc_mask is None:
        return jnp.where(bit, mxb, mn)
    mnb = _partner_minus(mn, s)     # pair min, valid at bit-set positions
    return jnp.where(asc_mask,
                     jnp.where(bit, mxb, mn),
                     jnp.where(bit, mnb, mx))


def bitonic_merge_keys(key):
    """Sort a bitonic int32 sequence ascending: stages L/2 .. 1."""
    L = key.shape[0] * key.shape[1]
    s = L // 2
    while s >= 1:
        key = _ce_keys(key, s)
        s //= 2
    return key


def bitonic_sort_keys(key, final_asc=None):
    """Full bitonic sort over linear order.  final_asc: None sorts
    ascending; a traced bool scalar sorts ascending iff it is True (the
    per-tile direction hook for the global cross-tile network).

    Direction handling is the FLIP formulation: descending blocks store
    bit-complemented values (~x reverses order with no overflow) so every
    compare-exchange runs the cheap ascending form (5 vector ops: roll,
    min, max, roll, select) instead of the 8-op dual-direction select.
    Between levels only the positions whose direction changed re-flip
    (one xor + one select on a static mask) — measured ~30% off the
    phase-A tile sort, which is stage-bound on the VPU (r4_profile A/B:
    0.434 ms per directional stage at 2^27)."""
    L = key.shape[0] * key.shape[1]
    flipped = None     # static bool mask of positions currently storing ~x
    kk = 2
    while kk <= L:
        if kk < L:
            want_flip = _index_bit(key.shape, kk)     # descending blocks
            if final_asc is not None:
                # network parity flip: ascending iff bit clear == final_asc
                want_flip = want_flip == jnp.broadcast_to(final_asc,
                                                          key.shape)
        else:
            want_flip = (None if final_asc is None
                         else jnp.broadcast_to(~final_asc, key.shape))
        if want_flip is None:
            if flipped is not None:
                key = jnp.where(flipped, ~key, key)
                flipped = None
        elif flipped is None:
            key = jnp.where(want_flip, ~key, key)
            flipped = want_flip
        else:
            change = flipped != want_flip
            key = jnp.where(change, ~key, key)
            flipped = want_flip
        s = kk // 2
        while s >= 1:
            key = _ce_keys(key, s)
            s //= 2
        kk *= 2
    if flipped is not None:      # final_asc traced: un-complement desc tiles
        key = jnp.where(flipped, ~key, key)
    return key


def _ce_kv(key, val, s: int):
    """One ascending compare-exchange stage (partner i XOR s) carrying a
    value array: the value moves with its key.  ~11 vector ops vs the
    5-op keys-only form (explicit take-partner mask + a second select
    pair) — the price of a real key-value sort without int64 packing
    (Mosaic is int32-only)."""
    bit = _index_bit(key.shape, s)
    ka = _partner_plus(key, s)          # pair partner, valid at bit-clear
    va = _partner_plus(val, s)
    take = ka < key                     # partner is the min (bit-clear view)
    k_lo = jnp.where(take, ka, key)
    v_lo = jnp.where(take, va, val)
    k_hi = _partner_minus(jnp.where(take, key, ka), s)   # pair max → bit-set
    v_hi = _partner_minus(jnp.where(take, val, va), s)
    return (jnp.where(bit, k_hi, k_lo), jnp.where(bit, v_hi, v_lo))


def bitonic_sort_kv(key, val, final_asc=None):
    """Full key-value bitonic sort over linear order (see
    bitonic_sort_keys for the FLIP-formulation direction handling — flips
    apply to KEYS only; values follow the compare masks untouched)."""
    L = key.shape[0] * key.shape[1]
    flipped = None
    kk = 2
    while kk <= L:
        if kk < L:
            want_flip = _index_bit(key.shape, kk)
            if final_asc is not None:
                want_flip = want_flip == jnp.broadcast_to(final_asc,
                                                          key.shape)
        else:
            want_flip = (None if final_asc is None
                         else jnp.broadcast_to(~final_asc, key.shape))
        if want_flip is None:
            if flipped is not None:
                key = jnp.where(flipped, ~key, key)
                flipped = None
        elif flipped is None:
            key = jnp.where(want_flip, ~key, key)
            flipped = want_flip
        else:
            change = flipped != want_flip
            key = jnp.where(change, ~key, key)
            flipped = want_flip
        s = kk // 2
        while s >= 1:
            key, val = _ce_kv(key, val, s)
            s //= 2
        kk *= 2
    if flipped is not None:
        key = jnp.where(flipped, ~key, key)
    return key, val


def merge_two_sorted_keys(key_a, key_b):
    """Merge two ascending single arrays (concat A + reverse(B) is bitonic)."""
    return bitonic_merge_keys(jnp.concatenate([key_a, lreverse(key_b)], axis=0))


def block_bitonic_sort_keys(key, block: int, offset: int = 0):
    """Sort every `block`-element segment of the linear order (segments start
    at linear index ≡ offset mod block) ascending.

    Elements before `offset` and in the trailing partial segment are left
    untouched (they pair with the other pass's segments).  Implemented by
    rotating the tile so segments align to block boundaries (the aligned
    network is pure XOR-partner stages — cheap single-axis rotates), freezing
    the one block that wraps, and rotating back.
    """
    rows, lanes = key.shape
    L = rows * lanes
    rot = offset % block
    if rot:
        key = lroll(key, rot)
    # In rotated space the leading stub [0, offset) and the trailing partial
    # segment land together in the final, block-aligned region — freeze it.
    frozen_start = ((L - rot) // block) * block
    live = None
    if frozen_start < L:
        live = linear_iota(key.shape) < jnp.int32(frozen_start)
    # FLIP formulation (see bitonic_sort_keys): descending blocks store ~x
    # so every stage runs the 5-op ascending compare-exchange; only the
    # positions whose direction changes re-flip between levels.  Frozen
    # positions never flip (they must keep raw values), and CE partners
    # never cross the block-aligned frozen boundary, so live results stay
    # exact.
    flipped = None
    kk = 2
    while kk <= block:
        want = _index_bit(key.shape, kk) if kk < block else None
        if want is not None and live is not None:
            want = want & live
        if want is None:
            if flipped is not None:
                key = jnp.where(flipped, ~key, key)
                flipped = None
        elif flipped is None:
            key = jnp.where(want, ~key, key)
            flipped = want
        else:
            key = jnp.where(flipped != want, ~key, key)
            flipped = want
        s = kk // 2
        while s >= 1:
            new = _ce_keys(key, s)
            # frozen blocks keep their values; partners never cross the
            # (block-aligned) frozen boundary, so live results are exact
            key = new if live is None else jnp.where(live, new, key)
            s //= 2
        kk *= 2
    if flipped is not None:
        key = jnp.where(flipped, ~key, key)
    if rot:
        key = lroll(key, L - rot)
    return key


def block_reverse(key, block: int):
    """Reverse every aligned `block`-element segment of the linear order:
    butterfly over the low log2(block) index bits."""
    s = 1
    while s < block:
        bit = _index_bit(key.shape, s)
        key = jnp.where(bit, _partner_minus(key, s), _partner_plus(key, s))
        s *= 2
    return key


def block_merge_keys(key, block: int):
    """Merge every aligned `block`-element segment whose two halves are each
    sorted ascending: reverse the upper half (making the segment bitonic),
    then the log2(block) merge stages.  The stage-count win over a full
    block sort is what makes the shifted-block sorter beat odd-even."""
    half = block // 2
    bit = _index_bit(key.shape, half)
    rev = block_reverse(key, half)          # both halves reversed
    key = jnp.where(bit, rev, key)          # upper half reversed only
    s = half
    while s >= 1:
        key = _ce_keys(key, s)
        s //= 2
    return key


def shifted_block_sort_keys(key, window: int):
    """Bounded-displacement sorter: one pass of aligned block bitonic sorts
    with block = 2^ceil(log2(2·window)), then a half-block-shifted MERGE
    pass (the shifted blocks are two sorted halves after pass 1, so only
    log2(block) + reversal stages are needed) — exact whenever every element
    sits at most `window` positions from its sorted place (the staircase
    lemma).  Fewer stages than odd-even transposition from window ≥ ~8; any
    corner-case miss is caught by the caller's sortedness check and repaired
    by the bitonic retry (the abort→retry protocol)."""
    rows, lanes = key.shape
    L = rows * lanes
    block = 1
    while block < 2 * window:
        block *= 2
    block = min(block, L)
    key = block_bitonic_sort_keys(key, block, 0)
    if block >= L:
        return key
    # shifted merge pass: rotate so the shifted grid aligns, freeze the
    # wrap block (its halves belong to the array's two ends), merge, rotate
    # back — same structure as block_bitonic_sort_keys' shifted pass
    rot = block // 2
    key = lroll(key, rot)
    live = linear_iota(key.shape) < jnp.int32(L - block)
    merged = block_merge_keys(key, block)
    key = jnp.where(live, merged, key)
    return lroll(key, L - rot)


def odd_even_passes_keys(key, passes: int):
    """Payloadless odd-even transposition: sorts displacement<=passes data.
    One fori iteration applies both parities (parity stays static so every
    mask is a compile-time int32 pattern — no loop-index arithmetic leaks
    int64 into the vector code).

    The even phase pairs (2j, 2j+1) — partner i XOR 1, a pure lane-rotate
    exchange that never crosses rows.  The odd phase pairs (2j+1, 2j+2);
    its row-crossing pairs (lane 127 ↔ lane 0 of the next row) take one
    extra row rotate, and the two globally unpaired elements (i = 0, L-1)
    are restored by a constant edge mask."""
    rows, lanes = key.shape
    L = rows * lanes
    i = linear_iota(key.shape)
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    even = (i & 1) == 0
    last_lane = lane == LANES - 1
    first_lane = lane == 0
    edge = (i == 0) | (i == jnp.int32(L - 1))

    def even_phase(k):
        a = pltpu.roll(k, jnp.int32(LANES - 1), axis=1)    # k[row, lane+1]
        mn = jnp.minimum(k, a)                             # valid at even i
        mx = jnp.maximum(k, a)
        mxb = pltpu.roll(mx, jnp.int32(1), axis=1)         # pair max at odd i
        return jnp.where(even, mn, mxb)

    def odd_phase(k):
        a = pltpu.roll(k, jnp.int32(LANES - 1), axis=1)    # k[row, lane+1]
        # lane 127's successor lives at lane 0 of the NEXT row
        a = jnp.where(last_lane, pltpu.roll(a, jnp.int32(rows - 1), axis=0),
                      a)
        mn = jnp.minimum(k, a)                             # valid at odd i
        mx = jnp.maximum(k, a)
        mxb = pltpu.roll(mx, jnp.int32(1), axis=1)         # mx[row, lane-1]
        mxb = jnp.where(first_lane,
                        pltpu.roll(mxb, jnp.int32(1), axis=0), mxb)
        res = jnp.where(even, mxb, mn)
        return jnp.where(edge, k, res)                     # i=0, L-1 unpaired

    def body(_, k):
        return odd_phase(even_phase(k))

    # int32 bounds: x64 mode would make the loop index int64, which Mosaic
    # cannot lower.
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(passes), body, key,
                             unroll=False)


# ---------------------------------------------------------------------------
# Reductions and scans.
#
# All of these decompose into SINGLE-AXIS constant rolls (lane phase + row
# phase) instead of linear-order lroll chains: Mosaic compiles a dependent
# chain of lane-carry rolls pathologically slowly, while constant single-axis
# rotates are cheap.  They also deliberately avoid jnp.sum, which upcasts
# int32 accumulation to int64 under x64 mode (unlowerable on TPU).
# ---------------------------------------------------------------------------

def row_sum(x: jax.Array) -> jax.Array:
    """Column totals: (rows, 128) -> (rows, 128) with every row equal to the
    per-lane sum over rows (rows must be a power of two)."""
    rows = x.shape[0]
    s = 1
    while s < rows:
        x = x + pltpu.roll(x, jnp.int32(s), axis=0)
        s *= 2
    return x


def sum_all(x: jax.Array) -> jax.Array:
    """Total of all elements in the input dtype."""
    x = row_sum(x)
    lanes = x.shape[1]
    s = 1
    while s < lanes:
        x = x + pltpu.roll(x, jnp.int32(s), axis=1)
        s *= 2
    # every position holds the total; min is a dtype-preserving reduction
    return jnp.min(x)


def _lane_prefix(x, op, fill):
    """Inclusive prefix along lanes within each row."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < x.shape[1]:
        shifted = pltpu.roll(x, jnp.int32(s), axis=1)  # x[r, l-s] at (r, l)
        x = op(x, jnp.where(lane >= s, shifted, fill))
        s *= 2
    return x


def _row_prefix(x, op, fill):
    """Inclusive prefix down rows (per lane)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < x.shape[0]:
        shifted = pltpu.roll(x, jnp.int32(s), axis=0)  # x[r-s, l] at (r, l)
        x = op(x, jnp.where(row >= s, shifted, fill))
        s *= 2
    return x


def cumsum_linear(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum over linear (row-major) order: lane prefix within
    rows + exclusive prefix of row totals broadcast onto each row."""
    zero = jnp.zeros((), x.dtype)
    x = _lane_prefix(x, jnp.add, zero)
    totals = jnp.broadcast_to(x[:, -1:], x.shape)  # row totals
    inc = _row_prefix(totals, jnp.add, zero)       # inclusive row-prefix
    return x + (inc - totals)                      # add exclusive prefix


def cummax_linear(x: jax.Array) -> jax.Array:
    """Inclusive prefix max over linear (row-major) order."""
    neg = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
    x = _lane_prefix(x, jnp.maximum, neg)
    totals = jnp.broadcast_to(x[:, -1:], x.shape)  # row maxes
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    prev = totals
    while s < x.shape[0]:
        shifted = pltpu.roll(prev, jnp.int32(s), axis=0)
        prev = jnp.maximum(prev, jnp.where(row >= s, shifted, neg))
        s *= 2
    # prev = inclusive row-prefix of row maxes; exclusive = shift down by one
    excl = jnp.where(row >= 1, pltpu.roll(prev, jnp.int32(1), axis=0), neg)
    return jnp.maximum(x, excl)
