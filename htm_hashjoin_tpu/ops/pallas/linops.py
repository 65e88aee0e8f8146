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


def _composite_less(k1, t1, k2, t2):
    """(key, tag) lexicographic strict less-than."""
    return (k1 < k2) | ((k1 == k2) & (t1 < t2))


def compare_exchange(key, tag, s: int, asc_mask):
    """One compare-exchange stage with partner i XOR s.

    asc_mask: bool array, True where the element's block sorts ascending.
    Returns updated (key, tag).
    """
    L = key.shape[0] * key.shape[1]
    bit = _index_bit(key.shape, s)
    pk_hi, pt_hi = lroll(key, s), lroll(tag, s)          # partner at i+s
    pk_lo, pt_lo = lroll(key, L - s), lroll(tag, L - s)  # partner at i-s
    pk = jnp.where(bit, pk_lo, pk_hi)
    pt = jnp.where(bit, pt_lo, pt_hi)
    x_lt_p = _composite_less(key, tag, pk, pt)
    p_lt_x = _composite_less(pk, pt, key, tag)
    # ascending block: lower position keeps min, upper keeps max.
    # On a composite tie both terms are False -> partner taken, but partner
    # equals x, so either choice is correct.
    # NOTE: jnp.where with boolean branch *arrays* crashes the Mosaic
    # backend compiler; use boolean algebra instead.
    keep_x_asc = (bit & p_lt_x) | (~bit & x_lt_p)
    keep_x = ~(keep_x_asc ^ asc_mask)
    new_key = jnp.where(keep_x, key, pk)
    new_tag = jnp.where(keep_x, tag, pt)
    return new_key, new_tag


def bitonic_merge(key, tag):
    """Sort a bitonic (key, tag) sequence ascending: stages L/2 .. 1."""
    L = key.shape[0] * key.shape[1]
    asc = jnp.ones(key.shape, jnp.bool_)
    s = L // 2
    while s >= 1:
        key, tag = compare_exchange(key, tag, s, asc)
        s //= 2
    return key, tag


def bitonic_sort(key, tag):
    """Full ascending bitonic sort of (key, tag) over linear order."""
    L = key.shape[0] * key.shape[1]
    kk = 2
    while kk <= L:
        # block of size kk sorts ascending iff bit kk of index is 0
        asc = ~_index_bit(key.shape, kk) if kk < L else jnp.ones(key.shape, jnp.bool_)
        s = kk // 2
        while s >= 1:
            key, tag = compare_exchange(key, tag, s, asc)
            s //= 2
        kk *= 2
    return key, tag


def merge_two_sorted(key_a, tag_a, key_b, tag_b):
    """Merge two ascending (key, tag) tiles into one ascending sequence of
    2x the length: concat(A, reverse(B)) is bitonic."""
    key = jnp.concatenate([key_a, lreverse(key_b)], axis=0)
    tag = jnp.concatenate([tag_a, lreverse(tag_b)], axis=0)
    return bitonic_merge(key, tag)


def odd_even_passes(key, tag, passes: int):
    """`passes` rounds of odd-even transposition (each round = one odd + one
    even stride-1 exchange).  Sorts any sequence whose elements sit at most
    `passes` positions from their sorted place — the bounded-displacement
    (locality!) fast path: O(w) dense work instead of O(log^2 L)."""
    L = key.shape[0] * key.shape[1]
    i = linear_iota(key.shape)
    maxk = jnp.array(jnp.iinfo(key.dtype).max, key.dtype)
    mink = jnp.array(jnp.iinfo(key.dtype).min, key.dtype)
    for p in range(2 * passes):
        parity = p % 2
        # pairs (j, j+1) with j ≡ parity (mod 2); element i is the "low" end
        # of its pair iff i ≡ parity.  Out-of-range partners get +/-INF fills
        # so the compare always keeps x at the edges.
        low = (i % 2) == parity
        nk, nt = lshift(key, 1, maxk), lshift(tag, 1, jnp.int32(0))
        pk_, pt_ = lshift(key, -1, mink), lshift(tag, -1, jnp.int32(0))
        pk = jnp.where(low, nk, pk_)
        pt = jnp.where(low, nt, pt_)
        x_lt_p = _composite_less(key, tag, pk, pt)
        p_lt_x = _composite_less(pk, pt, key, tag)
        keep_x = (low & ~p_lt_x) | (~low & ~x_lt_p)
        key = jnp.where(keep_x, key, pk)
        tag = jnp.where(keep_x, tag, pt)
    return key, tag


# ---------------------------------------------------------------------------
# Payloadless (single-array) variants: the hot path packs (key, tag) into one
# int32 composite (key*4 + tag, valid for keys < 2^29 — the planner certifies
# density), halving the per-stage op count.
# ---------------------------------------------------------------------------

def _ce_keys(key, s: int, asc_mask):
    """Single-array compare-exchange with partner i XOR s."""
    L = key.shape[0] * key.shape[1]
    bit = _index_bit(key.shape, s)
    pk = jnp.where(bit, lroll(key, L - s), lroll(key, s))
    # min at the lower position of ascending blocks (bool-branch jnp.where
    # crashes Mosaic; express the select with boolean algebra)
    keep_asc = (bit & (pk < key)) | (~bit & (key < pk))
    keep = ~(keep_asc ^ asc_mask)
    return jnp.where(keep, key, pk)


def bitonic_merge_keys(key):
    L = key.shape[0] * key.shape[1]
    asc = jnp.ones(key.shape, jnp.bool_)
    s = L // 2
    while s >= 1:
        key = _ce_keys(key, s, asc)
        s //= 2
    return key


def bitonic_sort_keys(key):
    L = key.shape[0] * key.shape[1]
    kk = 2
    while kk <= L:
        asc = (~_index_bit(key.shape, kk) if kk < L
               else jnp.ones(key.shape, jnp.bool_))
        s = kk // 2
        while s >= 1:
            key = _ce_keys(key, s, asc)
            s //= 2
        kk *= 2
    return key


def merge_two_sorted_keys(key_a, key_b):
    """Merge two ascending single arrays (concat A + reverse(B) is bitonic)."""
    return bitonic_merge_keys(jnp.concatenate([key_a, lreverse(key_b)], axis=0))


def block_bitonic_sort_keys(key, block: int, offset: int = 0):
    """Sort every aligned `block`-element segment of the linear order
    (segments start at linear index ≡ offset mod block) ascending.

    Elements before `offset` and in the trailing partial segment are left
    untouched (they pair with the other pass's segments).  All masks are
    pure index functions — compile-time constant vector patterns.
    """
    rows, lanes = key.shape
    L = rows * lanes
    i = linear_iota(key.shape)
    # all index arithmetic in explicit int32: a python int that reaches a
    # vector op as int64 (x64 mode) is unlowerable by Mosaic
    pos = (i - jnp.int32(offset)) % jnp.int32(block)
    full_end = offset + ((L - offset) // block) * block
    valid = (i >= jnp.int32(offset)) & (i < jnp.int32(full_end))
    kk = 2
    while kk <= block:
        asc = (((pos & jnp.int32(kk)) == 0) if kk < block
               else jnp.ones(key.shape, jnp.bool_))
        s = kk // 2
        while s >= 1:
            bit = (pos & jnp.int32(s)) != 0
            # partner at pos ^ s: +s when bit clear, -s when set
            pk = jnp.where(bit, lroll(key, L - s), lroll(key, s))
            keep_asc = (bit & (pk < key)) | (~bit & (key < pk))
            keep = ~(keep_asc ^ asc) | ~valid   # partials keep their value
            key = jnp.where(keep, key, pk)
            s //= 2
        kk *= 2
    return key


def shifted_block_sort_keys(key, window: int):
    """Bounded-displacement sorter: two shifted passes of block bitonic
    sorts with block = 2^ceil(log2(2·window)) — exact whenever every element
    sits at most `window` positions from its sorted place (the staircase
    lemma).  Fewer stages than odd-even transposition for window ≥ 16; any
    corner-case miss is caught by the caller's sortedness check and repaired
    by the bitonic retry (the abort→retry protocol)."""
    block = 1
    while block < 2 * window:
        block *= 2
    block = min(block, key.shape[0] * key.shape[1])
    key = block_bitonic_sort_keys(key, block, 0)
    return block_bitonic_sort_keys(key, block, block // 2)


def odd_even_passes_keys(key, passes: int):
    """Payloadless odd-even transposition: sorts displacement<=passes data.
    One fori iteration applies both parities (parity stays static so every
    mask is a compile-time int32 pattern — no loop-index arithmetic leaks
    int64 into the vector code)."""
    i = linear_iota(key.shape)
    even = (i & 1) == 0
    maxk = jnp.array(jnp.iinfo(key.dtype).max, key.dtype)
    mink = jnp.array(jnp.iinfo(key.dtype).min, key.dtype)

    def half_pass(key, low):
        pk = jnp.where(low, lshift(key, 1, maxk), lshift(key, -1, mink))
        # low end keeps the pair minimum, high end the maximum
        return jnp.where(low, jnp.minimum(key, pk), jnp.maximum(key, pk))

    def body(_, key):
        key = half_pass(key, even)    # pairs (0,1),(2,3),...
        return half_pass(key, ~even)  # pairs (1,2),(3,4),...

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
