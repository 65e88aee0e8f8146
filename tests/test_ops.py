"""Unit tests for the conflict-free primitives in ops/."""

import jax.numpy as jnp
import numpy as np
import pytest

from htm_hashjoin_tpu.ops import insert, partition, probe, sortops
from htm_hashjoin_tpu.ops.hashing import identity_hash, murmur32, radix_digit


def test_nocc_scatter_unique():
    keys = jnp.arange(1, 257, dtype=jnp.int32)
    table = insert.nocc_scatter(keys, 512, identity_hash)
    assert int(jnp.sum(table.astype(jnp.int64))) == 256 * 257 // 2


def test_open_addressing_no_losses_with_duplicates():
    """Claim rounds must place every duplicate in its own slot."""
    keys = jnp.array([5, 5, 5, 5, 9, 9], dtype=jnp.int32)
    table, pending = insert.open_addressing_build(keys, 64, 8, identity_hash)
    assert not bool(pending.any())
    vals = np.asarray(table)
    assert (vals != 0).sum() == 6
    assert sorted(vals[vals != 0]) == [5, 5, 5, 5, 9, 9]


def test_open_addressing_budget_exhaustion():
    """More duplicates than probe budget → spill (AtomicHashBuild.hpp:62)."""
    keys = jnp.full((8,), 3, dtype=jnp.int32)
    table, pending = insert.open_addressing_build(keys, 64, 4, identity_hash)
    assert int(pending.sum()) == 4
    spill, count = insert.spill_sorted(keys, pending)
    assert int(count) == 4
    assert (np.asarray(spill)[:4] == 3).all()


def test_bucket_build_fills_slots_in_order():
    keys = jnp.array([8, 8, 8], dtype=jnp.int32)  # bucket 8 & mask
    table, pending = insert.bucket_build(keys, 16, 3, identity_hash)
    assert not bool(pending.any())
    row = np.asarray(table).reshape(16, 3)[8]
    assert (row == 8).all()


def test_htm_optimistic_dense_keys_no_failures():
    """Dense 1..N: the optimistic scatter is injective — zero aborts."""
    n = 1 << 10
    keys = jnp.arange(1, n + 1, dtype=jnp.int32)
    res = insert.htm_optimistic_build(keys, 512, unique_keys=True)
    assert int(res.failed_optimistic.sum()) == 0
    assert int(jnp.sum(res.table.astype(jnp.int64))) == n * (n + 1) // 2


def test_htm_optimistic_duplicates_retry():
    keys = jnp.array([7, 7, 7, 7, 7], dtype=jnp.int32)
    res = insert.htm_optimistic_build(keys, 8, retry=True)
    # 3 slots in bucket 2 hold a 7; two spill
    assert int(res.failed_optimistic.sum()) == 4  # 4 lost the first scatter
    assert int(res.pending.sum()) == 2
    assert int(jnp.sum(res.table.astype(jnp.int64))) == 21


def test_chunk_failure_fractions():
    failed = jnp.array([True] * 10 + [False] * 22)
    f = insert.chunk_failure_fractions(failed, 16)
    assert f.shape == (2,)
    assert abs(float(f[0]) - 10 / 16) < 1e-6
    assert float(f[1]) == 0.0


def test_radix_partition_groups_and_sorts():
    keys = jnp.array([513, 2, 258, 1, 257, 514], dtype=jnp.int32)
    res = partition.radix_partition(keys, bits=8, shift=0, sort_within=True)
    # digits (low 8 bits): 1,2,2,1,1,2 → partition 1: {513,1,257} partition 2: {2,258,514}
    np.testing.assert_array_equal(np.asarray(res.hist)[[1, 2]], [3, 3])
    np.testing.assert_array_equal(np.asarray(res.keys), [1, 257, 513, 2, 258, 514])


def test_radix_partition_histogram_offsets():
    keys = jnp.arange(1, 1025, dtype=jnp.int32)
    res = partition.radix_partition(keys, bits=4)
    assert int(res.hist.sum()) == 1024
    np.testing.assert_array_equal(
        np.asarray(res.offsets), np.concatenate([[0], np.cumsum(np.asarray(res.hist))[:-1]]))


def test_radix_partition_msb_contiguous():
    """MSB digits: sorted-by-key order is partition-contiguous, hist counts
    the top-bit buckets, shift adapts to the data maximum."""
    keys = jnp.array([513, 2, 258, 1, 257, 514, 1023], dtype=jnp.int32)
    res, shift = partition.radix_partition_msb(keys, bits=2)
    assert int(shift) == 8  # bit_length(1023)=10, minus 2
    np.testing.assert_array_equal(np.asarray(res.keys),
                                  np.sort(np.asarray(keys)))
    # digits of sorted keys must be non-decreasing (contiguous partitions)
    d = np.asarray(res.digits)
    assert (np.diff(d) >= 0).all()
    np.testing.assert_array_equal(np.asarray(res.hist),
                                  np.bincount(d, minlength=4))
    assert int(res.hist.sum()) == keys.shape[0]


def test_bit_length_exact():
    for v, want in [(0, 0), (1, 1), (2, 2), (3, 2), (4, 3), (255, 8),
                    (256, 9), (1 << 24, 25), ((1 << 24) + 1, 25),
                    ((1 << 31) - 1, 31)]:
        assert int(partition.bit_length(jnp.int32(v))) == want, v


def test_probe_sorted_multiset():
    r = jnp.array([1, 2, 2, 3, 7], dtype=jnp.int32)
    s = jnp.array([2, 2, 7, 9], dtype=jnp.int32)
    assert int(probe.probe_sorted(r, s)) == 2 * 2 + 1


def test_merge_count_matches_numpy():
    rng = np.random.default_rng(0)
    r = np.sort(rng.integers(1, 100, 500).astype(np.int32))
    s = np.sort(rng.integers(1, 100, 300).astype(np.int32))
    expect = sum(int((r == x).sum()) for x in s)
    assert int(sortops.merge_count(jnp.asarray(r), jnp.asarray(s))) == expect


def test_murmur32_is_a_function_and_spreads():
    keys = jnp.arange(1, 1025, dtype=jnp.int32)
    h1, h2 = murmur32(keys), murmur32(keys)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    digits = np.asarray(radix_digit(keys, 0, 4, hashed=True))
    counts = np.bincount(digits, minlength=16)
    assert counts.min() > 0  # spread over all 16 buckets


def test_heavy_hitters():
    hist = jnp.array([10, 500, 20, 900], dtype=jnp.int32)
    hh = partition.heavy_hitters(hist, 100)
    np.testing.assert_array_equal(np.asarray(hh), [False, True, False, True])


def test_count_in_sorted_matches_probe_sorted():
    """count_in_sorted (binary-search scan over a pre-sorted S) must agree
    with probe_sorted (full tagged sort) on duplicate-heavy data, exclude
    R-side MAXI32 pads, and tolerate MAXI32 S padding."""
    import numpy as np
    import jax.numpy as jnp
    from htm_hashjoin_tpu.ops import probe as probe_ops

    MAXI32 = np.iinfo(np.int32).max
    rng = np.random.default_rng(7)
    s = np.sort(rng.integers(1, 50, size=4096).astype(np.int32))
    r = rng.integers(1, 80, size=512).astype(np.int32)
    r[100:120] = MAXI32                       # R tile padding
    s_pad = np.concatenate([s, np.full(1024, MAXI32, np.int32)])

    want = int(probe_ops.probe_sorted(jnp.asarray(r[np.where(r != MAXI32)]),
                                      jnp.asarray(s)))
    got = int(probe_ops.count_in_sorted(jnp.asarray(r), jnp.asarray(s_pad)))
    assert got == want
