"""Pallas kernel correctness in interpret mode (CPU).

Covers linops (roll/sort/merge/scan networks) and the banded join
(tile-sort build + merge-count probe), including the optimistic/abort/retry
path and the skew-overflow fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from htm_hashjoin_tpu.ops.pallas import linops
from htm_hashjoin_tpu.joins.pallas_backend import (banded_build,
                                                   banded_build_from_sorted,
                                                   banded_join, banded_probe)
from htm_hashjoin_tpu.data.generators import (local_shuffled_keys,
                                              shuffled_keys, sorted_keys,
                                              uniform_keys, zipf_keys)
from htm_hashjoin_tpu.utils.validate import reference_match_count

SHAPE = (8, 128)
L = SHAPE[0] * SHAPE[1]


def run_kernel(fn, *arrays):
    shapes = jax.eval_shape(lambda *a: fn(*a), *arrays)
    single = not isinstance(shapes, tuple)
    if single:
        shapes = (shapes,)

    def kernel(*refs):
        ins, outs = refs[:len(arrays)], refs[len(arrays):]
        res = fn(*[r[:] for r in ins])
        if not isinstance(res, tuple):
            res = (res,)
        for o, r in zip(outs, res):
            o[:] = r

    out = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes),
        interpret=True)(*arrays)
    return out[0] if single else out


def as_tile(a):
    return jnp.asarray(np.asarray(a, np.int32).reshape(SHAPE))


def test_lroll_matches_numpy():
    x = np.arange(L, dtype=np.int32)
    for s in [1, 5, 127, 128, 300, L - 1]:
        y = run_kernel(lambda a, s=s: linops.lroll(a, s), as_tile(x))
        np.testing.assert_array_equal(np.asarray(y).ravel(), np.roll(x, -s))


def test_bitonic_sort_keys():
    rng = np.random.default_rng(0)
    k = rng.integers(0, 10_000, L).astype(np.int32)
    y = run_kernel(linops.bitonic_sort_keys, as_tile(k))
    np.testing.assert_array_equal(np.asarray(y).ravel(), np.sort(k))


def test_merge_two_sorted_keys():
    rng = np.random.default_rng(1)
    a = np.sort(rng.integers(0, 5_000, L).astype(np.int32))
    b = np.sort(rng.integers(0, 5_000, L).astype(np.int32))
    y = run_kernel(linops.merge_two_sorted_keys, as_tile(a), as_tile(b))
    np.testing.assert_array_equal(np.asarray(y).ravel(),
                                  np.sort(np.concatenate([a, b])))


def test_scans():
    rng = np.random.default_rng(2)
    v = rng.integers(0, 9, L).astype(np.int32)
    y = run_kernel(linops.cumsum_linear, as_tile(v))
    np.testing.assert_array_equal(np.asarray(y).ravel(), np.cumsum(v))
    y = run_kernel(linops.cummax_linear, as_tile(v))
    np.testing.assert_array_equal(np.asarray(y).ravel(),
                                  np.maximum.accumulate(v))


def test_odd_even_sorts_bounded_displacement():
    rng = np.random.default_rng(3)
    base = np.arange(L, dtype=np.int32)
    order = np.argsort(base + rng.integers(0, 17, L), kind="stable")
    arr = base[order]
    y = run_kernel(lambda a: linops.odd_even_passes_keys(a, 16), as_tile(arr))
    np.testing.assert_array_equal(np.asarray(y).ravel(), base)


N = 1 << 14


def test_banded_join_locality_exact():
    r = local_shuffled_keys(N, 16, 0)
    m, build, ovf = banded_join(r, sorted_keys(N), tile=2048,
                                locality_window=16, interpret=True)
    assert m == N
    assert build.violations == 0 and not build.resorted
    assert ovf == 0


def test_banded_join_shuffle_falls_back():
    """Globally shuffled tiles span the whole key range: every tile
    overflows its S-slice budget and the exact fallback covers it."""
    # max_chunks=4 keeps this a fallback exercise (the default inline
    # budget of 16 absorbs these bands at this tile size)
    m, _, ovf = banded_join(shuffled_keys(N, 0), sorted_keys(N), tile=2048,
                            max_chunks=4, interpret=True)
    assert m == N
    assert ovf > 0


def test_banded_join_from_presorted():
    """The sort-first (radix) path: pre-sorted R gives narrow tiles — exact
    with no overflow even for shuffled origin."""
    r_sorted = jnp.sort(shuffled_keys(N, 0))
    build = banded_build_from_sorted(r_sorted, tile=2048)
    m, ovf = banded_probe(build, sorted_keys(N), interpret=True)
    assert m == N and ovf == 0


def test_banded_join_duplicates():
    r = uniform_keys(N, N // 4, 16, 0)
    s = sorted_keys(N)
    m, _, _ = banded_join(r, s, tile=2048, interpret=True)
    assert m == reference_match_count(r, s)


def test_banded_join_zipf_heavy_duplicates():
    r = zipf_keys(N, N // 16, 1.1, 0)
    s = sorted_keys(N)
    build = banded_build_from_sorted(jnp.sort(r), tile=2048)
    m, ovf = banded_probe(build, s, interpret=True)
    assert m == reference_match_count(r, s)


def test_banded_join_uneven_sizes():
    n = N - 77
    r = local_shuffled_keys(n, 8, 1)
    m, _, _ = banded_join(r, sorted_keys(n), tile=2048, locality_window=8,
                          interpret=True)
    assert m == n


def test_abort_retry_on_underestimated_window():
    """Optimistic odd-even with too few passes must detect violations and
    retry with bitonic (the abort→retry analog)."""
    r = local_shuffled_keys(N, 64, 0)   # displacement up to 64
    m, build, ovf = banded_join(r, sorted_keys(N), tile=2048,
                                locality_window=4, interpret=True)
    assert build.violations > 0 and build.resorted
    assert m == N


def test_pipelined_join_fast_path():
    """The fence-free pipeline: one readback, exact matches + conservation."""
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    r = local_shuffled_keys(N, 8, 3)
    out = banded_join_pipelined(r, sorted_keys(N), tile=2048,
                                locality_window=8, interpret=True)
    assert out.matches == N
    assert out.violations == 0 and out.overflow_tiles == 0
    assert out.output_sum == N * (N + 1) // 2
    assert not out.resorted


def test_pipelined_join_abort_retry():
    """Underestimated window -> violations detected in the single readback ->
    bitonic retry reruns the device chain (the HTM abort protocol)."""
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    r = local_shuffled_keys(N, 64, 0)
    out = banded_join_pipelined(r, sorted_keys(N), tile=2048,
                                locality_window=4, interpret=True)
    assert out.resorted and out.matches == N
    assert out.output_sum == N * (N + 1) // 2


def test_pipelined_join_duplicates_general():
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    r = uniform_keys(N, N // 4, 16, 0)
    s = sorted_keys(N)
    out = banded_join_pipelined(r, s, tile=2048, interpret=True)
    assert out.matches == reference_match_count(r, s)


def test_shifted_block_sort_exact_for_bounded_displacement():
    """Staircase lemma: two shifted block-bitonic passes sort any
    displacement<=w sequence."""
    for w in (2, 5, 8, 16, 63):
        keys = np.asarray(local_shuffled_keys(4096, w, w), np.int32)
        out = run_kernel(lambda a, w=w: linops.shifted_block_sort_keys(a, w),
                         jnp.asarray(keys.reshape(-1, 128)))
        assert np.array_equal(np.asarray(out).reshape(-1),
                              np.arange(1, 4097)), w


def test_block_bitonic_sorts_segments():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 20, size=(8, 128), dtype=np.int32)
    out = run_kernel(lambda a: linops.block_bitonic_sort_keys(a, 64, 0),
                     jnp.asarray(x))
    flat = np.asarray(out).reshape(-1)
    for s in range(0, 1024, 64):
        assert np.all(np.diff(flat[s:s + 64]) >= 0)
    # offset pass leaves the head/tail partials untouched
    out2 = run_kernel(lambda a: linops.block_bitonic_sort_keys(a, 64, 32),
                      jnp.asarray(x))
    assert np.array_equal(np.asarray(out2).reshape(-1)[:32],
                          x.reshape(-1)[:32])


def test_pipelined_blocks_method_and_unique_count():
    """Window 16 now takes the shifted-block sorter; unique_both count must
    agree with the general formula."""
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    r = local_shuffled_keys(N, 16, 5)
    s = sorted_keys(N)
    general = banded_join_pipelined(r, s, tile=2048, locality_window=16,
                                    interpret=True)
    fast = banded_join_pipelined(r, s, tile=2048, locality_window=16,
                                 unique_both=True, interpret=True)
    assert general.matches == fast.matches == N
    assert fast.violations == 0 and not fast.resorted


def test_pipelined_large_window_blocks():
    """Window beyond odd-even reach (129..1024) uses blocks and stays exact."""
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    r = local_shuffled_keys(N, 300, 9)
    out = banded_join_pipelined(r, sorted_keys(N), tile=2048,
                                locality_window=300, unique_both=True,
                                interpret=True)
    assert out.matches == N and out.violations == 0


def test_narrow_kernel_wide_band_flags_and_repair():
    """A tile whose S band far exceeds tile+overhang must be flagged by the
    narrow kernel and recounted exactly host-side (the conflict-spill path:
    kernel contributes 0 for flagged tiles, pipeline repairs)."""
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    r = local_shuffled_keys(N, 8, 7)
    # S: sorted with a 6000-copy run of one key inside tile 0's value range
    # -> tile 0's band spans ~47 rows >> 16 + 8
    s = np.sort(np.concatenate([np.arange(1, N + 1, dtype=np.int32),
                                np.full(6000, 100, np.int32)]))
    out = banded_join_pipelined(jnp.asarray(r), jnp.asarray(s), tile=2048,
                                locality_window=8, interpret=True)
    assert out.overflow_tiles >= 1            # flagged, host-repaired
    assert out.matches == N + 6000            # every s matches exactly once
    assert out.output_sum == N * (N + 1) // 2


def test_narrow_kernel_overhang_spanning_matches():
    """Matches that land exactly in the overhang rows (band one row past the
    window) are counted by the mini-merge — the regression that the masked
    mini-merge bug silently dropped."""
    from htm_hashjoin_tpu.joins.pallas_backend import banded_join_pipelined
    for seed in range(4):
        r = local_shuffled_keys(N, 8, seed)
        out = banded_join_pipelined(r, sorted_keys(N), tile=2048,
                                    locality_window=8, interpret=True)
        assert out.matches == N, seed
        assert out.overflow_tiles == 0


def test_global_sort_tiles():
    """Grouped cross-tile bitonic network == np.sort, with MAXI32 padding
    kept at the global end (duplicates, non-pow2 sizes, single tile)."""
    from htm_hashjoin_tpu.joins.pallas_backend import to_tiles_2d_pow2
    from htm_hashjoin_tpu.ops.pallas.join_kernels import (MAXI32,
                                                          global_sort_tiles)
    rng = np.random.default_rng(5)
    for n in (2048, 6000, 16384):
        for gen in ("dup", "perm"):
            k = (rng.integers(0, 700, n) if gen == "dup"
                 else rng.permutation(n) + 1).astype(np.int32)
            r2d = to_tiles_2d_pow2(jnp.asarray(k), 2048)
            out = np.asarray(global_sort_tiles(r2d, tile=2048,
                                               interpret=True)).ravel()
            np.testing.assert_array_equal(out[:n], np.sort(k))
            assert (out[n:] == MAXI32).all()


def test_fused_sort_count_matches_two_kernel():
    """Kernel D (fused sort+count) must agree with the two-kernel pipeline
    on every sorter method, for unique and duplicate keys, including the
    per-tile flags that drive the repair path."""
    import numpy as np
    from htm_hashjoin_tpu.joins.pallas_backend import (
        _slice_offsets, _tile_minmax, prepare_probe_side, to_tiles_2d)
    from htm_hashjoin_tpu.ops.pallas.join_kernels import (
        LANES, fused_sort_count, sort_tiles, banded_count_narrow)

    tile = 2048
    rows_per_tile = tile // LANES
    rng = np.random.default_rng(11)
    n = 3 * tile + 513
    for unique, method, passes in [(True, "oddeven", 4), (True, "blocks", 16),
                                   (True, "bitonic", 1),
                                   (False, "bitonic", 1)]:
        if unique:
            rkeys = rng.permutation(n).astype(np.int32) + 1
            skeys = np.arange(1, n + 1, dtype=np.int32)
            if method != "bitonic":   # bounded displacement for optimistic
                rkeys = np.arange(1, n + 1, dtype=np.int32)
                idx = np.arange(n) + rng.integers(0, passes, n)
                rkeys = rkeys[np.argsort(idx, kind="stable")]
        else:
            rkeys = rng.integers(1, n // 3, n).astype(np.int32)
            skeys = np.sort(rng.integers(1, n // 3, n).astype(np.int32))
        r2d = to_tiles_2d(jnp.asarray(rkeys), tile)
        s2d = prepare_probe_side(jnp.asarray(skeys), tile)
        mins, maxs = _tile_minmax(r2d, rows_per_tile)
        off, end = _slice_offsets(jnp.asarray(skeys), mins, maxs)
        row_off = (off // LANES).astype(jnp.int32)
        rows_needed = jnp.maximum(
            (end + LANES - 1) // LANES - row_off, 0).astype(jnp.int32)
        sorted_f, stats_f, counts_f, flags_f = fused_sort_count(
            r2d, s2d, row_off, rows_needed, tile=tile, method=method,
            passes=passes, unique_both=unique, interpret=True)
        sorted_r, stats_r = sort_tiles(r2d, tile=tile, method=method,
                                       passes=passes, interpret=True)
        counts_r, flags_r = banded_count_narrow(
            sorted_r, s2d, row_off, rows_needed, tile=tile,
            unique_both=unique, interpret=True)
        assert np.array_equal(np.asarray(sorted_f), np.asarray(sorted_r))
        assert np.array_equal(np.asarray(counts_f), np.asarray(counts_r))
        assert np.array_equal(np.asarray(flags_f[:, 0]),
                              np.asarray(flags_r[:, 0]))
        assert np.array_equal(np.asarray(stats_f[:, :3]),
                              np.asarray(stats_r[:, :3]))


def test_tagged_count_matches_probe_sorted():
    """The Pallas tagged-sort count (the skew repair engine) must agree
    with the XLA tagged formula on duplicate-heavy data, including MAXI32
    padding entries on the R side (they self-cancel)."""
    from htm_hashjoin_tpu.joins.pallas_backend import tagged_count
    from htm_hashjoin_tpu.ops.probe import probe_sorted
    r = zipf_keys(N, N // 16, 1.25, 3)
    s = jnp.sort(zipf_keys(N, N // 16, 1.25, 4))
    want = int(probe_sorted(r, s))
    got = int(tagged_count(r, s, tile=2048, interpret=True))
    assert got == want
    # R-side MAXI32 rows are padding and contribute nothing
    from htm_hashjoin_tpu.joins.pallas_backend import MAXI32
    r_pad = jnp.concatenate([r, jnp.full((37,), MAXI32, jnp.int32)])
    assert int(tagged_count(r_pad, s, tile=2048, interpret=True)) == want


def test_mass_overflow_batched_gather_is_capped():
    """ADVICE r3: >1/8 of tiles overflowing must NOT gather (near-)all of R
    into the padded buffer — the repair counts the full relation directly."""
    from htm_hashjoin_tpu.joins import pallas_backend as pb
    r = shuffled_keys(N, 5)
    build = pb.banded_build(r, tile=2048, interpret=True)
    s = sorted_keys(N)
    m, ovf = pb.banded_probe(build, s, max_chunks=4, interpret=True)
    assert m == N
    assert ovf > (N // 2048) // 8     # mass overflow regime reached
