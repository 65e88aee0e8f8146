"""Multi-pass fanout-bounded radix partition engine tests
(ops/pallas/radix_kernels.py — the parallel_radix_join.c:559-627,869-956
pass machinery; interpret mode on CPU).

Oracles follow the reference's embedded methodology (SURVEY.md §4):
conservation (multiset equality across every pass), partition contiguity
per pass, exact match counts through the full join."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from htm_hashjoin_tpu.config import Algo, Distribution, JoinConfig
from htm_hashjoin_tpu.data.generators import build_relations
from htm_hashjoin_tpu.joins.radix import radix_join
from htm_hashjoin_tpu.ops.pallas.radix_kernels import (
    CH, MAX_FANOUT, multipass_radix_partition, plan_passes, scatter_plan,
    scatter_tiles, tile_digit_bounds, _to_tiles)
from htm_hashjoin_tpu.ops.pallas.join_kernels import (MAXI32,
                                                      _sort_tiles_jit,
                                                      call_with_big_stack)

TILE = 1024
RPT = TILE // 128


def _vals(arr2d):
    flat = np.asarray(arr2d).reshape(-1)
    return flat[flat != MAXI32]


def test_plan_passes_fanout_contract():
    # the per-pass fanout clamp forces extra passes exactly like the
    # reference's cache bound (prj_params.h:15-22)
    plans = plan_passes(29, 14, 2)
    assert [p.bits for p in plans] == [7, 7]
    assert [p.shift for p in plans] == [22, 15]
    # passes=1 with bits beyond MAX_FANOUT still splits
    plans = plan_passes(29, 14, 1)
    assert all((1 << p.bits) <= MAX_FANOUT for p in plans)
    assert sum(p.bits for p in plans) == 14


def test_single_pass_scatter_oracle():
    rng = np.random.default_rng(1)
    n, f, shift = 4096, 8, 10
    keys = rng.permutation(np.arange(1, n + 1)).astype(np.int32)
    cur = _to_tiles(jnp.asarray(keys), TILE)
    sorted2d = call_with_big_stack(_sort_tiles_jit, cur, tile=TILE,
                                   method="bitonic", interpret=True)[0]
    bounds = tile_digit_bounds(sorted2d, fanout=f, shift=shift,
                               rows_per_tile=RPT)
    # bounds oracle: per-tile searchsorted over the digit sequence
    st = np.asarray(sorted2d).reshape(-1, TILE)
    for t in range(st.shape[0]):
        dig = (st[t].astype(np.int64) >> shift) & (f - 1)
        exp = np.searchsorted(dig, np.arange(f + 1), side="left")
        assert (np.asarray(bounds)[t] == exp).all()
    parent = jnp.zeros((st.shape[0],), jnp.int32)
    plan = scatter_plan(bounds, parent, fanout=f, rows_per_tile=RPT,
                        align_tiles=False, n_parents=1)
    out = scatter_tiles(sorted2d, plan, rows_per_tile=RPT, fanout=f,
                        interpret=True)
    vals = _vals(out)
    assert sorted(vals.tolist()) == sorted(keys.tolist())     # conservation
    dig = (vals.astype(np.int64) >> shift) & (f - 1)
    assert np.all(np.diff(dig) >= 0)                          # contiguity


@pytest.mark.parametrize("n,bits,passes,kb", [
    (4096, 4, 2, 13),      # 2 passes of 2 bits
    (8192, 6, 2, 14),      # 2 passes of 3 bits
    (4096, 6, 3, 13),      # 3 passes (two levels of tile-aligned parents)
])
def test_multipass_conservation_and_contiguity(n, bits, passes, kb):
    rng = np.random.default_rng(n + bits)
    keys = rng.permutation(np.arange(1, n + 1)).astype(np.int32)
    res = multipass_radix_partition(jnp.asarray(keys), radix_bits=bits,
                                    passes=passes, key_bits=kb, tile=TILE,
                                    interpret=True)
    assert len(res.pass_plans) == passes
    vals = _vals(res.partitioned2d)
    assert sorted(vals.tolist()) == sorted(keys.tolist())
    digits = (vals.astype(np.int64) >> (kb - bits)) & ((1 << bits) - 1)
    assert np.all(np.diff(digits) >= 0), "final partitions not contiguous"
    # per-pass hist conservation: every pass's run sizes tally the full
    # padded stream it consumed (pads count toward the top digit)
    for i, h in enumerate(res.pass_hists):
        consumed = int(np.asarray(h).sum())
        assert consumed >= n


def test_multipass_duplicate_keys():
    # duplicates (nonunique alphabet) — runs larger than one chunk exercise
    # the multi-chunk DMA path (> CH rows per run needs run > CH*128
    # elements, so the tile must exceed the chunk granule)
    rng = np.random.default_rng(7)
    n, tile = 8192, 4096
    # alphabet {1..3}: every pass-1 run is nearly a whole 4096-element tile
    # (32 rows = 2 CH-row chunks), so the multi-chunk DMA loop runs
    keys = rng.integers(1, 4, size=n).astype(np.int32)
    res = multipass_radix_partition(jnp.asarray(keys), radix_bits=4,
                                    passes=2, key_bits=6, tile=tile,
                                    interpret=True)
    vals = _vals(res.partitioned2d)
    assert sorted(vals.tolist()) == sorted(keys.tolist())
    digits = (vals.astype(np.int64) >> 2) & 15
    assert np.all(np.diff(digits) >= 0)
    assert int(np.asarray(res.pass_hists[0]).max()) > CH * 128


def test_multipass_radix_join_end_to_end():
    cfg = JoinConfig(algo=Algo.RADIX, r_size=8192,
                     data_distr=Distribution.SHUFFLE, radix_bits=6,
                     radix_passes=2, radix_strategy="multipass",
                     enable_probe=True)
    r, s = build_relations(cfg)
    m = radix_join(r, s, cfg)
    assert m.totalMatches == 8192
    assert m.inputSum == m.outputSum
    assert m.extra["backend"] == "pallas_multipass_radix"
    # the knobs are observable in execution, not just labels
    assert m.extra["passBits"] == [3, 3]
    assert m.extra["passShifts"] == [11, 8]
    d = m.to_dict() if hasattr(m, "to_dict") else None
    # build-only variant
    cfg2 = dataclasses.replace(cfg, enable_probe=False)
    m2 = radix_join(r, None, cfg2)
    assert m2.inputSum == m2.outputSum
    assert m2.partitionTimeInMicroseconds > 0


def test_multipass_vs_sort_strategy_parity():
    """Pallas multipass and the default sort plan must agree bit-for-bit
    on matches (the backend-parity invariant, CLAUDE.md)."""
    cfg = JoinConfig(algo=Algo.RADIX, r_size=4096,
                     data_distr=Distribution.PK,
                     s_distr=Distribution.ZIPF, zipf_param=1.0,
                     radix_bits=4, radix_passes=2, enable_probe=True)
    r, s = build_relations(cfg)
    m_sort = radix_join(r, s, dataclasses.replace(cfg, backend="xla"))
    m_mp = radix_join(r, s, dataclasses.replace(
        cfg, radix_strategy="multipass"))
    assert m_mp.totalMatches == m_sort.totalMatches
    assert m_mp.inputSum == m_mp.outputSum


def test_scatter_kernel_jaxpr_is_int64_free():
    """Mosaic TC has no 64-bit lowering: an i64<->i32 convert_element_type
    inside the kernel sends _convert_helper into unbounded recursion at
    TPU compile time (invisible in CPU interpret mode).  Under x64 (which
    the package enables for the int64 conservation sums) any bare python
    int reaching jnp.where / floordiv / DMA index arithmetic becomes a
    weak i64 literal, so pin the traced kernel jaxpr to be int64-free."""
    import jax
    from htm_hashjoin_tpu.ops.pallas.radix_kernels import _scatter_tiles_jit

    rows = 8192 // 128
    sorted2d = jnp.zeros((rows * 2, 128), jnp.int32)
    tbl = jnp.zeros((2, 4), jnp.int32)
    jaxpr = jax.make_jaxpr(
        lambda s, a, d, dr, nc: _scatter_tiles_jit(
            s, a, d, dr, nc, rows_per_tile=rows, fanout=4,
            out_rows=rows * 4))(sorted2d, tbl, tbl, tbl, tbl)

    def dtype_of(v):
        aval = getattr(v, "aval", None)
        return str(getattr(aval, "dtype", ""))

    offenders = []

    def walk(jx):
        for eqn in jx.eqns:
            if any("int64" in dtype_of(v)
                   for v in list(eqn.invars) + list(eqn.outvars)) or \
                    "int64" in str(eqn.params.get("new_dtype", "")):
                offenders.append(eqn.primitive.name)
            for val in eqn.params.values():
                items = val if isinstance(val, (list, tuple)) else [val]
                for item in items:
                    inner = (item if hasattr(item, "eqns")
                             else getattr(item, "jaxpr", None))
                    if inner is not None and hasattr(inner, "eqns"):
                        walk(inner)

    walk(jaxpr.jaxpr)
    assert not offenders, f"int64 leaked into the scatter kernel: {offenders}"
