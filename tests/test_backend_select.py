"""Tests for the Pallas backend selection (cfg.backend=auto|xla|pallas).

On CPU, 'auto' keeps the XLA formulation; 'pallas' forces the banded
engine in interpret mode — results must be identical either way.
"""

import json

from htm_hashjoin_tpu.config import Algo, Distribution, JoinConfig
from htm_hashjoin_tpu.data.generators import build_relations
from htm_hashjoin_tpu.joins import htm_join, radix_join
from htm_hashjoin_tpu.joins.common import pallas_plan, use_pallas_engine

N = 1 << 13


def _cfg(**kw):
    base = dict(algo=Algo.HTM, r_size=N,
                data_distr=Distribution.LOCAL_SHUFFLE, shuffle_range=16)
    base.update(kw)
    return JoinConfig(**base)


def test_auto_stays_xla_on_cpu():
    cfg = _cfg()
    r, s = build_relations(cfg)
    assert not use_pallas_engine(cfg, s)  # default backend is cpu in tests
    m = htm_join(r, s, cfg)
    assert "backend" not in m.extra


def test_forced_pallas_matches_xla_htm():
    cfg_x = _cfg(backend="xla")
    cfg_p = _cfg(backend="pallas")
    r, s = build_relations(cfg_x)
    mx = htm_join(r, s, cfg_x)
    mp = htm_join(r, s, cfg_p)
    assert mp.extra["backend"] == "pallas_banded"
    assert mp.totalMatches == mx.totalMatches == N
    assert mp.inputSum == mp.outputSum == mx.inputSum


def test_forced_pallas_matches_xla_radix_duplicates():
    cfg_x = _cfg(algo=Algo.RADIX, data_distr=Distribution.UNIFORM,
                 distinct_keys=N // 4, backend="xla")
    cfg_p = _cfg(algo=Algo.RADIX, data_distr=Distribution.UNIFORM,
                 distinct_keys=N // 4, backend="pallas")
    r, s = build_relations(cfg_x)
    mx = radix_join(r, s, cfg_x)
    mp = radix_join(r, s, cfg_p)
    assert mp.totalMatches == mx.totalMatches
    assert mp.inputSum == mp.outputSum


def test_eligibility_rules():
    # unsorted probe side (zipf S is FK-shuffled) -> eligible WITH sort_s
    from htm_hashjoin_tpu.joins.common import plan_sort_s
    cfg = _cfg(data_distr=Distribution.ZIPF, distinct_keys=N, backend="pallas")
    _, s = build_relations(cfg)
    assert use_pallas_engine(cfg, s) and plan_sort_s(s)
    # RANDOM keys exceed the pack limit -> ineligible
    cfg = _cfg(data_distr=Distribution.RANDOM, backend="pallas")
    _, s = build_relations(cfg)
    assert not use_pallas_engine(cfg, s)
    # mesh runs use the distributed engine
    cfg = _cfg(backend="pallas", mesh_shape=(2,))
    _, s = build_relations(_cfg())
    assert not use_pallas_engine(cfg, s)
    # build-only runs have no probe side
    cfg = _cfg(backend="pallas", enable_probe=False)
    _, s = build_relations(_cfg())
    assert not use_pallas_engine(cfg, s)


def test_pallas_plan_selection():
    # (window, presort, presorted, narrow)
    assert pallas_plan(_cfg(data_distr=Distribution.SORTED)) == (1, False, True, None)
    assert pallas_plan(_cfg(shuffle_range=64)) == (64, False, False, None)
    # mid windows: exact per-tile bitonic with wide bands (general kernel)
    assert pallas_plan(_cfg(shuffle_range=4096)) == (None, False, False, False)
    assert pallas_plan(_cfg(shuffle_range=65536)) == (None, False, False, False)
    # beyond the tile: sort-first
    assert pallas_plan(_cfg(shuffle_range=1 << 17)) == (None, True, False, None)
    assert pallas_plan(_cfg(data_distr=Distribution.SHUFFLE)) == (None, True, False, None)


def test_cli_backend_flag(capsys):
    from htm_hashjoin_tpu.cli import main
    main(["--algo", "htm", "--rSize", str(N), "--dataDistr", "local_shuffle",
          "--shuffleRange", "8", "--backend", "pallas"])
    d = json.loads(capsys.readouterr().out.strip().split("\n")[0])
    assert d["backend"] == "pallas_banded"
    assert d["totalMatches"] == N
    assert d["inputSum"] == d["outputSum"]


def test_cli_mc_algo_aliases(capsys):
    """mc driver names (PRO/RJ/PRH/PRHO/NPO/NPO_st, mc/src/main.c:292-301)
    are accepted and dispatch to the equivalent algorithm."""
    from htm_hashjoin_tpu.cli import main
    main(["--algo", "RJ", "--rSize", str(1 << 12), "--dataDistr", "shuffle"])
    d = json.loads(capsys.readouterr().out.strip().split("\n")[0])
    assert d["algo"] == "radix" and d["totalMatches"] == 1 << 12


def test_forced_pallas_matches_xla_sortmerge():
    from htm_hashjoin_tpu.joins import sortmerge_join
    cfg_x = _cfg(algo=Algo.SORTMERGE, data_distr=Distribution.SHUFFLE,
                 backend="xla")
    cfg_p = _cfg(algo=Algo.SORTMERGE, data_distr=Distribution.SHUFFLE,
                 backend="pallas")
    r, s = build_relations(cfg_x)
    mx = sortmerge_join(r, s, cfg_x)
    mp = sortmerge_join(r, s, cfg_p)
    assert mp.extra["backend"] == "pallas_banded"
    assert mp.totalMatches == mx.totalMatches == N


def test_forced_pallas_build_only_htm():
    """Build-only (ENABLE_PROBE off) routes through the banded build on
    unique keys; metrics must agree with the XLA scatter build."""
    import pytest
    for dist, kw in [(Distribution.SORTED, {}),
                     (Distribution.LOCAL_SHUFFLE, dict(shuffle_range=16)),
                     (Distribution.SHUFFLE, {})]:
        cfg_x = _cfg(data_distr=dist, enable_probe=False, backend="xla", **kw)
        cfg_p = _cfg(data_distr=dist, enable_probe=False, backend="pallas", **kw)
        r, s = build_relations(cfg_x)
        mx = htm_join(r, s, cfg_x)
        mp = htm_join(r, s, cfg_p)
        assert mp.extra["backend"] == "pallas_banded", dist
        assert mp.inputSum == mp.outputSum == mx.inputSum, dist
        assert mp.totalMatches is None and mx.totalMatches is None


def test_forced_pallas_atomic_nocc_unique():
    """atomic/nocc route through the banded engine on certified-unique keys
    (probing and build-only); on duplicate distributions they must stay on
    the XLA scatter path (loss/spill semantics)."""
    from htm_hashjoin_tpu.joins import atomic_join, nocc_join
    for join, algo in ((atomic_join, "atomic"), (nocc_join, "nocc")):
        for probe in (True, False):
            cfg_x = _cfg(algo=Algo(algo), enable_probe=probe, backend="xla")
            cfg_p = _cfg(algo=Algo(algo), enable_probe=probe, backend="pallas")
            r, s = build_relations(cfg_x)
            mx = join(r, s, cfg_x)
            mp = join(r, s, cfg_p)
            assert mp.extra["backend"] == "pallas_banded", (algo, probe)
            assert mp.inputSum == mp.outputSum == mx.inputSum
            assert mp.conflictCount == mx.conflictCount == 0
            assert mp.totalMatches == mx.totalMatches  # None when build-only
        # duplicates: never routed to the banded engine (nocc must keep
        # losing tuples there, atomic must keep spill accounting)
        cfg_dup = _cfg(algo=Algo(algo), data_distr=Distribution.UNIFORM,
                       distinct_keys=N // 4, backend="pallas")
        r, s = build_relations(cfg_dup)
        m = join(r, s, cfg_dup)
        assert "backend" not in m.extra, algo
    # the nocc loss invariant survives the routing change
    cfg = _cfg(algo=Algo.NOCC, data_distr=Distribution.UNIFORM,
               distinct_keys=N // 4, backend="pallas")
    r, s = build_relations(cfg)
    m = nocc_join(r, s, cfg)
    assert m.outputSum < m.inputSum


def test_forced_pallas_matches_xla_npo():
    from htm_hashjoin_tpu.joins import npo_join
    cfg_x = _cfg(algo=Algo.NPO, backend="xla")
    cfg_p = _cfg(algo=Algo.NPO, backend="pallas")
    r, s = build_relations(cfg_x)
    mx = npo_join(r, s, cfg_x)
    mp = npo_join(r, s, cfg_p)
    assert mp.extra["backend"] == "pallas_banded"
    assert mp.totalMatches == mx.totalMatches == N
    assert mp.inputSum == mp.outputSum


def test_presorted_fast_path_matches_xla():
    """SORTED-distribution plan skips the sort megakernel entirely; matches
    and conservation must equal the XLA path (routing-change parity rule)."""
    from htm_hashjoin_tpu.joins.sortmerge import sortmerge_join
    for join in (htm_join, sortmerge_join):
        cfg_x = _cfg(backend="xla", data_distr=Distribution.SORTED)
        cfg_p = _cfg(backend="pallas", data_distr=Distribution.SORTED)
        r, s = build_relations(cfg_x)
        mx = join(r, s, cfg_x)
        mp = join(r, s, cfg_p)
        assert mp.extra["backend"] == "pallas_banded"
        assert mp.totalMatches == mx.totalMatches == N
        assert mp.inputSum == mp.outputSum == mx.inputSum
        assert mp.failedTransactions == 0


def test_presorted_build_only():
    cfg_p = _cfg(backend="pallas", data_distr=Distribution.SORTED,
                 enable_probe=False)
    r, s = build_relations(cfg_p)
    m = htm_join(r, None, cfg_p)
    assert m.extra["backend"] == "pallas_banded"
    assert m.inputSum == m.outputSum == N * (N + 1) // 2


def test_window_boundary_routes_wide_band():
    """Windows past the optimistic sorters' reach (512) take the wide-band
    tile-bitonic plan (NOT the narrow kernel, whose overhang certificate
    fails on every tile there — minutes of host repair at 2^27)."""
    assert pallas_plan(_cfg(shuffle_range=512)).narrow is None
    assert pallas_plan(_cfg(shuffle_range=1024)).narrow is False
    for w in (1024, 4096):
        cfg = _cfg(shuffle_range=w, backend="pallas")
        r, s = build_relations(cfg)
        m = htm_join(r, s, cfg)
        assert m.extra["backend"] == "pallas_banded", w
        assert m.totalMatches == N and m.inputSum == m.outputSum
        assert m.conflictCount == 0, w   # no band overflow: plan certifies


def test_forced_pallas_unsorted_s_duplicates():
    """Unsorted probe sides (zipf/fk/nonunique S) now reach the banded
    engine via a device global sort of S — matches and conservation must
    equal the XLA paths exactly, duplicates included."""
    from htm_hashjoin_tpu.joins import npo_join, sortmerge_join
    for join, algo in ((htm_join, Algo.HTM), (npo_join, Algo.NPO),
                       (sortmerge_join, Algo.SORTMERGE),
                       (radix_join, Algo.RADIX)):
        for dist, kw in [(Distribution.ZIPF, dict(distinct_keys=N // 8)),
                         (Distribution.FK, {}),
                         (Distribution.UNIFORM, dict(distinct_keys=N // 4))]:
            cfg_x = _cfg(algo=algo, data_distr=dist, backend="xla", **kw)
            cfg_p = _cfg(algo=algo, data_distr=dist, backend="pallas", **kw)
            r, s = build_relations(cfg_x)
            mx = join(r, s, cfg_x)
            mp = join(r, s, cfg_p)
            assert mp.extra["backend"] == "pallas_banded", (algo, dist)
            assert mp.totalMatches == mx.totalMatches, (algo, dist)
            assert mp.inputSum == mp.outputSum == mx.inputSum, (algo, dist)


def test_atomic_nocc_unsorted_s_parity():
    """Regression: atomic/nocc with unique R but UNSORTED S (mc -z style)
    must sort S on device — an unsorted S sliced by searchsorted produced
    silently wrong counts (found 2026-08-19)."""
    from htm_hashjoin_tpu.joins import atomic_join, nocc_join
    for join, algo in ((atomic_join, Algo.ATOMIC), (nocc_join, Algo.NOCC)):
        cfg_x = JoinConfig(algo=algo, r_size=1 << 14, data_distr=Distribution.PK,
                           s_distr=Distribution.FK, backend="xla")
        cfg_p = JoinConfig(algo=algo, r_size=1 << 14, data_distr=Distribution.PK,
                           s_distr=Distribution.FK, backend="pallas")
        r, s = build_relations(cfg_x)
        assert not s.assume_sorted
        mx = join(r, s, cfg_x)
        mp = join(r, s, cfg_p)
        assert mp.extra["backend"] == "pallas_banded", algo
        assert mp.totalMatches == mx.totalMatches == 1 << 14, algo
        assert mp.inputSum == mp.outputSum


def test_unique_r_duplicate_s_counts_all_matches():
    """Regression: unique R with duplicate-heavy S must NOT take the
    single-shift unique_both formula (it counts only the first duplicate;
    found 2026-08-19 undercounting 82994/131072)."""
    from htm_hashjoin_tpu.joins import npo_join
    from htm_hashjoin_tpu.joins.common import keys_unique_both
    for s_distr in (Distribution.NONUNIQUE, Distribution.ZIPF):
        cfg_x = JoinConfig(algo=Algo.HTM, r_size=1 << 14,
                           data_distr=Distribution.PK, s_distr=s_distr,
                           distinct_keys=1 << 10, backend="xla")
        cfg_p = JoinConfig(algo=Algo.HTM, r_size=1 << 14,
                           data_distr=Distribution.PK, s_distr=s_distr,
                           distinct_keys=1 << 10, backend="pallas")
        assert not keys_unique_both(cfg_p)
        r, s = build_relations(cfg_x)
        for join in (htm_join, npo_join):
            mx = join(r, s, cfg_x)
            mp = join(r, s, cfg_p)
            assert mp.extra["backend"] == "pallas_banded", s_distr
            assert mp.totalMatches == mx.totalMatches, (s_distr, join)
    # fk S larger than R has duplicates too
    cfg = JoinConfig(algo=Algo.HTM, r_size=1 << 12, s_size=1 << 14,
                     data_distr=Distribution.PK, s_distr=Distribution.FK)
    assert not keys_unique_both(cfg)


def test_track_fields_on_banded_build():
    """--track must emit the failure-histogram fields on the banded
    build-only path too (TM_TRACK parity, HTMHashBuild.hpp:134-142)."""
    cfg = _cfg(backend="pallas", enable_probe=False, track=True,
               shuffle_range=4)
    r, _ = build_relations(cfg)
    m = htm_join(r, None, cfg)
    assert m.extra["backend"] == "pallas_banded"
    assert "chunkFailureFractions" in m.extra
    assert "maxChunkFailureFraction" in m.extra
