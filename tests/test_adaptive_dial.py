"""HTM_ADAPT real-dial tests (joins/htm.py _adaptive_pallas_plan): the
measured sample displacement drives WHICH sorter program runs
(HTMHashBuild.hpp:204-211 re-expressed as an execution choice)."""

import dataclasses

from htm_hashjoin_tpu.config import Algo, Distribution, JoinConfig
from htm_hashjoin_tpu.data.generators import build_relations
from htm_hashjoin_tpu.joins.common import (adaptive_window_estimate,
                                           pallas_plan)
from htm_hashjoin_tpu.joins.htm import htm_join

N = 1 << 14


def _cfg(**kw):
    base = dict(algo=Algo.HTM, r_size=N,
                data_distr=Distribution.LOCAL_SHUFFLE, shuffle_range=8,
                enable_probe=True, backend="pallas", adaptive=True)
    base.update(kw)
    return JoinConfig(**base)


def test_adaptive_picks_cheap_sorter_when_config_lies():
    """Data has window 8; the config declares 2^14.  The fixed plan would
    run the expensive wide path; the dial measures ~8 and picks the
    optimistic bounded-displacement sorter."""
    cfg = _cfg()
    r, s = build_relations(cfg)
    lied = dataclasses.replace(cfg, shuffle_range=N)
    m = htm_join(r, s, lied)
    assert m.totalMatches == N and m.inputSum == m.outputSum
    ap = m.extra["adaptivePlan"]
    assert ap["window"] is not None and ap["window"] <= 512, ap
    # the fixed plan under the lying config is NOT the optimistic sorter
    fixed = pallas_plan(lied)
    assert fixed.window is None
    assert m.extra["adaptiveTransactionSizeFinal"] == ap["window"]


def test_adaptive_escalates_on_global_shuffle():
    """In-chunk displacement saturates on globally shuffled data — the
    dial must escalate to the sort-first plan, not trust the sample."""
    cfg = _cfg(data_distr=Distribution.SHUFFLE)
    r, s = build_relations(cfg)
    m = htm_join(r, s, cfg)
    assert m.totalMatches == N and m.inputSum == m.outputSum
    ap = m.extra["adaptivePlan"]
    assert ap["windowEstimate"] is None
    assert ap["presort"] is True


def test_adaptive_estimate_statistics():
    cfg = _cfg()
    r, _ = build_relations(cfg)
    est = adaptive_window_estimate(r.keys, cfg)
    assert 0 < est["maxDisplacement"] <= 8
    assert est["sampleDuplicates"] == 0       # permutation data
    assert est["sniffTimeUs"] > 0


def test_window_override_zero_stays_guarded():
    """A sample measuring zero displacement must NOT claim certified
    sortedness — the 1-pass optimistic sorter (violation-guarded) runs."""
    plan = pallas_plan(JoinConfig(r_size=N), window_override=0)
    assert plan.presorted is False and plan.window == 1
