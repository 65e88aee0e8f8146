"""Join-algorithm correctness: the reference's embedded oracle set as tests
(SURVEY.md §4): conservation checksums, known-cardinality match counts,
determinism, conflict accounting."""

import numpy as np
import pytest

from htm_hashjoin_tpu.config import Algo, Distribution, JoinConfig
from htm_hashjoin_tpu.data.generators import build_relations
from htm_hashjoin_tpu.joins import DISPATCH
from htm_hashjoin_tpu.relation import Relation
from htm_hashjoin_tpu.utils.validate import reference_match_count

ALGOS = ["nocc", "atomic", "htm", "radix", "sortmerge", "npo", "npo_st",
         "adaptive"]
EXACT_ALGOS = [a for a in ALGOS if a != "nocc"]  # nocc is lossy by design
DISTS = [Distribution.SORTED, Distribution.SHUFFLE, Distribution.LOCAL_SHUFFLE]
N = 1 << 13


def run(algo, dist, n=N, **kw):
    cfg = JoinConfig(algo=Algo(algo), r_size=n, data_distr=dist, **kw)
    r, s = build_relations(cfg)
    return DISPATCH[algo](r, s, cfg), r, s


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("dist", DISTS)
def test_pk_match_count(algo, dist):
    """PK ⋈ sorted ⇒ matches == rSize (experiments/alt/probe_log1:1 oracle)."""
    m, _, _ = run(algo, dist)
    assert m.totalMatches == N
    assert m.conserved, f"{algo} lost tuples on unique keys"


@pytest.mark.parametrize("algo", EXACT_ALGOS)
def test_duplicates_exact(algo):
    """With duplicate keys (uniform dist) every non-lossy algorithm must be
    multiset-exact and conserve checksums."""
    m, r, s = run(algo, Distribution.UNIFORM, distinct_keys=N // 2)
    assert m.totalMatches == reference_match_count(r.keys, s.keys)
    assert m.conserved


def test_nocc_lossy_on_duplicates():
    """NoCC silently loses colliding tuples — outputSum < inputSum
    (the racy-build detector, AtomicsVsHTMVsNoCC_log1:1)."""
    m, _, _ = run("nocc", Distribution.UNIFORM, distinct_keys=N // 2)
    assert m.outputSum < m.inputSum


@pytest.mark.parametrize("algo", EXACT_ALGOS)
def test_zipf_exact(algo):
    """Heavy skew: zipf R against FK S."""
    m, r, s = run(algo, Distribution.ZIPF, distinct_keys=N // 4, zipf_param=1.05)
    assert m.totalMatches == reference_match_count(r.keys, s.keys)


@pytest.mark.parametrize("algo", ALGOS)
def test_deterministic(algo):
    a, _, _ = run(algo, Distribution.SHUFFLE)
    b, _, _ = run(algo, Distribution.SHUFFLE)
    assert a.totalMatches == b.totalMatches
    assert a.inputSum == b.inputSum
    assert a.outputSum == b.outputSum


def test_atomic_conflicts_accounted():
    """Budget-exhausted tuples land in the conflicts spill and stay part of
    outputSum (AtomicHashBuild.hpp:62-63,90-152)."""
    m, _, _ = run("atomic", Distribution.UNIFORM, distinct_keys=N // 8,
                  probe_length=2)
    assert m.conflictCount > 0
    assert m.conserved


def test_htm_failed_transactions_stat():
    """Duplicates make the optimistic scatter 'abort'
    (failedTransactions analog, HTMHashBuild.hpp:188-191)."""
    m, _, _ = run("htm", Distribution.UNIFORM, distinct_keys=N // 4)
    assert m.failedTransactions > 0
    assert m.conserved
    m2, _, _ = run("htm", Distribution.SORTED)
    assert m2.failedTransactions == 0


def test_adaptive_picks_htm_on_locality():
    m, _, _ = run("adaptive", Distribution.LOCAL_SHUFFLE)
    assert m.extra["chosenPath"] == "htm"
    assert m.firstRoundFailureFraction < 0.004


def test_adaptive_picks_radix_on_duplicates():
    m, _, _ = run("adaptive", Distribution.UNIFORM, distinct_keys=N // 8)
    assert m.extra["chosenPath"] == "radix"


def test_adaptive_picks_radix_on_sparse_keys():
    """RANDOM dist: keys span the whole int32 range → bucket table would
    wrap → planner must take the radix path."""
    m, _, _ = run("adaptive", Distribution.RANDOM)
    assert m.extra["chosenPath"] == "radix"


def test_fk_join_cardinality():
    """PK ⋈ FK ⇒ matches == sSize exactly (generator.c:458-491 contract)."""
    cfg = JoinConfig(algo=Algo.RADIX, r_size=N, s_size=4 * N,
                     data_distr=Distribution.FK)
    from htm_hashjoin_tpu.data.generators import pk_keys, fk_from_pk_keys
    r = Relation(pk_keys(N, 0))
    s = Relation(fk_from_pk_keys(4 * N, N, 1))
    m = DISPATCH["radix"](r, s, cfg)
    assert m.totalMatches == 4 * N


def test_build_only_mode():
    """ENABLE_PROBE off: build-only run, no totalMatches field
    (config.h ENABLE_PROBE)."""
    cfg = JoinConfig(algo=Algo.HTM, r_size=N, enable_probe=False)
    r, s = build_relations(cfg)
    m = DISPATCH["htm"](r, s, cfg)
    assert m.totalMatches is None
    assert m.conserved


def test_json_line_schema():
    """The stdout schema fields of HTMHashBuild.hpp:417-449."""
    m, _, _ = run("htm", Distribution.SORTED)
    d = m.to_dict()
    for field in ["algo", "rSize", "transactionSize", "probeLength",
                  "hashBuildTimeInMicroseconds", "conflictCount",
                  "failedTransactions", "failedTransactionPercentage",
                  "totalFailedPercentage", "totalMatches", "inputSum",
                  "outputSum"]:
        assert field in d, field
    import json
    json.loads(m.to_json_line())


def test_tiny_relation_no_probe_wraparound():
    """rSize=1: probeLength > tableSize must not rescan slots and
    double-count (regression: probe wrap)."""
    for algo in ["atomic", "nocc", "htm", "npo"]:
        m, _, _ = run(algo, Distribution.SORTED, n=1)
        assert m.totalMatches == 1, algo


def test_reference_schema_conventions():
    """Schema parity with the reference logs: percentage-named fields carry
    FRACTIONS (HTMHashBuild.hpp:410-415, e.g. 2.03848e-05), nocc/atomic call
    their spill count 'conflicts' (NoCCHashBuild.hpp:137), htm keeps
    'conflictCount'."""
    import json
    from htm_hashjoin_tpu.joins import atomic_join, htm_join, nocc_join
    cfg = JoinConfig(algo=Algo.NOCC, r_size=4096,
                     data_distr=Distribution.UNIFORM, distinct_keys=512)
    r, s = build_relations(cfg)
    d = json.loads(nocc_join(r, s, cfg).to_json_line())
    assert "conflicts" in d and "conflictCount" not in d
    d = json.loads(atomic_join(r, s, JoinConfig(
        algo=Algo.ATOMIC, r_size=4096, data_distr=Distribution.UNIFORM,
        distinct_keys=512)).to_json_line())
    assert "conflicts" in d and "conflictCount" not in d
    cfg = JoinConfig(algo=Algo.HTM, r_size=4096, retry=False,
                     data_distr=Distribution.UNIFORM, distinct_keys=512)
    d = json.loads(htm_join(r, s, cfg).to_json_line())
    assert "conflictCount" in d
    # fractions: failed/rSize, never x100 (reference convention)
    assert 0.0 <= d["failedTransactionPercentage"] <= 1.0
    assert abs(d["failedTransactionPercentage"]
               - d["failedTransactions"] / 4096) < 1e-12
    assert abs(d["totalFailedPercentage"]
               - (d["failedTransactions"] + d["conflictCount"]) / 4096) < 1e-12


def test_nocc_linear_probing_places_colliders():
    """NoCC linear-probes with the budget (NoCCHashBuild.hpp:43-63): mild
    duplication should mostly LAND in later slots, not vanish — losses come
    only from same-round same-slot races, and budget exhaustion spills to
    the conflicts set counted into outputSum."""
    cfg = JoinConfig(algo=Algo.NOCC, r_size=4096, probe_length=8,
                     data_distr=Distribution.UNIFORM, distinct_keys=2048)
    from htm_hashjoin_tpu.joins import nocc_join
    r, s = build_relations(cfg)
    m = nocc_join(r, s, cfg)
    # duplicates collide in round one -> lossy (reference invariant);
    # the synchronous-round race is MORE contended than the reference's
    # thread interleaving, so the loss fraction is an upper bound
    assert m.outputSum < m.inputSum
    # distinct keys survive: at least one copy of each lands
    assert m.outputSum > 0 and m.totalMatches > 0
    # spills are accounted, not silently dropped (outputSum includes them)
    assert m.conflictCount >= 0
