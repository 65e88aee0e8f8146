"""Shared join-phase machinery.

Every join runs the reference's phase protocol (mc/wisconsin-src/main.cpp:97-167:
barrier → build → barrier → probe → barrier) as host-orchestrated jitted
phases: XLA provides the intra-phase parallelism, the host boundary is the
barrier, and materialized scalars (conflict counts, sniff statistics) drive
host-side branching exactly where the reference branched between phases.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Distribution, JoinConfig
from ..relation import Relation, next_pow2
from ..ops import insert, probe
from ..utils.metrics import JoinMetrics
from ..utils.timing import PhaseTimer

# Distributions whose keys are an exact permutation of 1..N (unique):
# the claim-free fast insert path is valid for these.
_UNIQUE_DISTS = frozenset({
    Distribution.SORTED, Distribution.SHUFFLE, Distribution.LOCAL_SHUFFLE,
    Distribution.PK, Distribution.PK_LSHUFFLE,
})


def keys_are_unique(cfg: JoinConfig) -> bool:
    return cfg.data_distr in _UNIQUE_DISTS


def keys_unique_both(cfg: JoinConfig) -> bool:
    """BOTH sides certified unique — the precondition of the kernels'
    single-shift count formula (unique_both).  R-side uniqueness alone is
    NOT enough: a duplicate-heavy S (s_distr zipf/nonunique, or fk with
    s_size > r_size) silently undercounts under that formula."""
    if not keys_are_unique(cfg):
        return False
    if cfg.s_distr is None or cfg.s_distr == Distribution.SORTED:
        return True   # driver rule: S = sorted 1..s_size (unique)
    if cfg.s_distr == Distribution.FK:
        # fk multiplicity is ceil(s/r): unique iff s_size <= r_size
        return (cfg.s_size or 0) <= cfg.r_size
    return False


def table_size_for(cfg: JoinConfig) -> int:
    """Flat-table size: scaleOutput × rSize rounded to a power of two
    (AtomicHashBuild.hpp:21-25)."""
    return next_pow2(max(2, cfg.scale_output * cfg.r_size))


def htm_num_buckets(r_size: int) -> int:
    """numBuckets = next_pow2(rSize/3 + 1) (HTMHashBuild.hpp:61-62)."""
    return next_pow2(r_size // 3 + 1)


@functools.partial(jax.jit, static_argnums=())
def _spill_compact(keys: jax.Array, pending: jax.Array) -> jax.Array:
    return insert.spill_sorted(keys, pending)[0]


@jax.jit
def _pending_stats(keys: jax.Array, pending: jax.Array):
    return (jnp.sum(pending, dtype=jnp.int64), probe.masked_sum(keys, pending))


@jax.jit
def _spill_probe(spill: jax.Array, skeys: jax.Array) -> jax.Array:
    return probe.probe_sorted(spill, skeys)


class SpillState:
    """Residual tuples that did not fit the table — the conflicts-array
    analog (HTMHashBuild.hpp:79-83, AtomicHashBuild.hpp:62-63), kept
    binary-searchable so the probe phase still sees every build tuple
    (the engineered improvement over the reference, whose probe ignored
    conflict arrays)."""

    def __init__(self, keys: jax.Array, pending: jax.Array, timer: PhaseTimer):
        cc, cs = _pending_stats(keys, pending)
        self.count = int(cc)
        self.key_sum = int(cs)
        self._spill: Optional[jax.Array] = None
        if self.count > 0:
            self._spill = timer.timed("spill", _spill_compact, keys, pending)

    def probe_count(self, skeys: jax.Array, timer: PhaseTimer) -> int:
        if self._spill is None:
            return 0
        return int(timer.timed("probe_spill", _spill_probe, self._spill, skeys))


def finish_metrics(m: JoinMetrics, timer: PhaseTimer,
                   total_matches: Optional[int],
                   retry: bool = False) -> JoinMetrics:
    if timer.counters:
        # per-phase PCM-analog dumps in the JSON line (the reference wraps
        # build and probe in PCM start/stop+dump, no_partitioning_join.c:
        # 458-527; events programmed from the pcm.cfg-shaped --counters file)
        m.extra["counters"] = timer.counters
    m.hashBuildTimeInMicroseconds = (
        timer.micros.get("build", 0.0) + timer.micros.get("spill", 0.0))
    if "probe" in timer.micros or "probe_spill" in timer.micros:
        m.probeTimeInMicroseconds = (
            timer.micros.get("probe", 0.0) + timer.micros.get("probe_spill", 0.0))
    if total_matches is not None:
        m.totalMatches = total_matches
    if m.rSize:
        # FRACTIONS despite the names — the reference's own convention
        # (HTMHashBuild.hpp:410-415, log values like 2.03848e-05); under
        # TM_RETRY totalFailedPercentage counts only the residual conflicts
        m.failedTransactionPercentage = m.failedTransactions / m.rSize
        m.totalFailedPercentage = (m.conflictCount / m.rSize if retry else
                                   (m.failedTransactions + m.conflictCount)
                                   / m.rSize)
    return m


def resolve_relations(r: Relation, s: Optional[Relation],
                      cfg: JoinConfig) -> Tuple[jax.Array, Optional[jax.Array]]:
    skeys = s.keys if (s is not None and cfg.enable_probe) else None
    return r.keys, skeys


# ---------------------------------------------------------------------------
# Pallas banded-engine plan selection.
#
# The banded megakernels (ops/pallas/join_kernels.py) are the production
# single-chip path: XLA scatter/gather run ~20x below HBM bandwidth on this
# hardware, while the dense sort/merge kernels stream at full rate.  The
# plan qualifies when the probe side is sorted (generator-certified) and
# keys pack into the int32 composite (< 2^29).
# ---------------------------------------------------------------------------

_PACK_LIMIT = 1 << 29


def _max_key_bound(cfg: JoinConfig) -> int:
    """Conservative upper bound on key values from the generator contract
    (SURVEY.md §2.1 DataGen semantics).  RANDOM draws the full int32 range."""
    if cfg.data_distr == Distribution.RANDOM:
        return jnp.iinfo(jnp.int32).max
    return max(cfg.r_size, cfg.s_size or 0, cfg.distinct_keys or 0)


def use_pallas_engine(cfg: JoinConfig, s: Optional[Relation]) -> bool:
    if cfg.backend == "xla" or cfg.mesh_shape:
        return False
    if s is None or not cfg.enable_probe:
        return False
    if _max_key_bound(cfg) >= _PACK_LIMIT:
        return False
    if cfg.backend == "pallas":
        return True
    # auto: megakernels on accelerators only (interpret mode is for tests)
    return jax.default_backend() != "cpu"


def plan_sort_s(s: Relation) -> bool:
    """Unsorted probe sides (zipf/fk/nonunique S, mc/src/main.c:393-412) get
    a device global sort before the banded count (sort_probe_side)."""
    return not s.assume_sorted


def use_pallas_engine_build(cfg: JoinConfig) -> bool:
    """Banded-engine routing for BUILD-ONLY runs (the reference's default
    ENABLE_PROBE=off binaries, config.h:4).  Gated on generator-certified
    unique keys: there the scatter builds lose/spill nothing, so the
    sorted-tile artifact is observationally identical and ~10-20x faster;
    duplicate distributions keep the XLA scatter paths, whose loss (nocc)
    and spill (atomic/htm) accounting is the reference's semantics."""
    if cfg.backend == "xla" or cfg.mesh_shape:
        return False
    if not keys_are_unique(cfg) or _max_key_bound(cfg) >= _PACK_LIMIT:
        return False
    if cfg.backend == "pallas":
        return True
    return jax.default_backend() != "cpu"


def route_unique_pallas(cfg: JoinConfig, s: Optional[Relation]) -> bool:
    """Routing predicate for the identity-hash builds (atomic/nocc): banded
    engine only on generator-certified unique keys, probing or not."""
    if s is not None and cfg.enable_probe:
        return keys_are_unique(cfg) and use_pallas_engine(cfg, s)
    return use_pallas_engine_build(cfg)


def pallas_unique_join(algo: str, r: Relation, s: Optional[Relation],
                       cfg: JoinConfig) -> JoinMetrics:
    """Banded engine for the identity-hash builds (atomic/nocc) on
    generator-certified unique BUILD keys.  With unique keys the
    open-addressing table at 2x load has no losses and no budget exhaustion
    (keys 1..n map to distinct slots under key & (2n-1)), so conflictCount
    and failedTransactions are identically 0 on both formulations and the
    sorted-tile engine is exact.  Duplicate R distributions never reach here
    (use_pallas_engine* gate on keys_are_unique); an unsorted or
    duplicate-heavy S takes the device sort and the general count."""
    import time

    from .pallas_backend import banded_build_pipelined, banded_join_pipelined

    interpret = jax.default_backend() == "cpu"
    probing = s is not None and cfg.enable_probe
    plan = pallas_plan(cfg, probing=probing)
    t0 = time.perf_counter()
    if probing:
        out = banded_join_pipelined(r.keys, s.keys,
                                    locality_window=plan.window,
                                    presort=plan.presort,
                                    presorted=plan.presorted,
                                    narrow=plan.narrow,
                                    sort_s=not s.assume_sorted,
                                    unique_both=keys_unique_both(cfg),
                                    interpret=interpret)
    else:
        out = banded_build_pipelined(r.keys, locality_window=plan.window,
                                     presort=plan.presort,
                                     presorted=plan.presorted,
                                     interpret=interpret)
    elapsed_us = (time.perf_counter() - t0) * 1e6
    m = JoinMetrics(algo=algo, rSize=cfg.r_size,
                    transactionSize=cfg.transaction_size,
                    probeLength=cfg.probe_length,
                    inputSum=out.input_sum, outputSum=out.output_sum,
                    hashBuildTimeInMicroseconds=elapsed_us)
    if probing:
        m.totalMatches = out.matches
    m.extra["backend"] = "pallas_banded"
    m.extra["resorted"] = out.resorted
    from ..utils.profiler import active_counters, traffic_counters
    if active_counters() is not None:
        # planned megakernel traffic, scaled by the plan tier (presort and
        # sort_s runs stream the relation once per global-sort pass)
        byts = plan_traffic_bytes(cfg, plan, probing,
                                  sort_s=probing and not s.assume_sorted)
        c = traffic_counters(byts, elapsed_us)
        if c:
            m.extra["counters"] = {
                ("build+probe" if probing else "build"): c}
    maybe_pipeline_timing(m, cfg, plan, r, s if probing else None, out,
                          interpret)
    return m


def maybe_pipeline_timing(m: JoinMetrics, cfg: JoinConfig, plan, r: Relation,
                          s: Optional[Relation], out, interpret: bool) -> None:
    """Sustained-throughput timing (cfg.pipeline_depth > 1): re-enqueue the
    SAME join pipeline_depth times and fence once — bench.py's production
    serving shape — replacing hashBuildTimeInMicroseconds, whose single-run
    value carries a ~25 ms host-tunnel fence this platform pays per readback
    (the reference's local host never does).  The single-run time stays in
    the JSON as singleRunTimeInMicroseconds.

    Only taken on clean fast paths: a run that repaired (bitonic retry, band
    overflow) must keep its repair cost in the reported time."""
    depth = cfg.pipeline_depth
    if depth <= 1 or out.resorted or out.violations or out.overflow_tiles:
        return
    import time

    import numpy as np

    from .pallas_backend import (enqueue_banded_build, enqueue_full_join,
                                 prepare_probe_side)

    s2d = None
    if s is not None and s.assume_sorted:
        # sorted S is tiled/padded once and reused across the pipeline (the
        # probe side is an input, not per-join work); unsorted S keeps its
        # per-join device sort inside the timed chain
        s2d = prepare_probe_side(s.keys)
        np.asarray(s2d[:1, :1])   # resident before timing starts
    t0 = time.perf_counter()
    if s is not None:
        for _ in range(depth):
            res = enqueue_full_join(r.keys, s.keys,
                                    locality_window=plan.window,
                                    presort=plan.presort,
                                    presorted=plan.presorted,
                                    narrow=plan.narrow,
                                    sort_s=not s.assume_sorted,
                                    unique_both=keys_unique_both(cfg),
                                    interpret=interpret, s2d=s2d)
        np.asarray(jnp.stack(res[:5]))          # ONE fence for the batch
    else:
        for _ in range(depth):
            head = enqueue_banded_build(r.keys, locality_window=plan.window,
                                        presort=plan.presort,
                                        presorted=plan.presorted,
                                        interpret=interpret)
        np.asarray(head)
    per_point_us = (time.perf_counter() - t0) * 1e6 / depth
    m.extra["singleRunTimeInMicroseconds"] = m.hashBuildTimeInMicroseconds
    m.extra["pipelineDepth"] = depth
    m.hashBuildTimeInMicroseconds = per_point_us


def _gsort_pass_count(n: int, tile: int = 65536) -> int:
    """Full HBM read+write passes of the grouped bitonic global sort over an
    n-element relation (pow2-padded tiles): 1 phase-A pass (which absorbs
    the cross-tile levels 1..GSORT_PHASE_A_BITS in VMEM) plus
    ceil(level/GSORT_BITS) per remaining level — matching
    global_sort_tiles' loop exactly (its levels run pa_bits+1..levels)."""
    from ..ops.pallas.join_kernels import GSORT_BITS, GSORT_PHASE_A_BITS
    n_tiles = max(1, (n + tile - 1) // tile)
    n_tiles = 1 << (n_tiles - 1).bit_length()
    levels = n_tiles.bit_length() - 1
    pa_bits = min(GSORT_PHASE_A_BITS, levels)
    return 1 + sum((j + GSORT_BITS - 1) // GSORT_BITS
                   for j in range(pa_bits + 1, levels + 1))


def plan_traffic_bytes(cfg: JoinConfig, plan: "BandedPlan", probing: bool,
                       sort_s: bool) -> float:
    """Planned DMA bytes of the banded engine for THIS plan tier.  The old
    flat 2R+(R+S) model undercounted presort/sort_s runs (the multi-pass
    global bitonic streams the relation once per pass); this scales by the
    plan's actual pass structure:

      * presorted build: one R read (stats/conservation pass);
      * tile-sort build: one R stream (read + write);
      * presort build:   read+write per global-sort pass;
      * probing count:   sorted R re-read + one S-band pass;
      * sort_s:          read+write per global-sort pass over S.

    The fused sort+count kernel saves one R round trip vs the two-kernel
    pipeline; the model keeps the two-kernel figure, making it a documented
    upper bound there (validated against measured traces in
    tests/test_counters_validation.py)."""
    rb = 4.0 * cfg.r_size
    sb = 4.0 * (cfg.s_size or 0)
    if plan.presorted:
        build = rb
    elif plan.presort:
        build = 2.0 * rb * _gsort_pass_count(cfg.r_size)
    else:
        build = 2.0 * rb
    byts = build
    if probing:
        byts += rb + sb
        if sort_s:
            byts += 2.0 * sb * _gsort_pass_count(cfg.s_size or 0)
    return byts


class BandedPlan(NamedTuple):
    """Engine plan for one join (compares equal to a plain tuple)."""
    window: Optional[int]    # optimistic sorter window (None = exact)
    presort: bool            # global-sort-first (the radix-path plan)
    presorted: bool          # input certified sorted: skip sorting entirely
    narrow: Optional[bool]   # narrow-kernel override (None = engine default)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _sniff_profile(keys, chunk, k):
    """MODULE-LEVEL jit: defined inside adaptive_window_estimate it was a
    fresh function identity per call, so every sniff re-traced (~130 ms —
    2.5x the engine run it tunes)."""
    stride = keys.shape[0] // k
    starts = jnp.arange(k) * stride
    segs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(keys, (s,), (chunk,)))(starts)

    def chunk_stats(seg):
        order = jnp.argsort(seg, stable=True)
        inv = jnp.zeros((chunk,), jnp.int32).at[order].set(
            jnp.arange(chunk, dtype=jnp.int32))
        disp = jnp.abs(inv - jnp.arange(chunk, dtype=jnp.int32))
        sseg = seg[order]
        dups = jnp.sum(sseg[1:] == sseg[:-1])
        return jnp.max(disp), dups
    mx, dups = jax.vmap(chunk_stats)(segs)
    # ONE stacked result: separate int() readbacks each pay the ~25-50ms
    # host tunnel fence — two of them cost more than the engine run the
    # sniff is trying to optimize
    return jnp.stack([jnp.max(mx),
                      jnp.sum(dups).astype(jnp.int32)])


def adaptive_window_estimate(rkeys: jax.Array, cfg: JoinConfig,
                             timer=None) -> dict:
    """HTM_ADAPT's observation step with a REAL dial (HTMHashBuild.hpp:
    196-211): sample sniff_rounds strided chunks of sniff_chunk tuples
    (the reference's K×16384 shape, :47-52), measure their displacement
    profile on device, and return the statistics that pick the banded
    engine's sorter.  The measured max displacement IS the tSize analog:
    it selects odd-even passes / shifted-block passes / bitonic — an
    execution choice, not a host-side stats replay."""
    import time

    import numpy as np

    n = int(rkeys.shape[0])
    chunk = min(cfg.sniff_chunk, max(8, n // max(1, cfg.sniff_rounds)))
    k = max(1, min(cfg.sniff_rounds, n // chunk))

    t0 = time.perf_counter()
    stats = np.asarray(_sniff_profile(rkeys, chunk, k))  # the one sniff fence
    mx, dups = int(stats[0]), int(stats[1])
    sniff_us = (time.perf_counter() - t0) * 1e6
    if timer is not None:
        timer.micros["sniff"] = timer.micros.get("sniff", 0.0) + sniff_us
    return {"maxDisplacement": mx, "sampleDuplicates": dups,
            "sniffTimeUs": sniff_us, "sampleChunks": k,
            "sampleChunkSize": chunk,
            "dupFraction": dups / max(1, k * chunk)}


def adaptive_guess_plan(cfg: JoinConfig, probing: bool = True) -> BandedPlan:
    """The fused dial's OPTIMISTIC first plan (VERDICT r3 #7: the sniff
    fence must not precede the engine).  The sniff program is enqueued
    WITH the join and both ride one readback; this guess decides what runs
    meanwhile:

      * declared plan already optimistic (window ≤ 512) or certified
        sorted → trust it — its violation counters catch a lying config;
      * anything wider (wide-band, sort-first) → downgrade to the WIDEST
        optimistic sorter (blocks-512): exact for any true window ≤ 512
        at a fraction of the sort path's cost.  If the data really is
        globally disordered, the violation count in the shared readback
        triggers the repair run, whose plan THEN uses the sniffed
        displacement (the dial) — the same abort→replan protocol as every
        other optimistic assumption in the engine."""
    base = pallas_plan(cfg, probing=probing)
    if base.presorted or (base.window is not None and base.window <= 512
                          and not base.presort):
        return base
    return BandedPlan(512, False, False, None)


def sniff_enqueue(rkeys: jax.Array, cfg: JoinConfig):
    """Enqueue the displacement sniff WITHOUT a fence.  Returns
    (device_stats[2] = [maxDisplacement, sampleDuplicates], chunk, k) —
    stack the stats into the join's own readback bundle."""
    n = int(rkeys.shape[0])
    chunk = min(cfg.sniff_chunk, max(8, n // max(1, cfg.sniff_rounds)))
    k = max(1, min(cfg.sniff_rounds, n // chunk))
    return _sniff_profile(rkeys, chunk, k), chunk, k


def sniff_stats_dict(mx: int, dups: int, chunk: int, k: int) -> dict:
    """The adaptive_window_estimate stats shape for a sniff whose readback
    rode the engine fence (sniffTimeUs 0 — no separate host round trip)."""
    return {"maxDisplacement": mx, "sampleDuplicates": dups,
            "sniffTimeUs": 0.0, "sniffRodeEngineFence": True,
            "sampleChunks": k, "sampleChunkSize": chunk,
            "dupFraction": dups / max(1, k * chunk)}


def dial_window(mx: int, chunk: int) -> int:
    """The dial decision (HTMHashBuild.hpp:208-210 analog): in-chunk
    displacement saturating toward the chunk size means disorder beyond
    the sample's reach — escalate to the sort-first plan."""
    return (1 << 30) if mx >= chunk // 2 else mx


def pallas_plan(cfg: JoinConfig, probing: bool = True,
                window_override: Optional[int] = None) -> BandedPlan:
    """Plan selection for the banded engine, by locality regime:

    * certified sorted input  → no sort at all (presorted);
    * window ≤ 512            → optimistic bounded-displacement sorter
      (odd-even / shifted-block; 512 is the sorters' reach in
      pallas_backend._sort_method AND the narrow kernel's certified
      overhang — beyond it every tile would flag into the host repair);
    * window ≤ tile (65536)   → exact per-tile bitonic with WIDE bands:
      boundary-straddling keys merely widen each tile's S band to
      ≤ tile + 2·window, which the general multi-chunk count kernel
      covers exactly (narrow=False) — one 63 ms tile sort instead of a
      197 ms global sort at 2^27, the regime where the reference's HTM
      still profits from locality (BASELINE.md mid-window rows);
    * beyond, and duplicate-key/global distributions → sort-first plan —
      EXCEPT when no probe follows (``probing=False``, the reference's
      default ENABLE_PROBE=off binaries): a build-only run needs only a
      probe-ABLE artifact, and per-tile sorted runs + the per-tile
      directory are exactly that (the wide-band plan's own build half),
      so the global sort is skipped — a tile-local bitonic at ~1/3 the
      cost.  This is the analog of the reference's build-only binaries
      not paying the probe's cache layout either.

    ``window_override`` (the HTM_ADAPT dial, adaptive_window_estimate):
    a MEASURED displacement bound replaces the generator-declared window
    in the regime selection — 0 means certified sorted."""
    w = window_override
    if w is None:
        if cfg.data_distr == Distribution.SORTED:
            return BandedPlan(1, False, True, None)
        if cfg.data_distr in (Distribution.LOCAL_SHUFFLE,
                              Distribution.PK_LSHUFFLE):
            w = cfg.shuffle_range
    elif w == 0:
        # a SAMPLE statistic cannot certify global sortedness — run the
        # 1-pass optimistic sorter, whose violation count still guards it
        w = 1
    if w is not None:
        if w <= 512:
            return BandedPlan(max(1, w), False, False, None)
        if w <= 65536:
            return BandedPlan(None, False, False, False)
    if not probing:
        return BandedPlan(None, False, False, False)
    return BandedPlan(None, True, False, None)


def pallas_metrics(cfg: JoinConfig, algo: str, outcome, elapsed_us: float,
                   matches: Optional[int],
                   plan: Optional["BandedPlan"] = None,
                   sort_s: bool = False) -> JoinMetrics:
    """Fold a BandedJoinOutcome into the reference metrics schema.

    ``plan``/``sort_s`` feed the plan-scaled traffic model for --counters
    lines; callers that ran a presort or device S sort must pass them or
    the emitted bytes undercount (ADVICE r3)."""
    m = JoinMetrics(algo=algo, rSize=cfg.r_size,
                    transactionSize=cfg.transaction_size,
                    probeLength=cfg.probe_length,
                    conflictCount=outcome.overflow_tiles,
                    failedTransactions=outcome.violations,
                    inputSum=outcome.input_sum,
                    outputSum=outcome.output_sum,
                    hashBuildTimeInMicroseconds=elapsed_us)
    if matches is not None:
        m.totalMatches = matches
    m.extra["backend"] = "pallas_banded"
    m.extra["resorted"] = outcome.resorted
    from ..utils.profiler import active_counters, traffic_counters
    if active_counters() is not None:
        probing = matches is not None
        byts = plan_traffic_bytes(
            cfg, plan if plan is not None else BandedPlan(None, False, False,
                                                          None),
            probing, sort_s)
        c = traffic_counters(byts, elapsed_us)
        if c:
            m.extra["counters"] = {
                ("build+probe" if probing else "build"): c}
    if cfg.r_size:
        # fractions, with the TM_RETRY rule (HTMHashBuild.hpp:410-415)
        m.failedTransactionPercentage = m.failedTransactions / cfg.r_size
        m.totalFailedPercentage = (
            m.conflictCount / cfg.r_size if cfg.retry else
            (m.failedTransactions + m.conflictCount) / cfg.r_size)
    return m
