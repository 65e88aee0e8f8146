"""Parallel radix join — the PRO / PRJ equivalent.

Reference: mc/src/parallel_radix_join.c:231-1309 — 2-pass radix partitioning
(histogram → barrier → cross-thread prefix sum → scatter with padding,
:559-627), task-queue load balancing of pass-2 and join tasks (:946-1089),
bucket-chaining per-partition build (:231-283), optional skew handling
(:958-1055).

TPU-native (SURVEY.md §2.4 P7/P8/P9):
  * the multi-pass histogram/prefix-sum/scatter collapses to one segment-sum
    + cumsum + stable reorder, realized as a fused XLA sort by
    (digit, key) — sorting within partitions *is* the per-partition
    bucket-chaining build, probed with vectorized binary search;
  * the dynamic task queue disappears: SPMD execution is statically
    balanced because the sort-based reorder has no per-partition cost
    variance (SURVEY.md P8);
  * skew handling is subsumed: oversized partitions cost nothing extra in
    the composite-sort formulation; the histogram still reports heavy
    hitters for the distributed engine's splitting decisions
    (parallel/dist_join.py heavy-hitter handling).

Note the reference fork's PRO measures partition+build only (the probe loop
is commented out, parallel_radix_join.c:262-276); we implement and time the
full probe, and report partition/build/probe phases separately.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import JoinConfig
from ..relation import Relation
from ..ops import partition, probe
from ..utils.metrics import JoinMetrics
from ..utils.timing import PhaseTimer
from .common import (finish_metrics, pallas_metrics, resolve_relations,
                     use_pallas_engine)


def _megakernel_sorter(n: int, interpret: bool):
    """int32 global sort via the Pallas bitonic megakernels (2.4x XLA's
    jnp.sort at 2^27 on v5e); MAXI32 padding sorts to the tail and is
    sliced off."""
    from .pallas_backend import DEFAULT_TILE, to_tiles_2d_pow2
    from ..ops.pallas.join_kernels import global_sort_tiles

    def sorter(keys):
        r2d = global_sort_tiles(to_tiles_2d_pow2(keys, DEFAULT_TILE),
                                tile=DEFAULT_TILE, interpret=interpret)
        return r2d.reshape(-1)[:n]
    return sorter


@functools.partial(jax.jit, static_argnums=(1,))
def _msb_stats(sorted_keys: jax.Array, bits: int):
    res, _shift = partition.radix_partition_msb(sorted_keys, bits,
                                                sorter=lambda k: k)
    return (res.hist, jnp.sum(sorted_keys.astype(jnp.int64)),
            jnp.max(res.hist))


def _partition_build(keys: jax.Array, bits: int, use_megakernel: bool):
    """MSB radix partition+build: one int32 key sort (see
    radix_partition_msb).  The sorted array is both the partitioned layout
    and the per-partition search structure.  The megakernel sorter drives
    Pallas from its own (big-stack) thread, so it runs outside the jit and
    the digit/hist epilogue is jitted separately."""
    if use_megakernel:
        sorted_r = _megakernel_sorter(keys.shape[0], False)(keys)
    else:
        sorted_r = jax.jit(jnp.sort)(keys)
    hist, ksum, max_part = _msb_stats(sorted_r, bits)
    return sorted_r, hist, ksum, max_part


@jax.jit
def _probe(sorted_r: jax.Array, skeys: jax.Array):
    # equal keys ⇔ equal partitions+slots under MSB digits, so the count
    # runs on raw keys — no (digit << 32 | key) composite needed
    return probe.probe_sorted(sorted_r, skeys)


def _multipass_radix_join(r: Relation, s: Optional[Relation],
                          cfg: JoinConfig) -> JoinMetrics:
    """The REAL multi-pass fanout-bounded partition engine
    (ops/pallas/radix_kernels.py): radix_bits/radix_passes change
    execution.  Partition → final tile sort (the per-partition build,
    bucket_chaining_join analog) → banded probe.  Timed per phase like
    the reference's partition/build/probe split
    (mc/src/parallel_radix_join.c:1124-1146)."""
    import time

    import numpy as np

    from ..ops.pallas.radix_kernels import (multipass_radix_partition,
                                            plan_passes)
    from .common import _max_key_bound, keys_unique_both
    from .pallas_backend import (banded_probe, banded_build_from_sorted,
                                 BandedBuild, DEFAULT_TILE)
    from ..ops.pallas.join_kernels import LANES, MAXI32, call_with_big_stack
    from ..ops.pallas.join_kernels import _sort_tiles_jit

    interpret = jax.default_backend() == "cpu"
    tile = DEFAULT_TILE if cfg.r_size >= (1 << 17) else 1024
    key_bits = max(1, int(_max_key_bound(cfg)).bit_length())
    t0 = time.perf_counter()
    part = multipass_radix_partition(r.keys, radix_bits=cfg.radix_bits,
                                     passes=cfg.radix_passes,
                                     key_bits=key_bits, tile=tile,
                                     interpret=interpret)
    # fence: partition phase timed separately (reference prints partition
    # vs join-phase cycles, parallel_radix_join.c:1124-1146)
    np.asarray(part.partitioned2d[:1, :1])
    t1 = time.perf_counter()
    # per-partition build: a tile sort of the value-partitioned stream IS
    # every partition's search structure (partitions are value-contiguous)
    sorted2d, stats = call_with_big_stack(
        _sort_tiles_jit, part.partitioned2d, tile=tile, method="bitonic",
        interpret=interpret)
    build = BandedBuild(sorted2d, stats[:, 0], stats[:, 1], tile,
                        part.n, 0, False)
    in_sum = int(jnp.sum(jnp.where(r.keys == MAXI32, 0, r.keys)
                         .astype(jnp.int64)))
    out_sum = int(jnp.sum(jnp.where(sorted2d == MAXI32, 0, sorted2d)
                          .astype(jnp.int64), dtype=jnp.int64))
    t2 = time.perf_counter()
    matches = None
    skeys = s.keys if (s is not None and cfg.enable_probe) else None
    if skeys is not None:
        s2d = None
        if not s.assume_sorted:
            from .pallas_backend import sort_probe_side
            skeys, s2d = sort_probe_side(skeys, tile=tile,
                                         interpret=interpret)
        matches, _overflow = banded_probe(build, skeys, s2d=s2d,
                                          interpret=interpret)
    t3 = time.perf_counter()
    m = JoinMetrics(algo="radix", rSize=cfg.r_size,
                    transactionSize=cfg.transaction_size,
                    probeLength=cfg.probe_length,
                    inputSum=in_sum, outputSum=out_sum)
    m.partitionTimeInMicroseconds = (t1 - t0) * 1e6
    m.hashBuildTimeInMicroseconds = (t2 - t0) * 1e6
    if matches is not None:
        m.totalMatches = matches
        m.probeTimeInMicroseconds = (t3 - t2) * 1e6
    m.extra["backend"] = "pallas_multipass_radix"
    m.extra["radixBits"] = cfg.radix_bits
    m.extra["numPasses"] = len(part.pass_plans)
    m.extra["passBits"] = [p.bits for p in part.pass_plans]
    m.extra["passShifts"] = [p.shift for p in part.pass_plans]
    hist_last = part.pass_hists[-1]
    m.extra["fanout"] = 1 << cfg.radix_bits
    m.extra["maxRunSize"] = int(jnp.max(hist_last))
    if m.rSize:
        m.failedTransactionPercentage = 0.0
        m.totalFailedPercentage = 0.0
    return m


def radix_join(r: Relation, s: Optional[Relation] = None,
               cfg: JoinConfig = JoinConfig()) -> JoinMetrics:
    """Radix join with cfg.radix_bits total fanout bits (NUM_RADIX_BITS=14,
    mc/src/prj_params.h:15-22), MSB digit convention (Wisconsin's
    RadixPartitioner, partitioner.cpp:443-520).  Hash-bit partitioning for
    placement lives in the distributed engine (murmur32 all_to_all routing).

    radix_strategy='multipass' runs the real fanout-bounded multi-pass
    histogram/prefix/scatter engine; 'sort'/'auto' run the global-sort plan
    (partitioning subsumed by one bitonic megakernel sort — measured faster
    on v5e, crossover notes in ops/pallas/radix_kernels.py)."""
    if cfg.radix_strategy == "multipass" and cfg.backend != "xla":
        from .common import _max_key_bound
        # probing packs key*4+tag into int32 (PACK_LIMIT) — wider keys fall
        # back to the XLA path below; build-only partitions any int32
        if (s is None or not cfg.enable_probe
                or _max_key_bound(cfg) < (1 << 29)):
            return _multipass_radix_join(r, s, cfg)
    if use_pallas_engine(cfg, s):
        import time

        from .pallas_backend import DEFAULT_TILE, banded_join_pipelined

        from .common import (BandedPlan, keys_unique_both,
                             maybe_pipeline_timing)

        interpret = jax.default_backend() == "cpu"
        # The global sort exists ONLY to keep every tile's S band narrow.
        # A probe side that fits inside one tile (the reference's own
        # PRO benchmark shape: --s-size=2, motivation.sh:11) bounds every
        # band by |S| regardless of R's order — tile-local sorted runs
        # (the partition artifact, same contract as the build-only plans)
        # are exact there at ~40% of the global sort's cost.
        presort = (s.keys.shape[0] > DEFAULT_TILE)
        t0 = time.perf_counter()
        out = banded_join_pipelined(r.keys, s.keys, presort=presort,
                                    sort_s=not s.assume_sorted,
                                    unique_both=keys_unique_both(cfg),
                                    interpret=interpret)
        elapsed_us = (time.perf_counter() - t0) * 1e6
        plan = BandedPlan(None, presort, False, None)
        m = pallas_metrics(cfg, "radix", out, elapsed_us, out.matches,
                           plan=plan, sort_s=not s.assume_sorted)
        m.partitionTimeInMicroseconds = elapsed_us
        m.extra["radixBits"] = cfg.radix_bits
        m.extra["numPasses"] = cfg.radix_passes
        maybe_pipeline_timing(m, cfg, plan, r, s, out, interpret)
        return m
    rkeys, skeys = resolve_relations(r, s, cfg)
    use_mk = (cfg.backend != "xla" and jax.default_backend() != "cpu"
              and rkeys.shape[0] >= (1 << 17))
    timer = PhaseTimer()
    sorted_r, hist, in_sum, max_part = timer.timed(
        "build", _partition_build, rkeys, cfg.radix_bits, use_mk)
    matches = None
    if skeys is not None:
        matches = int(timer.timed("probe", _probe, sorted_r, skeys))
    single_us = None
    if cfg.pipeline_depth > 1 and skeys is None:
        # sustained-throughput shape for the build-only partition rows
        # (the reference PRO benchmark, --s-size=2/no probe): enqueue K
        # partition passes, fence once — the ~25 ms tunnel fence otherwise
        # dominates the 130 ms partition itself
        import time

        import numpy as np
        t0 = time.perf_counter()
        for _ in range(cfg.pipeline_depth):
            res = _partition_build(rkeys, cfg.radix_bits, use_mk)
        np.asarray(res[2])              # ONE fence for the batch
        per_point = (time.perf_counter() - t0) * 1e6 / cfg.pipeline_depth
        single_us = timer.micros.get("build", 0.0)
        timer.micros["build"] = per_point
    m = JoinMetrics(algo="radix", rSize=cfg.r_size,
                    transactionSize=cfg.transaction_size,
                    probeLength=cfg.probe_length,
                    inputSum=int(in_sum), outputSum=int(in_sum))
    if single_us is not None:
        m.extra["singleRunTimeInMicroseconds"] = single_us
        m.extra["pipelineDepth"] = cfg.pipeline_depth
    m.partitionTimeInMicroseconds = timer.micros.get("build", 0.0)
    m.extra["radixBits"] = cfg.radix_bits
    m.extra["numPasses"] = cfg.radix_passes
    m.extra["fanout"] = 1 << cfg.radix_bits
    m.extra["maxPartitionSize"] = int(max_part)
    avg = max(1, cfg.r_size >> cfg.radix_bits)
    m.extra["skewedPartitions"] = int(jnp.sum(hist > 4 * avg))
    return finish_metrics(m, timer, matches)
