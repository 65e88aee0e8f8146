"""Sort-merge join.

Reference: SortMerge.cpp:8-70 — 64-way partitioned parallel timsort, a final
global timsort pass (exploits near-sortedness), then a partitioned two-pointer
merge with branch-free match counting.  TPU-native: one fused `jax.lax.sort`
(XLA bitonic pipeline) + vectorized binary-search merge counting
(ops/sortops.py).  Reports sortTime / mergeTime / total like the reference
(SortMerge.cpp:50-69).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Distribution, JoinConfig
from ..relation import Relation
from ..ops import sortops
from ..utils.metrics import JoinMetrics
from ..utils.timing import PhaseTimer
from .common import (finish_metrics, pallas_metrics, resolve_relations,
                     use_pallas_engine)


@jax.jit
def _sort(keys: jax.Array):
    s = jnp.sort(keys)
    return s, jnp.sum(s.astype(jnp.int64))


@jax.jit
def _merge(sorted_r: jax.Array, sorted_s: jax.Array):
    return sortops.merge_count(sorted_r, sorted_s)


def sortmerge_join(r: Relation, s: Optional[Relation] = None,
                   cfg: JoinConfig = JoinConfig()) -> JoinMetrics:
    if use_pallas_engine(cfg, s):
        # sort-merge IS the presort banded plan: global sort + banded
        # merge-count megakernel (the two-pointer merge of SortMerge.cpp:22-36
        # as an in-VMEM bitonic merge).  The reference reports sortTime and
        # mergeTime as separate host-fenced phases (SortMerge.cpp:50-69), so
        # this path — alone among the banded plans — pays TWO fences: one
        # after the sort megakernels, one after the count.
        import time

        import numpy as np

        from .pallas_backend import (banded_join_pipelined, to_tiles_2d,
                                     to_tiles_2d_pow2, prepare_probe_side,
                                     sort_probe_side)
        from .common import keys_unique_both

        interpret = jax.default_backend() == "cpu"
        sorted_in = cfg.data_distr == Distribution.SORTED
        t0 = time.perf_counter()
        # sorted input skips the sort outright — the analog of timsort's
        # O(n) pass on sorted runs the reference leans on (SortMerge.cpp:18)
        if sorted_in:
            r_sorted = r.keys
        else:
            from ..ops.pallas.join_kernels import global_sort_tiles
            r2d = global_sort_tiles(to_tiles_2d_pow2(r.keys, 65536),
                                    interpret=interpret)
            r_sorted = r2d.reshape(-1)[: r.keys.shape[0]]
        if s.assume_sorted:
            skeys_sorted, s2d = s.keys, None
        else:
            skeys_sorted, s2d = sort_probe_side(s.keys, interpret=interpret)
        # phase fence: a one-element readback drains the sort megakernels
        # (block_until_ready does not fence on this platform)
        int(np.asarray(r_sorted[:1])[0])
        if s2d is not None:
            int(np.asarray(s2d[:1, :1])[0, 0])
        sort_us = (time.perf_counter() - t0) * 1e6
        t1 = time.perf_counter()
        out = banded_join_pipelined(r_sorted, skeys_sorted, presorted=True,
                                    unique_both=keys_unique_both(cfg),
                                    s2d=s2d, interpret=interpret)
        merge_us = (time.perf_counter() - t1) * 1e6
        from .common import BandedPlan
        m = pallas_metrics(cfg, "sortmerge", out, sort_us + merge_us,
                           out.matches,
                           plan=BandedPlan(None, not sorted_in, sorted_in,
                                           None),
                           sort_s=not s.assume_sorted)
        m.sortTimeInMicroseconds = sort_us
        m.mergeTimeInMicroseconds = merge_us
        m.probeTimeInMicroseconds = merge_us
        return m
    rkeys, skeys = resolve_relations(r, s, cfg)
    timer = PhaseTimer()
    sorted_r, in_sum = timer.timed("sort", _sort, rkeys)
    matches = None
    if skeys is not None:
        # the driver supplies S pre-sorted except for the `random` distribution
        # (main.cpp:89-97); sort defensively unless provably sorted.
        if cfg.data_distr not in (Distribution.SORTED,):
            skeys, _ = timer.timed("sort", _sort, skeys)
        matches = int(timer.timed("merge", _merge, sorted_r, skeys))
    m = JoinMetrics(algo="sortmerge", rSize=cfg.r_size,
                    transactionSize=cfg.transaction_size,
                    inputSum=int(in_sum), outputSum=int(in_sum))
    m.sortTimeInMicroseconds = timer.micros.get("sort", 0.0)
    m.mergeTimeInMicroseconds = timer.micros.get("merge", 0.0)
    m.hashBuildTimeInMicroseconds = timer.total()
    if matches is not None:
        m.totalMatches = matches
        m.probeTimeInMicroseconds = m.mergeTimeInMicroseconds
    if m.rSize:
        m.failedTransactionPercentage = 0.0
    return m
