"""NoCC join: unsynchronized last-writer-wins build.

Reference: NoCCHashBuild.hpp:13-151 — the upper-bound-throughput baseline
whose races silently lose tuples (observable as outputSum < inputSum,
experiments/new_backup/AtomicsVsHTMVsNoCC_log1:1).  The TPU-native
formulation is a single plain scatter: XLA scatter with duplicate indices is
last-writer-wins, which is *exactly* the racy-store semantics — no kernel
trickery required (SURVEY.md §2.4 P5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import JoinConfig
from ..relation import Relation
from ..ops import insert, probe
from ..ops.hashing import identity_hash
from ..utils.metrics import JoinMetrics
from ..utils.timing import PhaseTimer
from .common import (finish_metrics, pallas_unique_join, resolve_relations,
                     route_unique_pallas, table_size_for)


@functools.partial(jax.jit, static_argnums=(1,))
def _build(keys: jax.Array, table_size: int):
    table = insert.nocc_scatter(keys, table_size, identity_hash)
    return table, probe.table_sum(table), jnp.sum(keys.astype(jnp.int64))


@functools.partial(jax.jit, static_argnums=(2,))
def _probe(table: jax.Array, skeys: jax.Array, probe_length: int):
    return probe.probe_open_addressing(table, skeys, probe_length, identity_hash)


def nocc_join(r: Relation, s: Optional[Relation] = None,
              cfg: JoinConfig = JoinConfig()) -> JoinMetrics:
    if route_unique_pallas(cfg, s):
        return pallas_unique_join("nocc", r, s, cfg)
    rkeys, skeys = resolve_relations(r, s, cfg)
    timer = PhaseTimer()
    table, out_sum, in_sum = timer.timed("build", _build, rkeys, table_size_for(cfg))
    matches = None
    if skeys is not None:
        matches = int(timer.timed("probe", _probe, table, skeys, cfg.probe_length))
    m = JoinMetrics(algo="nocc", rSize=cfg.r_size,
                    transactionSize=cfg.transaction_size,
                    probeLength=cfg.probe_length,
                    inputSum=int(in_sum), outputSum=int(out_sum))
    return finish_metrics(m, timer, matches)
