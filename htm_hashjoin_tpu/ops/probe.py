"""Probe-phase primitives: vectorized gathers and sorted binary search.

The reference probes are serial loops per probe tuple — linear scans over
open-addressing slots (AtomicHashBuild.hpp:69-86), bucket-chain walks
(HTMHashBuild.hpp:288-308, mc/src/no_partitioning_join.c:270-310).  On TPU a
probe is a batch of gathers: locality in the probe keys (the sorted S side of
main.cpp:93) turns these into near-sequential HBM reads, which is the same
locality dividend the paper exploits.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

HashFn = Callable[[jax.Array, int], jax.Array]


def probe_open_addressing(table: jax.Array, skeys: jax.Array,
                          probe_length: int, hash_fn: HashFn) -> jax.Array:
    """Count matches by scanning `probe_length` slots from h
    (AtomicHashBuild.hpp:69-86).  Returns int64 total match count."""
    table_size = table.shape[0]
    mask = table_size - 1
    h = hash_fn(skeys, mask)
    total = jnp.zeros((), jnp.int64)
    # never revisit a slot: scanning more than table_size slots would wrap
    for j in range(min(probe_length, table_size)):
        total += jnp.sum(table[(h + j) & mask] == skeys, dtype=jnp.int64)
    return total


def probe_buckets(table: jax.Array, skeys: jax.Array, slots: int,
                  hash_fn: HashFn) -> jax.Array:
    """Count matches against an S-slot bucket table (HTMHashBuild.hpp:288-308
    without the overflow chain — spilled tuples live in a sorted spill array,
    see probe_sorted)."""
    num_buckets = table.shape[0] // slots
    mask = num_buckets - 1
    bucket = hash_fn(skeys, mask)
    total = jnp.zeros((), jnp.int64)
    for r in range(slots):
        total += jnp.sum(table[bucket * slots + r] == skeys, dtype=jnp.int64)
    return total


def probe_sorted(sorted_keys: jax.Array, skeys: jax.Array) -> jax.Array:
    """Count matches of each probe key in an ascending array via binary-search
    bounds; `method='sort'` turns the search itself into a vectorized sort,
    the TPU-efficient formulation.  Multiset-correct (duplicates on both
    sides multiply)."""
    hi = jnp.searchsorted(sorted_keys, skeys, side="right", method="sort")
    lo = jnp.searchsorted(sorted_keys, skeys, side="left", method="sort")
    return jnp.sum((hi - lo).astype(jnp.int64))


def table_sum(table: jax.Array) -> jax.Array:
    """Σ of keys present in a table (empty slots are 0) — half of the
    outputSum conservation oracle (HTMHashBuild.hpp:322-401)."""
    return jnp.sum(table.astype(jnp.int64))


def masked_sum(keys: jax.Array, mask: jax.Array) -> jax.Array:
    """Σ keys[mask] — conflict/failed-range sum accounting."""
    return jnp.sum(jnp.where(mask, keys, 0).astype(jnp.int64))
