"""Tests for microbenchmarks (TestBed/simple analogs) and relation
persistence (PERSIST_RELATIONS analog)."""

import numpy as np
import jax.numpy as jnp

from htm_hashjoin_tpu.benchmarks import chunk_sweep, memory_bandwidth
from htm_hashjoin_tpu.config import JoinConfig, Distribution
from htm_hashjoin_tpu.data.persist import (cache_key, cached_relation,
                                           load_relation, save_relation)
from htm_hashjoin_tpu.relation import Relation


def test_memory_bandwidth_smoke():
    rep = memory_bandwidth(log2_elems=16, reps=2)
    assert rep["elems"] == 1 << 16
    assert rep["gbps"] > 0
    assert rep["bestTimeUsecs"] > 0


def test_chunk_sweep_locality_low_failures():
    rows = chunk_sweep(log2_n=14, max_log2_chunk=6, shuffle_window=4)
    assert len(rows) == 7
    assert [r["chunkSize"] for r in rows] == [1 << i for i in range(7)]
    # dense unique 1..N keys: optimistic scatter cannot fail
    assert all(r["maxFailureFraction"] == 0.0 for r in rows)


def test_relation_npz_roundtrip(tmp_path):
    rel = Relation(jnp.arange(1, 101, dtype=jnp.int32),
                   jnp.arange(101, 201, dtype=jnp.int32))
    p = str(tmp_path / "rel.npz")
    save_relation(rel, p)
    back = load_relation(p)
    assert np.array_equal(np.asarray(back.keys), np.asarray(rel.keys))
    assert np.array_equal(np.asarray(back.payloads), np.asarray(rel.payloads))


def test_relation_tbl_roundtrip(tmp_path):
    rel = Relation(jnp.array([5, 3, 9], jnp.int32))
    p = str(tmp_path / "rel.tbl")
    save_relation(rel, p)
    assert (tmp_path / "rel.tbl").read_text() == "5|1\n3|2\n9|3\n"
    back = load_relation(p)
    assert list(np.asarray(back.keys)) == [5, 3, 9]


def test_cache_key_stability_and_distinction():
    c1 = JoinConfig(r_size=1024, data_distr=Distribution.SHUFFLE, seed=1)
    c2 = JoinConfig(r_size=1024, data_distr=Distribution.SHUFFLE, seed=2)
    assert cache_key(c1, "r") == cache_key(c1, "r")
    assert cache_key(c1, "r") != cache_key(c2, "r")
    assert cache_key(c1, "r") != cache_key(c1, "s")


def test_cached_relation_read_through(tmp_path):
    cfg = JoinConfig(r_size=256, data_distr=Distribution.SORTED)
    calls = []

    def gen():
        calls.append(1)
        return Relation(jnp.arange(1, 257, dtype=jnp.int32))

    r1 = cached_relation(cfg, "r", str(tmp_path), gen)
    r2 = cached_relation(cfg, "r", str(tmp_path), gen)
    assert len(calls) == 1  # second call hit the cache
    assert np.array_equal(np.asarray(r1.keys), np.asarray(r2.keys))
