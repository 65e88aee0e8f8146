"""Generator invariants (SURVEY.md §4 oracle 3: deterministic seeds;
reference DataGen.hpp / mc/src/generator.c semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from htm_hashjoin_tpu.config import Distribution, JoinConfig
from htm_hashjoin_tpu.data import generators as g

N = 1 << 12


def test_sorted_is_1_to_n():
    k = np.asarray(g.sorted_keys(N))
    assert (k == np.arange(1, N + 1)).all()


def test_shuffle_is_permutation():
    k = np.sort(np.asarray(g.shuffled_keys(N, seed=0)))
    assert (k == np.arange(1, N + 1)).all()


def test_shuffle_deterministic():
    a = np.asarray(g.shuffled_keys(N, 7))
    b = np.asarray(g.shuffled_keys(N, 7))
    c = np.asarray(g.shuffled_keys(N, 8))
    assert (a == b).all()
    assert not (a == c).all()


@pytest.mark.parametrize("window", [1, 4, 64, 1024])
def test_local_shuffle_bounded_displacement(window):
    """The locality contract: element i lands within `window` of position i
    (DataGen.hpp:96-115)."""
    k = np.asarray(g.local_shuffled_keys(N, window, seed=0))
    assert (np.sort(k) == np.arange(1, N + 1)).all()
    displacement = np.abs(k - np.arange(1, N + 1))
    assert displacement.max() <= window


def test_local_shuffle_actually_shuffles():
    k = np.asarray(g.local_shuffled_keys(N, 64, seed=0))
    assert not (k == np.arange(1, N + 1)).all()


def test_uniform_in_range():
    k = np.asarray(g.uniform_keys(N, 100, 16, seed=0))
    assert k.min() >= 1 and k.max() <= 100


def test_fk_from_pk_exact_multiplicity():
    """Every PK key appears floor/ceil(S/R) times (generator.c:458-491)."""
    s = np.asarray(g.fk_from_pk_keys(3 * N, N, seed=0))
    vals, counts = np.unique(s, return_counts=True)
    assert (vals == np.arange(1, N + 1)).all()
    assert (counts == 3).all()


def test_zipf_skew():
    k = np.asarray(g.zipf_keys(1 << 14, 1 << 10, 1.1, seed=0))
    assert k.min() >= 1 and k.max() <= 1 << 10
    _, counts = np.unique(k, return_counts=True)
    # heavy hitter far above the uniform expectation
    assert counts.max() > 10 * (1 << 14) / (1 << 10)


def test_build_relations_s_sorted():
    cfg = JoinConfig(r_size=N, data_distr=Distribution.SHUFFLE)
    r, s = g.build_relations(cfg)
    sk = np.asarray(s.keys)
    assert (sk == np.arange(1, N + 1)).all()


def test_input_sum_oracle():
    """inputSum for a permutation of 1..N is N(N+1)/2."""
    r, _ = g.build_relations(JoinConfig(r_size=N, data_distr=Distribution.SHUFFLE))
    assert r.key_sum() == N * (N + 1) // 2


@pytest.mark.parametrize("window,n", [(3, 1000), (64, 5000), (100, 4096),
                                      (1024, 5000)])
def test_blocked_jitter_sort_matches_global(window, n):
    """The two-phase blocked stable sort must be bit-identical to the global
    stable sort_key_val it replaces (valid because displacement < window <=
    block/2)."""
    from htm_hashjoin_tpu.data.generators import _jitter_block, _jitter_sort
    vals = jnp.arange(1, n + 1, dtype=jnp.int32)
    block = _jitter_block(window, n)
    got = _jitter_sort(vals, window, 7, salt=2, block=block)
    want = _jitter_sort(vals, window, 7, salt=2, block=None)
    assert block is None or block >= 2 * window
    assert jnp.array_equal(got, want)


def test_jitter_sort_traced_window_one_compile():
    """window/seed are traced: sweeping them must not grow the jit cache."""
    from htm_hashjoin_tpu.data.generators import _jitter_sort
    vals = jnp.arange(1, 2049, dtype=jnp.int32)
    before = _jitter_sort._cache_size()
    for w in (130, 200, 300, 511):
        _jitter_sort(vals, w, w + 1, salt=2, block=2048)
    assert _jitter_sort._cache_size() - before <= 1
