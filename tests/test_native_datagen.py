"""Native C++ generator (native/datagen.cpp) invariants — mirrors the JAX
generator contract.  Skipped when the library is not built
(`make -C native`)."""

import numpy as np
import pytest

from htm_hashjoin_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libhtmdatagen.so not built")

N = 1 << 16


def test_sorted():
    assert (native.sorted_keys(N) == np.arange(1, N + 1)).all()


def test_shuffled_permutation_and_determinism():
    a = native.shuffled_keys(N, 7)
    assert (np.sort(a) == np.arange(1, N + 1)).all()
    assert (a == native.shuffled_keys(N, 7)).all()
    assert not (a == native.shuffled_keys(N, 8)).all()


def test_local_shuffle_locality():
    """Reference swap semantics (generator.c:95-110): displacement is
    window-scale (chained swaps produce a small tail beyond the window —
    faithful to the reference, unlike the strict-bounded JAX variant)."""
    w = 64
    a = native.local_shuffled_keys(N, w, 3)
    assert (np.sort(a) == np.arange(1, N + 1)).all()
    disp = np.abs(a - np.arange(1, N + 1))
    assert np.median(disp) <= w
    assert disp.max() < 50 * w  # tail is bounded in practice


def test_uniform_range():
    a = native.uniform_keys(N, 1000, 16, 0)
    assert a.min() >= 1 and a.max() <= 1000


def test_fk_multiplicity():
    f = native.fk_from_pk_keys(4 * 1024, 1024, 5)
    vals, cnt = np.unique(f, return_counts=True)
    assert (vals == np.arange(1, 1025)).all()
    assert (cnt == 4).all()


def test_zipf_skew():
    z = native.zipf_keys(N, 1 << 10, 1.1, 1)
    assert z.min() >= 1 and z.max() <= 1 << 10
    assert np.bincount(z).max() > 20 * N / (1 << 10)


def test_checksum():
    a = native.shuffled_keys(N, 0)
    assert native.checksum(a) == N * (N + 1) // 2
