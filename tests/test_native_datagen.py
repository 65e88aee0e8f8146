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


# ---------------------------------------------------------------------------
# Native .tbl IO (native/tblio.cpp — the loader.cpp counterpart)
# ---------------------------------------------------------------------------

def test_native_tblio_roundtrip(tmp_path):
    from htm_hashjoin_tpu.data import tblio
    if not tblio.available():
        pytest.skip("native tblio not built")
    rng = np.random.default_rng(0)
    data = rng.integers(-2**40, 2**40, size=(10_001, 3), dtype=np.int64)
    p = str(tmp_path / "x.tbl")
    assert tblio.write_tbl(p, data)
    back = tblio.load_tbl(p, 3)
    assert np.array_equal(back, data)


def test_native_tblio_matches_python_loader(tmp_path):
    from htm_hashjoin_tpu.data import tblio
    from htm_hashjoin_tpu.wisconsin import Schema, WriteTable
    if not tblio.available():
        pytest.skip("native tblio not built")
    s = Schema.create(("long", "long"))
    wt = WriteTable(s)
    wt.generate(5000, 5000, 0.0, 9)
    p = str(tmp_path / "t.tbl")
    wt.save(p)
    # native-loaded table equals the generated one
    wt2 = WriteTable(s)
    wt2.load(p)
    assert np.array_equal(np.asarray(wt2.column(1)), np.asarray(wt.column(1)))
    assert np.array_equal(np.asarray(wt2.column(2)), np.asarray(wt.column(2)))
    # and equals a pure-python parse
    rows = [tuple(map(int, ln.split("|")))
            for ln in open(p).read().splitlines() if ln]
    assert np.array_equal(np.asarray(wt2.column(1)),
                          np.array([r[0] for r in rows]))


def test_native_tblio_skips_empty_lines(tmp_path):
    from htm_hashjoin_tpu.data import tblio
    if not tblio.available():
        pytest.skip("native tblio not built")
    p = tmp_path / "gaps.tbl"
    p.write_text("1|2\n\n3|4\n\n\n5|6\n")
    back = tblio.load_tbl(str(p), 2)
    assert np.array_equal(back, np.array([[1, 2], [3, 4], [5, 6]]))
