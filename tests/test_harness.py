"""Tests for the experiment harness (experiments/*.sh + runner.sh analogs)."""

import json
import os

import pytest

from htm_hashjoin_tpu.harness import GRIDS, RUNNER_ORDER, run_config, run_grid
from htm_hashjoin_tpu.config import Algo, Distribution


def test_grid_registry_covers_reference_scripts():
    expected = {"AtomicsVsHTMVsNoCC", "SizeToAbortsAndTimeSorted",
                "SizeToAbortsAndTimeShuffled", "TSizeAndShuffleWindowstoTime",
                "adaptive", "adaptive2", "motivation", "probe", "track",
                "skewprobe"}
    assert set(GRIDS) == expected
    assert set(RUNNER_ORDER) <= expected
    # skewprobe: 3 algos × 5 zipf params, all probing an unsorted zipf S
    pts = list(GRIDS["skewprobe"](12))
    assert len(pts) == 15
    assert all(p.s_distr == Distribution.ZIPF and p.enable_probe
               for p in pts)


def test_grid_shapes_match_reference_sweeps():
    # AtomicsVsHTMVsNoCC: 3 algos × 2 dists (AtomicsVsHTMVsNoCC.sh)
    pts = list(GRIDS["AtomicsVsHTMVsNoCC"](20))
    assert len(pts) == 6
    assert {p.algo for p in pts} == {Algo.NOCC, Algo.ATOMIC, Algo.HTM}
    # tSize sweep 2^0..2^12 (SizeToAbortsAndTimeSorted.sh)
    pts = list(GRIDS["SizeToAbortsAndTimeSorted"](20))
    assert [p.transaction_size for p in pts] == [1 << i for i in range(13)]
    # 6 tSizes × (scale+1) windows (TSizeAndShuffleWindowstoTime.sh)
    pts = list(GRIDS["TSizeAndShuffleWindowstoTime"](10))
    assert len(pts) == 6 * 11
    # motivation: radix sweep + 3 build sweeps (motivation.sh)
    pts = list(GRIDS["motivation"](10))
    assert len(pts) == 4 * 11
    assert pts[0].algo == Algo.RADIX and pts[0].s_size == 2
    # probe grid has probing enabled, others (build-only) do not
    assert all(p.enable_probe for p in GRIDS["probe"](10))
    assert not any(p.enable_probe for p in GRIDS["adaptive"](10))


def test_run_config_json_contract():
    cfg = next(iter(GRIDS["AtomicsVsHTMVsNoCC"](12)))
    line = run_config(cfg)
    d = json.loads(line)
    assert d["algo"] == "nocc"
    assert d["rSize"] == 4096
    assert "hashBuildTimeInMicroseconds" in d
    assert d["inputSum"] == 4096 * 4097 // 2


@pytest.mark.parametrize("name,scale", [("AtomicsVsHTMVsNoCC", 12),
                                        ("adaptive2", 6),
                                        ("track", 5)])
def test_run_grid_writes_logs(name, scale, tmp_path):
    lines = run_grid(name, scale=scale, reps=2, out_dir=str(tmp_path),
                     echo=False)
    expected_points = len(list(GRIDS[name](scale)))
    assert len(lines) == expected_points
    for rep in (1, 2):
        log = tmp_path / f"{name}_log{rep}"
        assert log.exists()
        file_lines = log.read_text().strip().split("\n")
        assert len(file_lines) == expected_points
        for ln in file_lines:
            d = json.loads(ln)
            assert d["inputSum"] == d["outputSum"]  # conservation oracle


def test_track_grid_emits_failure_stats():
    cfg = next(iter(GRIDS["track"](6)))
    d = json.loads(run_config(cfg))
    assert cfg.track
    assert "failedTransactions" in d


def test_wrapper_scripts_exist():
    d = os.path.join(os.path.dirname(__file__), "..", "experiments")
    for name in list(GRIDS) + ["runner"]:
        path = os.path.join(d, f"{name}.sh")
        assert os.path.exists(path), path
        assert os.access(path, os.X_OK)
