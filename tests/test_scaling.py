"""Scaling-efficiency harness tests (parallel/scaling.py) — the evidence
base for BASELINE.json's >=80%-scaling north star, on the virtual 8-device
CPU mesh (conftest)."""

import json

import numpy as np

from htm_hashjoin_tpu.parallel.scaling import scaling_point, scaling_sweep


def test_scaling_point_phases_and_exactness():
    pt = scaling_point((4,), 1 << 12, 1 << 12, data="uniform", reps=1)
    assert pt["exact"] and pt["matches"] == 1 << 12
    assert pt["exchangeTimeUs"] > 0 and pt["joinTimeUs"] > 0
    assert pt["totalTimeUs"] >= pt["exchangeTimeUs"] + pt["joinTimeUs"]


def test_scaling_point_hierarchical_zipf_repairs():
    # zipf skew on the 2-D mesh: overflow is repaired, matches stay exact
    pt = scaling_point((2, 4), 1 << 13, 1 << 13, data="zipf",
                       zipf_theta=1.2, reps=1)
    assert pt["exact"], pt
    # the phase split surfaces repair cost if and only if repair fired
    assert (pt["repairTimeUs"] > 0) == pt["repairFired"]


def test_scaling_sweep_writes_log(tmp_path):
    out = tmp_path / "scaling_log"
    lines = scaling_sweep(str(out), per_dev_log2=10, strong_log2=12,
                          reps=1, meshes=((1,), (2,), (2, 2)), echo=False)
    logged = [json.loads(l) for l in out.read_text().splitlines()]
    # modes × meshes × data variants (uniform, zipf, zipf+skew)
    assert len(logged) == len(lines) == 2 * 3 * 3
    assert all(p["exact"] for p in logged)
    assert all("efficiency" in p for p in logged)
    modes = {p["mode"] for p in logged}
    assert modes == {"weak", "strong"}
