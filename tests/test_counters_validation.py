"""Counters-model validation evidence (VERDICT r3 #4, re-anchored r5): the
committed model-vs-measured table
(experiments/results_counters_r5/validation.json, produced on the real chip
by experiments/r5_counters_validation.py) must stay within the stated
tolerances.  Round 5 anchors the overcount bound to the CHIP's measured
HBM copy roofline (not the engine's own kernel) and fixes the r4 trace
accounting that double-counted program + nested-op spans."""

import json
import os

import pytest

PATH = os.path.join(os.path.dirname(__file__), "..", "experiments",
                    "results_counters_r5", "validation.json")


@pytest.fixture(scope="module")
def payload():
    if not os.path.exists(PATH):
        pytest.skip("validation evidence not generated yet")
    with open(PATH) as f:
        return json.load(f)


def test_chip_roofline_is_a_real_hbm_rate(payload):
    """The anchor is a measured device copy: it must sit in the plausible
    HBM band for this chip (v5e spec ~810 GB/s; the measured d2d copy
    lands at a large fraction of it), and the engine streaming anchor must
    be BELOW it (an engine kernel cannot out-stream a bare copy)."""
    assert 300 < payload["rooflineGBps"] < 1000
    assert payload["engineStreamGBps"] < payload["rooflineGBps"] * 1.1


def test_no_family_implies_impossible_bandwidth(payload):
    """Overcount bound: modeled bytes / measured device time must not
    exceed the chip's measured copy roofline."""
    roof = payload["rooflineGBps"]
    for r in payload["rows"]:
        if r["impliedGBps"] is not None:
            assert r["impliedGBps"] <= roof * 1.1, r


def test_dma_bound_families_reach_engine_fraction(payload):
    """Undercount bound: a streaming (DMA-bound) engine kernel whose model
    said far fewer bytes than it moved would imply implausibly low
    bandwidth — each must reach >= 20% of the engine streaming anchor."""
    for r in payload["rows"]:
        if (r["impliedGBps"] is not None and r["dmaBound"]
                and r.get("engineFrac") is not None):
            assert r["engineFrac"] >= 0.2, r


def test_pass_counts_match_kernel_structure(payload):
    """The model's pass counts are derived from GSORT structure — the
    committed evidence must agree with the current code's pass formula
    (phase-A-aware since ADVICE r4 #3)."""
    import re

    from htm_hashjoin_tpu.joins.common import _gsort_pass_count
    n, tile = payload["n"], payload["tile"]
    for r in payload["rows"]:
        m = re.search(r"global sort \((\d+) passes\)", r["family"])
        if m:
            assert int(m.group(1)) == _gsort_pass_count(n, tile)
        m = re.search(r"tagged count \((\d+) passes", r["family"])
        if m:
            assert int(m.group(1)) == _gsort_pass_count(2 * n, tile)


def test_testbed_number_committed(payload):
    """VERDICT r4 missing #2: the TestBed HBM number is committed evidence,
    not just a fixture.  The wall-clock chained figure sits BELOW the
    traced device roofline (each back-to-back program launch pays a
    ~1.6 ms scheduling gap on this platform — measured r5; invisible in
    device-op spans, real in wall time) but must stay the same order."""
    tb_path = os.path.join(os.path.dirname(PATH), "testbed.json")
    assert os.path.exists(tb_path)
    with open(tb_path) as f:
        tb = json.load(f)
    assert tb["elems"] == 1 << 27
    assert tb["gbps"] <= payload["rooflineGBps"] * 1.1
    assert tb["gbps"] >= 0.25 * payload["rooflineGBps"]
