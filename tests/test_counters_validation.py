"""Counters-model validation evidence (VERDICT r3 #4): the committed
model-vs-measured table (experiments/results_counters_r4/validation.json,
produced on the real chip by experiments/r4_counters_validation.py) must
stay within the stated tolerances — the 'exact by construction' traffic
claim now has measured device-trace data behind it."""

import json
import os

import pytest

PATH = os.path.join(os.path.dirname(__file__), "..", "experiments",
                    "results_counters_r4", "validation.json")


@pytest.fixture(scope="module")
def payload():
    if not os.path.exists(PATH):
        pytest.skip("validation evidence not generated yet")
    with open(PATH) as f:
        return json.load(f)


def test_no_family_implies_impossible_bandwidth(payload):
    """Overcount bound: modeled bytes / measured device time must not
    exceed the chip's measured streaming roofline."""
    roof = payload["rooflineGBps"]
    assert roof > 50  # sanity: the anchor streams at a real HBM rate
    for r in payload["rows"]:
        if r["impliedGBps"] is not None:
            assert r["impliedGBps"] <= roof * 1.15, r


def test_dma_bound_families_reach_roofline_fraction(payload):
    """Undercount bound: a streaming (DMA-bound) kernel whose model said
    far fewer bytes than it moved would imply implausibly low bandwidth."""
    for r in payload["rows"]:
        if r["impliedGBps"] is not None and r["dmaBound"]:
            assert r["rooflineFrac"] >= 0.2, r


def test_pass_counts_match_kernel_structure(payload):
    """The model's pass counts are derived from GSORT structure — the
    committed evidence must agree with the current code's pass formula."""
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
