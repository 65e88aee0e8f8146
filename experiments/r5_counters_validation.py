"""Counters-model validation, round 5: re-anchored to the CHIP's measured
HBM copy roofline (VERDICT r4 missing #2 / next-step #2).

Round 4 anchored the validation to the engine's own 1-pass streaming
kernel, making rooflineFrac = 1.0 by construction, and its trace
accounting summed BOTH the jit-program span and the ops nested inside it
(every device time ~2x too high).  This script fixes both:

  * device time counts only the top-level ``jit_*`` program spans;
  * the roofline is a measured device-to-device copy (TestBed.cpp:10-38
    analog) traced the same way — 2^27 int32, read+write;
  * the engine's 1-pass streaming kernel is reported as a second row, so
    the gap between "best the engine streams" and "best the chip copies"
    is explicit (the DMA-headroom question), not hidden in the anchor.

Bounds: no family's implied bandwidth may exceed the chip copy roofline
(overcount bound); DMA-bound engine families must reach >= 20% of the
ENGINE streaming anchor (undercount bound — an engine kernel cannot
stream faster than the engine's best streaming kernel, so that anchor is
the right scale for plausibility).

Writes experiments/results_counters_r5/{validation.json, VALIDATION.md,
testbed.json}; tests/test_counters_validation.py asserts the committed
numbers stay within tolerance.
"""

import sys, os  # noqa: E401
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import glob
import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 24
TILE = 65536
OUT_DIR = "experiments/results_counters_r5"


def device_program_micros(trace_dir: str) -> dict:
    """Total device-side durations (µs) of TOP-LEVEL jit program spans from
    the newest trace in dir.  Ops nested inside a program (names like
    'fusion.3', 'copy.1') are excluded — summing both levels double-counts
    (the r4 accounting bug)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"),
                             recursive=True))
    d = json.loads(gzip.open(paths[-1]).read())
    evs = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    durs: dict = {}
    for e in evs:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and str(e.get("name", "")).startswith("jit_")):
            durs[e["name"]] = durs.get(e["name"], 0.0) + float(e["dur"])
    return durs


def traced(label, fn, reps=3):
    """Warm, then trace `reps` runs; returns (device µs per rep, op map)."""
    from htm_hashjoin_tpu.utils.timing import fence_outputs
    out = fn()
    fence_outputs(out)
    tdir = f"/tmp/r5ctrace/{label}"
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    for _ in range(reps):
        out = fn()
    fence_outputs(out)
    jax.profiler.stop_trace()
    ops = device_program_micros(tdir)
    total = sum(v for k, v in ops.items()) / reps
    return total, ops


def main() -> int:
    from htm_hashjoin_tpu.joins.pallas_backend import (to_tiles_2d,
                                                       to_tiles_2d_pow2,
                                                       tagged_count)
    from htm_hashjoin_tpu.joins.common import _gsort_pass_count
    from htm_hashjoin_tpu.ops.pallas.join_kernels import (_sort_tiles_jit,
                                                          call_with_big_stack,
                                                          global_sort_tiles)

    key = jax.random.PRNGKey(0)
    keys = jax.random.permutation(key,
                                  jnp.arange(1, N + 1, dtype=jnp.int32))
    r2d = to_tiles_2d(keys, TILE)
    r2dp = to_tiles_2d_pow2(keys, TILE)
    s_sorted = jnp.sort(keys)
    np.asarray(r2d[:1, :1])

    rows = []

    # CHIP roofline: device-to-device copy of 2^27 int32 (TestBed analog)
    big = jnp.arange(1 << 27, dtype=jnp.int32)
    copy = jax.jit(lambda a: a + 0)
    t_us, _ = traced("chipcopy", lambda: copy(big), reps=5)
    copy_bytes = 2 * 4.0 * big.size
    chip_roof = copy_bytes / (t_us * 1e-6) / 1e9
    rows.append({"family": "CHIP copy roofline (2^27 int32 d2d)",
                 "modelBytes": copy_bytes, "deviceMicros": t_us,
                 "impliedGBps": chip_roof, "chipFrac": 1.0,
                 "engineFrac": None, "dmaBound": True})

    # ENGINE streaming anchor: the 1-pass streaming kernel (oddeven p=1 ≈
    # copy through VMEM + 4 CE stages) — the best the engine streams today
    t_us, _ = traced("anchor", lambda: call_with_big_stack(
        _sort_tiles_jit, r2d, tile=TILE, method="oddeven", passes=1)[0])
    anchor_bytes = 2 * 4.0 * r2d.size
    engine_roof = anchor_bytes / (t_us * 1e-6) / 1e9
    rows.append({"family": "engine stream anchor (oddeven p=1)",
                 "modelBytes": anchor_bytes, "deviceMicros": t_us,
                 "impliedGBps": engine_roof,
                 "chipFrac": engine_roof / chip_roof,
                 "engineFrac": 1.0, "dmaBound": True})

    def add(family, bytes_, t_us, dma):
        g = bytes_ / (t_us * 1e-6) / 1e9
        rows.append({"family": family, "modelBytes": bytes_,
                     "deviceMicros": t_us, "impliedGBps": g,
                     "chipFrac": g / chip_roof,
                     "engineFrac": g / engine_roof, "dmaBound": dma})

    # Tile sort (the build phase model: 2R — one read + one write)
    t_us, _ = traced("tilesort", lambda: call_with_big_stack(
        _sort_tiles_jit, r2d, tile=TILE, method="bitonic")[0])
    add("tile sort (build, bitonic)", 2 * 4.0 * r2d.size, t_us, False)

    # Global sort (the presort model: 2R x pass count — phase-A-aware,
    # ADVICE r4 #3: the model now starts at GSORT_PHASE_A_BITS+1)
    t_us, _ = traced("gsort", lambda: global_sort_tiles(r2dp, tile=TILE))
    passes = _gsort_pass_count(N, TILE)
    add(f"global sort ({passes} passes)", 2 * 4.0 * r2dp.size * passes,
        t_us, True)

    # Tagged count (skew repair: global sort of R||S + segmented scans)
    t_us, _ = traced("taggedcount",
                     lambda: tagged_count(keys, s_sorted, tile=TILE))
    n2 = to_tiles_2d_pow2(jnp.concatenate([keys, s_sorted]), TILE).size
    passes2 = _gsort_pass_count(2 * N, TILE)
    add(f"tagged count ({passes2} passes + scans)",
        2 * 4.0 * n2 * passes2 + 4.0 * n2, t_us, True)

    # XLA phase cross-check (cost-analysis bytes, scale reference)
    from htm_hashjoin_tpu.utils.profiler import cost_analysis
    from htm_hashjoin_tpu.ops import probe as probe_ops
    ca = cost_analysis(jax.jit(probe_ops.probe_sorted), keys, s_sorted)
    rows.append({"family": "XLA probe_sorted (cost-analysis bytes)",
                 "modelBytes": float(ca.get("bytes accessed", 0.0)),
                 "deviceMicros": None, "impliedGBps": None,
                 "chipFrac": None, "engineFrac": None, "dmaBound": False,
                 "note": "counters for XLA phases come from this cost "
                         "model; recorded for scale reference"})

    os.makedirs(OUT_DIR, exist_ok=True)
    payload = {"n": N, "tile": TILE, "rooflineGBps": chip_roof,
               "engineStreamGBps": engine_roof, "rows": rows}
    with open(os.path.join(OUT_DIR, "validation.json"), "w") as f:
        json.dump(payload, f, indent=1)

    from htm_hashjoin_tpu.benchmarks.testbed import memory_bandwidth
    tb = memory_bandwidth(27, 5)
    with open(os.path.join(OUT_DIR, "testbed.json"), "w") as f:
        json.dump(tb, f, indent=1)

    md = ["# Counters model vs measured device traces (round 5)", "",
          f"n = 2^24, tile = {TILE}.  Device time = top-level jit program "
          "spans from jax.profiler traces on the real chip (the r4 "
          "accounting summed program + nested ops, ~2x); model bytes from "
          "joins/common.plan_traffic_bytes components with the phase-A-"
          "aware gsort pass count.", "",
          f"Chip HBM copy roofline: **{chip_roof:.0f} GB/s** (read+write, "
          f"2^27 int32 d2d; wall-clock chained testbed: "
          f"{tb['gbps']:.0f} GB/s — back-to-back program launches pay "
          "a ~1.6 ms scheduling gap, invisible in device-op spans).  "
          "Engine streaming anchor: "
          f"**{engine_roof:.0f} GB/s** = {engine_roof / chip_roof:.0%} of "
          "the chip — the DMA headroom question is now explicit.", "",
          "Bounds: implied GB/s <= chip roofline x1.1 (overcount); "
          "DMA-bound engine families >= 20% of the ENGINE anchor "
          "(undercount).", "",
          "| family | model bytes | device µs | implied GB/s | x chip "
          "| x engine |",
          "| --- | --- | --- | --- | --- | --- |"]
    for r in rows:
        md.append("| {} | {:,} | {} | {} | {} | {} |".format(
            r["family"], int(r["modelBytes"]),
            f"{r['deviceMicros']:,.0f}" if r["deviceMicros"] else "—",
            f"{r['impliedGBps']:.1f}" if r["impliedGBps"] else "—",
            f"{r['chipFrac']:.2f}" if r["chipFrac"] is not None else "—",
            f"{r['engineFrac']:.2f}" if r["engineFrac"] is not None
            else "—"))
    with open(os.path.join(OUT_DIR, "VALIDATION.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))
    for r in rows:
        if r["impliedGBps"] is not None:
            assert r["impliedGBps"] <= chip_roof * 1.1, r
            if r["dmaBound"] and r["engineFrac"] is not None:
                assert r["impliedGBps"] >= 0.2 * engine_roof, r
    print("OK: model within overcount/undercount bounds", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
