"""HTM_ADAPT dial measurement: adaptive vs both fixed plans (VERDICT r2
task 6 done-criterion — 'a workload where the adaptive run measurably
beats both fixed plans').

Workload: local_shuffle data with a SMALL true window whose config
declares a LARGE window (the reference's adaptive.sh situation: the
binary's tSize does not match the data's locality).  Plans compared:

  fixed-declared — pallas_plan under the (wrong) declared window: the
                   exact wide-band/sort path,
  fixed-cheap    — the optimistic sorter sized for a GUESSED tiny window
                   smaller than the data's (violations → bitonic retry:
                   the mispredicted-tSize cost),
  adaptive       — sample displacement profile picks the just-right
                   sorter (joins/htm._adaptive_pallas_plan).

Run on the TPU chip:  python experiments/adaptive_dial_bench.py
Writes experiments/results_tpu27r3/adaptive_dial_log (one JSON line per
plan per rep) and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log2n", type=int, default=26)
    p.add_argument("--window", type=int, default=64,
                   help="the data's TRUE locality window")
    p.add_argument("--declared", type=int, default=1 << 20,
                   help="the window the config (wrongly) declares")
    p.add_argument("--cheapWindow", type=int, default=4,
                   help="the fixed-cheap plan's undersized guess")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out",
                   default="experiments/results_tpu27r3/adaptive_dial_log")
    a = p.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from htm_hashjoin_tpu.config import Algo, Distribution, JoinConfig
    from htm_hashjoin_tpu.data.generators import build_relations
    from htm_hashjoin_tpu.joins.htm import htm_join

    n = 1 << a.log2n
    cfg0 = JoinConfig(algo=Algo.HTM, r_size=n,
                      data_distr=Distribution.LOCAL_SHUFFLE,
                      shuffle_range=a.window, enable_probe=True)
    r, s = build_relations(cfg0)
    np.asarray(r.keys[:1]), np.asarray(s.keys[:1])

    plans = {
        # declared window lies upward -> exact wide/sort path
        "fixed-declared": dataclasses.replace(cfg0,
                                              shuffle_range=a.declared),
        # declared window lies downward -> optimistic sorter too small,
        # violations force the bitonic retry
        "fixed-cheap": dataclasses.replace(cfg0,
                                           shuffle_range=a.cheapWindow),
        # adaptive measures the data and ignores the declared window
        "adaptive": dataclasses.replace(cfg0, shuffle_range=a.declared,
                                        adaptive=True),
    }
    lines = []
    for name, cfg in plans.items():
        best = None
        for i in range(a.reps):
            t0 = time.perf_counter()
            m = htm_join(r, s, cfg)
            us = (time.perf_counter() - t0) * 1e6
            assert m.totalMatches == n, (name, m.totalMatches)
            rec = {"plan": name, "rep": i, "timeUs": us,
                   "engineTimeUs": m.hashBuildTimeInMicroseconds,
                   "resorted": m.extra.get("resorted"),
                   "adaptivePlan": m.extra.get("adaptivePlan")}
            lines.append(rec)
            print(json.dumps(rec), flush=True)
            best = us if best is None else min(best, us)
        print(f"# {name}: best {best/1e3:.1f} ms", flush=True)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
