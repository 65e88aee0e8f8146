"""Targeted θ-sweep check (VERDICT r4 next-step #7): htm adaptive-engine
join of a 2^27 PK build against an unsorted zipf S, warm medians — the
fast feedback loop for the skew-repair cost cuts (fence folds + fused
pass chains) without re-running the full 15-point skewprobe grid."""

import sys, os  # noqa: E401
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import json
import time
from statistics import median

import jax.numpy as jnp
import numpy as np

from htm_hashjoin_tpu.config import Algo, Distribution, JoinConfig
from htm_hashjoin_tpu.data.generators import build_relations
from htm_hashjoin_tpu.joins import DISPATCH
from htm_hashjoin_tpu.utils.timing import fence_outputs


def main() -> int:
    thetas = [float(x) for x in (sys.argv[1:] or ["0.75", "1.0", "1.25"])]
    n = 1 << 27
    for z in thetas:
        cfg = JoinConfig(algo=Algo.HTM, r_size=n, transaction_size=16,
                         probe_length=4, data_distr=Distribution.PK,
                         s_distr=Distribution.ZIPF, zipf_param=z,
                         retry=True, enable_probe=True)
        r, s = build_relations(cfg)
        fence_outputs((r.keys, s.keys))
        times = []
        m = None
        for rep in range(4):
            t0 = time.perf_counter()
            m = DISPATCH[cfg.algo.value](r, s, cfg)
            times.append(time.perf_counter() - t0)
        med = median(times[1:])
        print(json.dumps({
            "zipf": z, "medianWarmMs": round(med * 1e3, 1),
            "mtuplesPerSec": round(n / med / 1e6, 1),
            "matches": m.totalMatches,
            "failedPct": m.totalFailedPercentage,
            "conserved": m.inputSum == m.outputSum,
            "reps": [round(t * 1e3, 1) for t in times]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
