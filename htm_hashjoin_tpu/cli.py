"""CLI driver — the main.cpp / mc/src/main.c equivalent.

Flag surface mirrors reference main.cpp:43-71 (defaults main.cpp:78-85) plus
the mc getopt_long flags (mc/src/main.c:492-608) where they add capability
(--sSize, --zipfParam, --nthreads→--meshShape).  Emits one JSON line per run
on stdout, same schema as the reference (HTMHashBuild.hpp:417-449).

Usage:
    python -m htm_hashjoin_tpu.cli --algo htm --rSize $((2**20)) --dataDistr local_shuffle
"""

from __future__ import annotations

import argparse
import sys

from .config import Algo, Distribution, JoinConfig
from .data.generators import build_relations
from .joins import DISPATCH


# mc driver algorithm names (mc/src/main.c:292-301; RJ/PRH/PRHO alias PRO
# in the reference fork) accepted alongside ours
MC_ALGO_ALIASES = {"PRO": "radix", "RJ": "radix", "PRH": "radix",
                   "PRHO": "radix", "NPO": "npo", "NPO_st": "npo_st"}


def parse_args(argv=None):
    """Returns (JoinConfig, (profile_dir, want_throughput))."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algo", default="htm",
                   choices=[a.value for a in Algo] + sorted(MC_ALGO_ALIASES),
                   type=lambda v: MC_ALGO_ALIASES.get(v, v))
    p.add_argument("--rSize", type=int, default=1 << 20)
    p.add_argument("--sSize", type=int, default=None)
    p.add_argument("--transactionSize", type=int, default=16)
    p.add_argument("--probeLength", type=int, default=4)  # NB: reference main.cpp:53-54 bug (wrote dataDistr) not replicated
    p.add_argument("--dataDistr", default="sorted",
                   choices=[d.value for d in Distribution])
    p.add_argument("--shuffleRange", type=int, default=16)
    p.add_argument("--scaleOutput", type=int, default=2)
    p.add_argument("--numPartitions", type=int, default=64)
    p.add_argument("--distinctKeys", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--zipfParam", type=float, default=0.75)
    p.add_argument("--radixBits", type=int, default=14)
    p.add_argument("--radixPasses", type=int, default=2)
    p.add_argument("--noProbe", action="store_true",
                   help="build-only (ENABLE_PROBE off)")
    p.add_argument("--noRetry", action="store_true",
                   help="skip failed-insert repair (noretry binary variant)")
    p.add_argument("--track", action="store_true",
                   help="per-chunk failure histograms (TM_TRACK)")
    p.add_argument("--adaptive", action="store_true",
                   help="adaptive chunk-size stats (HTM_ADAPTIVE)")
    p.add_argument("--skewHandling", action="store_true")
    p.add_argument("--meshShape", type=str, default="",
                   help="comma-separated mesh, e.g. '8' for 8-way data parallel")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="kernel backend (auto = banded Pallas engine on TPU "
                        "when the plan qualifies)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run (the PCM "
                        "dump analog, SURVEY.md §5)")
    p.add_argument("--throughput", action="store_true",
                   help="also print the ns/tuple report (mc print_timing "
                        "analog, no_partitioning_join.c:313-333)")
    a = p.parse_args(argv)
    cfg = JoinConfig(
        algo=Algo(a.algo), r_size=a.rSize, s_size=a.sSize,
        transaction_size=a.transactionSize, probe_length=a.probeLength,
        data_distr=Distribution(a.dataDistr), shuffle_range=a.shuffleRange,
        scale_output=a.scaleOutput, num_partitions=a.numPartitions,
        distinct_keys=a.distinctKeys, seed=a.seed, zipf_param=a.zipfParam,
        radix_bits=a.radixBits, radix_passes=a.radixPasses,
        enable_probe=not a.noProbe, retry=not a.noRetry, track=a.track,
        adaptive=a.adaptive, skew_handling=a.skewHandling,
        mesh_shape=tuple(int(x) for x in a.meshShape.split(",") if x),
        backend=a.backend,
    )
    return cfg, (a.profile, a.throughput)


def main(argv=None) -> int:
    import contextlib
    import json

    cfg, (profile_dir, want_throughput) = parse_args(argv)
    r, s = build_relations(cfg)
    r.fence(), s.fence()   # generation is NOT part of the timed join phases
    ctx = contextlib.nullcontext()
    if profile_dir:
        from .utils.profiler import trace
        ctx = trace(profile_dir)
    with ctx:
        if cfg.mesh_shape:
            from .parallel.dist_join import distributed_join
            metrics = distributed_join(r, s, cfg)
        else:
            metrics = DISPATCH[cfg.algo.value](r, s, cfg)
    print(metrics.to_json_line())
    if want_throughput:
        from .utils.profiler import throughput_report
        total = metrics.hashBuildTimeInMicroseconds + (
            metrics.probeTimeInMicroseconds or 0.0)
        n = cfg.r_size + (cfg.s_size if metrics.probeTimeInMicroseconds else 0)
        print(json.dumps(throughput_report(n, total)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
