"""Multi-pass radix partition engine vs the global bitonic sort plan —
the crossover measurement VERDICT r2 task 2 requires (either way).

Both engines produce the same artifact class (a value-partitioned,
per-tile-sorted relation probed by the banded count), so the comparison
is apples-to-apples:

  sort      — global_sort_tiles (bitonic megakernel): 1 tile-sort pass +
              ~L(L+1)/2 grouped cross-tile merge levels (L = log2 tiles),
  multipass — P passes of (tile sort + digit-bound planning + scatter) +
              one final tile sort (ops/pallas/radix_kernels.py).

Writes one JSON line per (engine, log2 n) point:
  {"engine": ..., "log2n": ..., "timeUs": ..., "radixBits": ...}

Run on the TPU chip:  python experiments/radix_crossover.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="experiments/results_tpu27r3/radix_crossover_log")
    p.add_argument("--sizes", default="20,22,24,26,27")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--radixBits", type=int, default=14)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from htm_hashjoin_tpu.data.generators import shuffled_keys
    from htm_hashjoin_tpu.joins.pallas_backend import (DEFAULT_TILE,
                                                       to_tiles_2d_pow2)
    from htm_hashjoin_tpu.ops.pallas.join_kernels import (_sort_tiles_jit,
                                                          call_with_big_stack,
                                                          global_sort_tiles)
    from htm_hashjoin_tpu.ops.pallas.radix_kernels import \
        multipass_radix_partition

    interpret = jax.default_backend() == "cpu"
    lines = []
    for lg in (int(x) for x in a.sizes.split(",")):
        n = 1 << lg
        keys = shuffled_keys(n, 0)
        int(keys[0])                       # resident before timing
        for engine in ("sort", "multipass"):
            best = None
            for _ in range(a.reps):
                t0 = time.perf_counter()
                if engine == "sort":
                    out = global_sort_tiles(
                        to_tiles_2d_pow2(keys, DEFAULT_TILE),
                        tile=DEFAULT_TILE, interpret=interpret)
                    np.asarray(out[:1, :1])
                else:
                    res = multipass_radix_partition(
                        keys, radix_bits=a.radixBits, passes=2,
                        key_bits=max(1, lg + 1), interpret=interpret)
                    # final per-partition build (the artifact's tile sort)
                    out = call_with_big_stack(
                        _sort_tiles_jit, res.partitioned2d,
                        tile=DEFAULT_TILE, method="bitonic",
                        interpret=interpret)[0]
                    np.asarray(out[:1, :1])
                us = (time.perf_counter() - t0) * 1e6
                best = us if best is None else min(best, us)
            line = {"engine": engine, "log2n": lg, "timeUs": best,
                    "radixBits": a.radixBits,
                    "mtuples_per_s": n / best}
            lines.append(line)
            print(json.dumps(line), flush=True)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")
    # crossover summary
    by = {}
    for l in lines:
        by.setdefault(l["log2n"], {})[l["engine"]] = l["timeUs"]
    for lg, d in sorted(by.items()):
        if len(d) == 2:
            r = d["multipass"] / d["sort"]
            print(f"# 2^{lg}: multipass/sort = {r:.2f}x "
                  f"({'multipass wins' if r < 1 else 'sort wins'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
