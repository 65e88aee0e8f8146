"""Global-sort pass fusion experiment (VERDICT r4 next-step #6).

Round 4 closed the comparison-network stage floor at ~124 ms for 2^27
(378 stages x ~95% of VPU issue) — but that wall-clock figure includes
the per-program LAUNCH GAP this platform pays between back-to-back
dispatches (~1.6 ms, measured r5 via traced device spans vs wall time:
a 1.63 ms device copy strides at 3.28 ms wall).  The 24-pass gsort
dispatches 24 separate programs = ~35 ms of pure gap.

Experiment: trace the whole pass sequence inside ONE jit so XLA emits a
single program with 24 back-to-back custom calls (no host dispatch
between passes).  Also measures GSORT_BITS=4 grouping (fewer passes =
fewer gaps) enabled by the raised scoped-vmem budget.

RESULT (committed: results_tpu27r5/gsort_fuse_log): fusion changes
NOTHING (147.6 ms both ways) — the dispatched chain already pipelines
because each ~6 ms pass outlasts the ~1.6 ms dispatch, so the gap only
binds sub-dispatch-length kernels (the copy chain that exposed it).
bits=4 grouping gives 140.7 ms (−5%, adopted).  Subtracting the one
~25 ms measurement fence, device time ≈ 122/115 ms — matching the r4
stage-floor argument (378 stages ≈ 95% VPU issue ≈ 124 ms).  With the
r5 chip roofline showing the gsort at 55% of the engine's own streaming
rate, the sort is confirmed VPU-stage-bound, not DMA-bound: the only
path below ~100 ms is a lower-stage-count algorithm, and the splitter/
sample-sort family needs per-run dynamic-LENGTH DMA descriptors Mosaic
cannot express (static slice sizes), degenerating into the small-DMA
scatter regime measured 2-3.6x slower in r3 (radix_crossover_log).
Closed with measured numbers on all three sides.
"""

import sys, os  # noqa: E401
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 27
TILE = 65536


def timed(label, fn, reps=5):
    out = fn()
    np.asarray(out[:1, :1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[:1, :1])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": label, "n": N,
                      "bestMs": round(best * 1e3, 1)}), flush=True)
    return best


def main() -> int:
    from htm_hashjoin_tpu.joins.pallas_backend import to_tiles_2d_pow2
    from htm_hashjoin_tpu.ops.pallas import join_kernels as jk

    key = jax.random.PRNGKey(0)
    keys = jax.random.permutation(key, jnp.arange(1, N + 1,
                                                  dtype=jnp.int32))
    k2d = to_tiles_2d_pow2(keys, TILE)

    timed("baseline_dispatched", lambda: jk.global_sort_tiles(k2d,
                                                              tile=TILE))

    def build_fused(gsort_bits):
        def run(x):
            rows_per_tile = TILE // jk.LANES
            n_tiles = x.shape[0] // rows_per_tile
            levels = n_tiles.bit_length() - 1
            pa_bits = min(jk.GSORT_PHASE_A_BITS, levels)
            cur = jk._sort_tiles_jit(
                x, tile=TILE << pa_bits,
                method="bitonic" if levels == pa_bits else "bitonic_alt")[0]
            for j in range(pa_bits + 1, levels + 1):
                stage_bits = list(range(j - 1, -1, -1))
                chunks = [stage_bits[i:i + gsort_bits]
                          for i in range(0, len(stage_bits), gsort_bits)]
                for ci, chunk in enumerate(chunks):
                    cur = jk._gsort_pass_jit(
                        cur, tile=TILE, bits=tuple(chunk), level=j,
                        include_local=(ci == len(chunks) - 1),
                        final_level=(j == levels))
            return cur
        return jax.jit(run)

    import threading
    for bits, label in ((3, "fused_one_program_bits3"),
                        (4, "fused_one_program_bits4")):
        box = {}

        def runner():
            try:
                box["f"] = build_fused(bits)
                box["f"](k2d).block_until_ready
            except Exception as e:       # GSORT_BITS=4 may exceed vmem
                box["e"] = e
        th = threading.Thread(target=runner)
        th.start()
        th.join()
        if "e" in box:
            print(json.dumps({"variant": label,
                              "error": str(box["e"])[:200]}), flush=True)
            continue
        f = box["f"]
        out = f(k2d)
        ref = np.asarray(jnp.sort(keys)[:1 << 18])
        got = np.asarray(out.reshape(-1)[:1 << 18])
        assert np.array_equal(ref, got), label
        timed(label, lambda: f(k2d))
    return 0


if __name__ == "__main__":
    sys.exit(main())
