"""Probe-side partition-split sort variants at reference scale (VERDICT r4
next-step #3: splitProbe is 1.9 s for the 256M-row radix split — 141 Mt/s
on an engine whose sort path moves >1 Gt/s).

The split is a stable reorder of a (key int32, payload int32) table by
bucket = ModuloHash(key) (2048 buckets for the radix1/parallel confs).
Variants measured on the real chip, warm, fence-amortized (chain where
sensible is impossible — each variant is one program; we run reps and
time each with one small readback):

  a. packed2 (production): sort_key_val(i32 rank, i64 packed(key,payload))
  b. variadic: jax.lax.sort((rank, key, payload), num_keys=1, stable)
  c. keys-only bound: sort_key_val(i32 rank, i32 key) — what dropping the
     payload from the sort would cost/gain (needs a later 2.3 s gather,
     recorded for the record)
  d. rotation packing: bucket is a BIT-FIELD of (key - min) for ModuloHash,
     so t(key) = (bucket << rest_bits) | rest(key) is an int32 bijection
     and sort_key_val(t, payload) orders by (bucket, rest) — one i32/i32
     sort, key reconstructed arithmetically.  NOTE: within-bucket order
     becomes t-order, not arrival order (the parallel partitioner's
     stability observable) — measured to quantify the ceiling, adoption
     gated on the radix partitioner whose reference scatter order is also
     not a join observable.
  e. pallas global_sort_tiles on 2^28 int32 (keys only) — the engine's
     comparison-network rate at this size, the kv-megakernel target.
"""

import sys, os  # noqa: E401
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import json
import time

import jax

jax.config.update("jax_enable_x64", True)   # the package runs with x64 on

import jax.numpy as jnp
import numpy as np

N = 1 << 28
NPARTS = 2048          # radix1/parallel conf bucket count
KEYRANGE = 1 << 24     # keys 1..16M


def timed(label, fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": label, "n": N,
                      "bestSeconds": round(best, 4),
                      "mtuplesPerSec": round(N / best / 1e6, 1)}),
          flush=True)
    return best


def main() -> int:
    key = jax.random.PRNGKey(7)
    keys = jax.random.randint(key, (N,), 1, KEYRANGE + 1, dtype=jnp.int32)
    payload = jnp.arange(N, dtype=jnp.int32)
    mask = jnp.int32(NPARTS - 1)

    @jax.jit
    def packed2(k, p):
        rank = (k - 1) & mask
        packed = (k.astype(jnp.int64) << 32) | (p.astype(jnp.int64)
                                                & 0xFFFFFFFF)
        rank_s, packed_s = jax.lax.sort_key_val(rank, packed,
                                                is_stable=True)
        return (packed_s >> 32).astype(jnp.int32), packed_s.astype(jnp.int32)

    @jax.jit
    def variadic(k, p):
        rank = (k - 1) & mask
        _, k_s, p_s = jax.lax.sort((rank, k, p), num_keys=1,
                                   is_stable=True)
        return k_s, p_s

    @jax.jit
    def keysonly(k):
        rank = (k - 1) & mask
        return jax.lax.sort_key_val(rank, k, is_stable=True)[1]

    @jax.jit
    def rotation(k, p):
        v = k - 1                      # ModuloHash min = 1
        bucket = v & mask              # low 11 bits
        rest = v >> 11                 # keys < 2^24: 13 bits
        t = (bucket << 13) | rest      # int31 bijection, (bucket, rest)
        t_s, p_s = jax.lax.sort_key_val(t, p, is_stable=True)
        k_s = ((t_s & ((1 << 13) - 1)) << 11 | (t_s >> 13)) + 1
        return k_s, p_s

    timed("a_packed2_i32rank_i64val", lambda: packed2(keys, payload))
    timed("b_variadic_3xi32", lambda: variadic(keys, payload))
    timed("c_keysonly_i32_i32", lambda: keysonly(keys))
    k_s, p_s = rotation(keys, payload)
    # correctness: same multiset, grouped by bucket, payload aligned
    kk = np.asarray(k_s[:1 << 20]); pp = np.asarray(p_s[:1 << 20])
    kn = np.asarray(keys); assert (kn[pp] == kk).all()
    timed("d_rotation_i32_i32", lambda: rotation(keys, payload))

    from htm_hashjoin_tpu.ops.pallas.join_kernels import global_sort_tiles
    from htm_hashjoin_tpu.joins.pallas_backend import to_tiles_2d_pow2
    k2d = to_tiles_2d_pow2(keys, 65536)
    timed("e_pallas_gsort_keysonly", lambda: global_sort_tiles(k2d,
                                                               tile=65536))
    return 0


if __name__ == "__main__":
    sys.exit(main())
