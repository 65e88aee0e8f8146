"""Partitioner family — mc/wisconsin-src/partitioner.cpp:69-757 re-designed
for SPMD vector execution.

The reference's partitioners move tuples between page chains under various
concurrency disciplines:

  * Partitioner           — no-op single split            (:69-114)
  * ParallelPartitioner   — shared output partitions, atomic appends (:117-180)
  * IndependentPartitioner— thread-private partitions, concatenated  (:183-263)
  * DerekPartitioner      — contiguous (non-round-robin) split       (:266-268)
  * RadixPartitioner      — multi-pass MSB radix: per-thread histograms,
                            prefix-sum combine, scatter passes        (:336-520)

On a TPU there are no threads to isolate, so every variant reduces to one
conflict-free plan: histogram (segment-sum) → exclusive scan → stable
reorder, executed as a fused sort.  The variants are kept because their
*outputs* differ — which rows land in which partition, and in what order —
and the joiner policies depend on that:

  * Parallel: partitions ordered by input position (stable by arrival).
  * Independent: partitions ordered by (source shard, position) — each
    shard's contribution is contiguous inside a partition.
  * Radix: recursive digit decomposition using ModuloHash.generate(passes),
    final histogram exposed for FlatMemoryJoiner's range probe.

All return a ``PartitionedTable``: the reordered table + per-partition
offset/size arrays (the SplitResult analog, partitioner.h:29).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hashfn import HashFunction, ModuloHash, hash_factory
from .table import Table


@dataclasses.dataclass
class PartitionedTable:
    """SplitResult analog: table rows grouped so partition p occupies rows
    [offsets[p], offsets[p] + sizes[p])."""

    table: Table
    sizes: np.ndarray      # (nparts,) int64
    offsets: np.ndarray    # (nparts,) int64 exclusive prefix sums
    part_hash: Optional[HashFunction] = None  # the hash fn that assigned
                           # rows to partitions (None for no-op/derek
                           # splits).  Lets the joiner certify that build
                           # and probe sides are CO-PARTITIONED (same
                           # fingerprint on the same attribute) and probe
                           # each unit against only its matching build
                           # partition (probe.inl:18-36 locality).
    part_attr: int = 1     # the partitioned attribute (conf 'attribute')
    _perm: "np.ndarray | jax.Array | None" = None  # original row index of
                           # each reordered row — device-resident from the
                           # hash partitioners (never pulled through the
                           # tunnel); None = identity (the no-op split),
                           # materialized lazily: a host np.arange at the
                           # 256M-row reference scale costs ~10 s and the
                           # join never reads it

    @property
    def perm(self):
        if callable(self._perm):       # deferred recompute (packed reorder)
            self._perm = self._perm()
        if self._perm is None:
            self._perm = np.arange(self.table.num_rows)
        return self._perm

    @property
    def nparts(self) -> int:
        return int(self.sizes.shape[0])

    def partition_rows(self, p: int) -> np.ndarray:
        s, e = int(self.offsets[p]), int(self.offsets[p] + self.sizes[p])
        return np.arange(s, e)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _rot_pack(keys, bias, vmin: int, skip: int, b: int, restbits: int,
              bias_bits: int, n_pad: int):
    """Rotation packing for a pure-bitfield ModuloHash: bucket =
    ((key-min) & mask) >> skip is a bit-slice of v = key-min, so
    t = (bucket << (bias_bits+restbits)) | (bias << restbits) | rest(v)
    is an int32 sort key ordered by (bucket, bias, key) — partition id,
    secondary rank AND key in one value (bias carries the Independent
    partitioner's shard id; bias_bits = 0 when there is none).  Returns
    t padded to n_pad with MAXI32 (sorts last)."""
    v = (keys - jnp.int32(vmin)).astype(jnp.int32)
    bucket = (v >> skip) & jnp.int32((1 << b) - 1)
    hi = (v >> (skip + b)) << skip
    lo = v & jnp.int32((1 << skip) - 1)
    t = (bucket << (bias_bits + restbits)) | (hi | lo)
    if bias_bits:
        t = t | (bias.astype(jnp.int32) << restbits)
    return jnp.concatenate(
        [t, jnp.full((n_pad - t.shape[0],), jnp.int32((1 << 31) - 1),
                     jnp.int32)])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _rot_unpack(t_s, pay_s, vmin: int, skip: int, b: int, restbits: int,
                bias_bits: int, nparts: int):
    """Invert the rotation packing on the sorted stream + partition bounds
    (partition p starts at the first t >= p << (bias_bits+restbits); the
    bias bits are scheduling metadata and are simply dropped)."""
    rest = t_s & jnp.int32((1 << restbits) - 1)
    bucket = t_s >> (bias_bits + restbits)
    lo = rest & jnp.int32((1 << skip) - 1)
    hi = (rest >> skip) << (skip + b)
    key_s = (hi | (bucket << skip) | lo) + jnp.int32(vmin)
    n = t_s.shape[0]
    queries = (jnp.arange(nparts, dtype=jnp.int32)
               << (bias_bits + restbits))
    bounds = jnp.searchsorted(t_s, queries, side="left",
                              method="scan").astype(jnp.int64)
    ends = jnp.concatenate([bounds[1:], jnp.full((1,), n, jnp.int64)])
    return key_s, pay_s, jnp.stack([ends - bounds, bounds])


def _reorder_rot2_kv(keys, payload, hashfn: "ModuloHash", nparts: int,
                     vmin: int, skip: int, b: int, restbits: int,
                     bias=None, bias_bits: int = 0,
                     interpret: bool = False):
    """Partition split through the Pallas key-value global sort: the
    rotation-packed int32 sort key carries (bucket, key); the payload
    column rides the compare-exchanges.  ~0.6 s at 2^28 rows on v5e vs
    ~1.7 s for XLA's stable sort_key_val (r5_split_bench + kv kernels).

    Layout note: within a partition rows come out KEY-ordered with
    duplicate-key ties in arbitrary order (bitonic networks are not
    stable) — the reference's shared-partition appends are interleaving-
    nondeterministic there too (partitioner.cpp:117-180), and every
    downstream consumer (scheduled probes, directories, emits) is
    order-insensitive within a partition."""
    from ..ops.pallas.join_kernels import LANES, global_sort_kv_tiles
    n = keys.shape[0]
    tile = 65536
    n_tiles = max(1, (n + tile - 1) // tile)
    n_tiles = 1 << (n_tiles - 1).bit_length()
    n_pad = n_tiles * tile
    t = _rot_pack(keys, bias if bias is not None else keys, vmin, skip,
                  b, restbits, bias_bits, n_pad)
    pay = jnp.concatenate(
        [payload.astype(jnp.int32),
         jnp.zeros((n_pad - n,), jnp.int32)])
    ks, vs = global_sort_kv_tiles(t.reshape(-1, LANES),
                                  pay.reshape(-1, LANES), tile=tile,
                                  interpret=interpret)
    key_s, pay_s, so = _rot_unpack(ks.reshape(-1)[:n], vs.reshape(-1)[:n],
                                   vmin, skip, b, restbits, bias_bits,
                                   nparts)
    return key_s, pay_s, np.asarray(so)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _reorder_device_packed2(cols, rank, nparts: int, stride: int):
    """Two-int32-column fast path of _reorder_device: both columns ride
    the sort as ONE packed int64 value, so the permutation is applied by
    the sort itself — no per-column gathers.  At a 256M-row probe split
    the two materializing gathers cost ~2.3 s EACH (r4 measured) while
    the packed sort_key_val costs about the same as the int32/int32 sort;
    the split drops from ~8.4 s to ~4 s."""
    n = rank.shape[0]
    a, b = cols
    packed = (a.astype(jnp.int64) << 32) | (b.astype(jnp.int64)
                                            & 0xFFFFFFFF)
    rank_s, packed_s = jax.lax.sort_key_val(rank, packed, is_stable=True)
    out_a = (packed_s >> 32).astype(jnp.int32)
    out_b = packed_s.astype(jnp.int32)
    bounds = jnp.searchsorted(
        rank_s, (jnp.arange(nparts, dtype=rank.dtype) * rank.dtype.type(
            stride)), side="left", method="scan").astype(jnp.int64)
    ends = jnp.concatenate([bounds[1:], jnp.full((1,), n, jnp.int64)])
    # the permutation itself is still occasionally read (StorePointer
    # bookkeeping, tests) — recovered lazily by the caller when needed
    return (out_a, out_b), jnp.stack([ends - bounds, bounds])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _reorder_device(cols, rank, nparts: int, stride: int):
    """The fused partition program: ONE stable key-value sort of (rank,
    iota) gives both the permutation and the sorted ranks; partition
    offsets fall out of 8K binary searches on the sorted ranks (partition
    p covers ranks [p·stride, (p+1)·stride)).  Fusing into one XLA
    computation matters at reference scale: dispatched eagerly, every
    1 GB temporary is pinned by a live Python reference until GC and the
    256M-row probe split exceeded the chip's 15.75 GB HBM.  The previous
    bincount formulation scatter-added 2^28 rows into 8K buckets —
    duplicate-heavy scatter is XLA's slowest path on TPU (~35 s measured);
    the searchsorted boundary extraction replaces it at no cost."""
    n = cols[0].shape[0] if cols else rank.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    rank_s, perm = jax.lax.sort_key_val(rank, iota, is_stable=True)
    bounds = jnp.searchsorted(
        rank_s, (jnp.arange(nparts, dtype=rank.dtype) * rank.dtype.type(
            stride)), side="left", method="scan").astype(jnp.int64)
    ends = jnp.concatenate([bounds[1:], jnp.full((1,), n, jnp.int64)])
    hist = ends - bounds
    outs = tuple(c[perm] for c in cols)
    return outs, perm, jnp.stack([hist, bounds])


def _reorder(table: Table, jattr: int, buckets: jax.Array, nparts: int,
             rank_bias: Optional[jax.Array] = None,
             bias_bound: int = 0, part_hash: Optional[HashFunction] = None,
             part_attr: int = 1) -> PartitionedTable:
    """One conflict-free partitioning pass: stable sort rows by bucket id
    (optionally biased by a secondary rank in [0, bias_bound)) and gather
    every column.

    This single fused program subsumes the reference's histogram + barrier +
    prefix-sum + scatter pipeline (partitioner.cpp:336-520) — the histogram
    and offsets fall out of a bincount, and the scatter is the sort's gather.
    """
    # int32 composite rank whenever it fits (bias values are shard ids
    # < bias_bound): int64 argsort at a 256M-row probe costs 2x the time
    # and 2x the HBM of the int32 sort
    if rank_bias is None:
        rank = buckets.astype(jnp.int32)
    elif nparts * bias_bound < (1 << 31):
        rank = (buckets.astype(jnp.int32) * jnp.int32(bias_bound)
                + rank_bias.astype(jnp.int32))
    else:
        rank = (buckets.astype(jnp.int64) * jnp.int64(bias_bound)
                + rank_bias.astype(jnp.int64))
    num_cols = [c for c in table.columns
                if not (isinstance(c, np.ndarray) and c.dtype == object)]
    stride = bias_bound if rank_bias is not None else 1
    if (len(table.columns) == 2
            and type(part_hash) is ModuloHash
            and jax.default_backend() == "tpu"
            and table.num_rows >= (1 << 22)
            and (rank_bias is None or 1 <= bias_bound <= 256)
            and all(jnp.asarray(c).dtype == jnp.int32 for c in num_cols)):
        # reference-scale fast path: rotation-packed int32 sort key through
        # the Pallas kv global sort (see _reorder_rot2_kv) — certified by
        # a fenced key-range check (the bit-field packing must cover the
        # actual keys, and t must stay below the MAXI32 padding sentinel)
        keys = jnp.asarray(table.key_column(jattr))
        payload_idx = 1 if jattr == 1 else 0   # the non-key column (0-based)
        payload = jnp.asarray(table.columns[payload_idx])
        st = np.asarray(jnp.stack([jnp.min(keys), jnp.max(keys)]))
        vmin = part_hash._min
        kmin, kmax = int(st[0]), int(st[1])
        if kmin >= vmin:
            B = max(1, (kmax - vmin + 1).bit_length())
            b = part_hash._log2k
            skip = part_hash._skipbits
            restbits = max(B - b, skip)
            bias_bits = (0 if rank_bias is None
                         else max(1, (bias_bound - 1).bit_length()))
            if b + bias_bits + restbits <= 30:
                key_s, pay_s, so = _reorder_rot2_kv(
                    keys, payload, part_hash, nparts, vmin, skip, b,
                    restbits, bias=rank_bias, bias_bits=bias_bits)
                out_cols = [None, None]
                out_cols[jattr - 1] = key_s
                out_cols[payload_idx] = pay_s
                out = Table(table.schema, out_cols, table.page_size)
                t_dev = _rot_pack(
                    keys, rank_bias if rank_bias is not None else keys,
                    vmin, skip, b, restbits, bias_bits,
                    int(keys.shape[0]))
                return PartitionedTable(
                    out, so[0], so[1], part_hash, part_attr,
                    # a CONSISTENT permutation of the same grouping; ties
                    # between duplicate keys may differ from the physical
                    # kv-sorted layout (bitonic networks are unstable) —
                    # no consumer pairs perm rows with table rows today
                    lambda: jnp.argsort(t_dev, stable=True))
    if (len(num_cols) == 2 and len(table.columns) == 2
            and all(jnp.asarray(c).dtype == jnp.int32 for c in num_cols)):
        outs2, so_dev = _reorder_device_packed2(
            tuple(jnp.asarray(c) for c in num_cols), rank, nparts, stride)
        sizes_offsets = np.asarray(so_dev)
        out = Table(table.schema, list(outs2), table.page_size)
        # same stable order as argsort(rank); materialized only if read
        # (holds rank — the same 1 GB the eager perm used to occupy)
        return PartitionedTable(out, sizes_offsets[0], sizes_offsets[1],
                                part_hash, part_attr,
                                lambda: jnp.argsort(rank, stable=True))
    outs, perm, sizes_offsets_dev = _reorder_device(
        tuple(jnp.asarray(c) for c in num_cols), rank, nparts, stride)
    sizes_offsets = np.asarray(sizes_offsets_dev)
    # numeric columns gather AND STAY on device (the host tunnel moves
    # ~45 MB/s); string columns gather host-side
    outs = list(outs)
    out_cols = []
    perm_np = None
    for c in table.columns:
        if isinstance(c, np.ndarray) and c.dtype == object:
            if perm_np is None:
                perm_np = np.asarray(perm)
            out_cols.append(c[perm_np])
        else:
            out_cols.append(outs.pop(0))
    out = Table(table.schema, out_cols, table.page_size)
    return PartitionedTable(out, sizes_offsets[0], sizes_offsets[1],
                            part_hash, part_attr, perm)


class NoPartitioner:
    """'algorithm: "no"' — a single partition containing the whole input
    (Partitioner::split, partitioner.cpp:69-114)."""

    def __init__(self, hashfn: Optional[HashFunction] = None,
                 page_size: int = 1 << 20, attribute: int = 1,
                 nthreads: int = 1):
        self.hashfn = hashfn
        self.attribute = attribute

    def split(self, table: Table) -> PartitionedTable:
        n = table.num_rows
        return PartitionedTable(table, np.array([n], np.int64),
                                np.array([0], np.int64))


class ParallelPartitioner(NoPartitioner):
    """'algorithm: "parallel"' — all workers append to shared output
    partitions (partitioner.cpp:117-180).  TPU: one stable reorder; stability
    gives the same arrival-order-within-partition observable."""

    def __init__(self, hashfn: HashFunction, page_size: int = 1 << 20,
                 attribute: int = 1, nthreads: int = 1):
        super().__init__(hashfn, page_size, attribute, nthreads)

    def split(self, table: Table) -> PartitionedTable:
        keys = jnp.asarray(table.key_column(self.attribute))
        buckets = self.hashfn.hash(keys)
        return _reorder(table, self.attribute, buckets, self.hashfn.buckets,
                        part_hash=self.hashfn, part_attr=self.attribute)


class IndependentPartitioner(ParallelPartitioner):
    """'algorithm: "independent"' — thread-private partitions concatenated
    per bucket (partitioner.cpp:183-263).  TPU: same reorder with a
    (shard, position) secondary rank so each of ``nthreads`` logical shards
    is contiguous within a partition, matching the reference's layout."""

    def __init__(self, hashfn: HashFunction, page_size: int = 1 << 20,
                 attribute: int = 1, nthreads: int = 8):
        super().__init__(hashfn, page_size, attribute, nthreads)
        self.nthreads = nthreads

    def split(self, table: Table) -> PartitionedTable:
        n = table.num_rows
        keys = jnp.asarray(table.key_column(self.attribute))
        buckets = self.hashfn.hash(keys)
        # logical shard of each row under the reference's round-robin page
        # split (table.cpp:238-272)
        page = jnp.arange(n, dtype=jnp.int32) // jnp.int32(table.page_size)
        shard = page % jnp.int32(self.nthreads)
        # rank bias orders rows by shard within a bucket; sort stability
        # keeps original position within (bucket, shard)
        return _reorder(table, self.attribute, buckets, self.hashfn.buckets,
                        rank_bias=shard, bias_bound=self.nthreads,
                        part_hash=self.hashfn, part_attr=self.attribute)


class DerekPartitioner(NoPartitioner):
    """'algorithm: "derek"' — contiguous equal split without hashing
    (partitioner.cpp:266-268: overrides split only)."""

    def __init__(self, hashfn: Optional[HashFunction] = None,
                 page_size: int = 1 << 20, attribute: int = 1,
                 nthreads: int = 8):
        super().__init__(hashfn, page_size, attribute, nthreads)
        self.nthreads = nthreads

    def split(self, table: Table) -> PartitionedTable:
        n = table.num_rows
        base, rem = divmod(n, self.nthreads)
        sizes = np.full((self.nthreads,), base, np.int64)
        sizes[:rem] += 1
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        return PartitionedTable(table, sizes, offsets)


class RadixPartitioner(ParallelPartitioner):
    """'algorithm: "radix"' — multi-pass MSB radix partitioning
    (partitioner.cpp:336-520: createhistogram / combinehistogram /
    realsplit loop over passes).

    Because every pass here is a stable sort on disjoint digit masks
    (hash.cpp generate()), the composition over passes equals one stable
    sort on the full bucket id — so we execute the passes in one fused
    reorder and keep the per-pass functions only to honor the configured
    decomposition (and for the multi-pass VMEM-tiling story, SURVEY.md §5
    long-context analog)."""

    def __init__(self, hashfn: ModuloHash, page_size: int = 1 << 20,
                 attribute: int = 1, nthreads: int = 1, passes: int = 1):
        super().__init__(hashfn, page_size, attribute, nthreads)
        self.passes = passes
        self.pass_fns = (hashfn.generate(passes)
                         if isinstance(hashfn, ModuloHash) and passes > 1
                         else [hashfn])
        self.histogram: Optional[np.ndarray] = None  # FlatMemoryJoiner hook

    def split(self, table: Table) -> PartitionedTable:
        res = super().split(table)
        # inclusive histogram, as FlatMemoryJoiner::probe consumes it
        # (flatmem.cpp: bstart = histogram[curbuc-1], bitems = hist[b]-bstart)
        self.histogram = np.cumsum(res.sizes)
        return res


_PARTITIONERS = {
    "no": NoPartitioner,
    "parallel": ParallelPartitioner,
    "independent": IndependentPartitioner,
    "derek": DerekPartitioner,
    "radix": RadixPartitioner,
}


def partitioner_factory(node: dict, hash_node: dict, nthreads: int):
    """PartitionerFactory (partitionerfactory.cpp:23-42) from parsed conf:
    node = partitioner.build / partitioner.probe, hash_node =
    partitioner.hash."""
    algo = node["algorithm"]
    if algo not in _PARTITIONERS:
        raise ValueError(f"unknown partitioner {algo!r}")
    hashfn = hash_factory(hash_node) if algo != "no" else None
    kwargs = dict(page_size=node.get("pagesize", 1 << 20),
                  attribute=node.get("attribute", 1), nthreads=nthreads)
    if algo == "radix":
        kwargs["passes"] = node.get("passes", 1)
    if algo == "no":
        return NoPartitioner(hashfn, **kwargs)
    return _PARTITIONERS[algo](hashfn, **kwargs)
