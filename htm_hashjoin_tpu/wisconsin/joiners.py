"""Joiner policy lattice — mc/wisconsin-src/algo/* re-designed TPU-first.

The reference composes joiners from policy mixins (joinerfactory.cpp:23-75):
``{StoreCopy,StorePointer} × {BuildIsPart,BuildIsNotPart} ×
{ProbeIsPart,ProbeIsNotPart,ProbeSteal}`` plus two specials (NestedLoops,
FlatMemoryJoiner).  Each axis exists to manage *CPU concurrency and cache
locality*; here is its TPU re-expression:

  storage axis (storage.cpp StoreCopy vs storagepl.cpp StorePointer)
      StoreCopy materializes key+payload into the table at build time —
      here: payload columns gathered into build order on device (early
      materialization).  StorePointer stores tuple pointers — here: only
      the row-permutation is kept and payload is gathered at emit (late
      materialization).  Both are real, distinct data movements with the
      reference's exact trade-off (build bandwidth vs probe gathers).

  build axis (build.inl)
      BuildIsPart builds thread-private partitions without atomics;
      BuildIsNotPart builds one shared table with atomic appends.  On TPU
      every build is conflict-free by construction: the chained bucket
      pages (hashtable.h:24-50) become a bucket-sorted layout — stable
      sort rows by hash bucket; bucket b's tuples occupy one contiguous
      range.  The axis survives as the *plan*: partitioned builds sort
      within each partition (a vmappable per-partition program; the
      private-build analog), unpartitioned builds sort globally.

  probe axis (probe.inl)
      ProbeIsPart/ProbeIsNotPart walk matching partitions; ProbeSteal adds
      a second work-stealing pass.  SPMD has no idle lanes to steal into
      (SURVEY.md §2.4 P8): the analog is static cost balancing, and the
      configured policy is honored in the stats (per-partition probe costs
      and the balanced assignment ``steal`` would have produced).

  match kernel
      Bucket-chain walks become two binary searches: equal keys always
      share a bucket, so a key-sorted build side is probed with
      searchsorted(left/right); (hi-lo) is the per-probe match count and
      the expand trick materializes output rows with static shapes.

Outputs are materialized (schema = select1 cols ++ select2 cols, the
OUTPUT_ASSEMBLE path of flatmem.cpp/storage.cpp), not just counted —
capacity is discovered by a count pass, then the emit runs with the
capacity rounded to the next power of two (bounded recompiles).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..relation import next_pow2
from .hashfn import HashFunction
from .partitioner import PartitionedTable, RadixPartitioner
from .schema import ColumnType, Schema
from .table import Table


# ---------------------------------------------------------------------------
# Static-shape join-index kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2,))
def _expand_matches(lo: jax.Array, hi: jax.Array, cap: int):
    """Expand per-probe match ranges [lo, hi) into flat (probe_row,
    build_rank) index pairs of static length ``cap``.

    For output slot k: its probe row is the last i with offsets[i] <= k, and
    its match ordinal is k - offsets[i].  Invalid slots (k >= total) get
    index -1.  This replaces the reference's per-thread output cursors
    (WriteTable::append, table.h:200-253) with one vectorized program.
    """
    # int32 slot/index arithmetic when cap allows: the int64 temporaries
    # at a 2^28-row output cost ~8 GB of transient HBM (ran the chip out).
    # total <= cap (the caller sizes cap from the counted total), so the
    # int32 offsets cannot overflow under the gate.
    idt = jnp.int32 if cap < (1 << 31) else jnp.int64
    counts = (hi - lo).astype(idt)
    offsets = jnp.concatenate([jnp.zeros((1,), idt),
                               jnp.cumsum(counts, dtype=idt)])
    total = offsets[-1].astype(jnp.int64)
    k = jnp.arange(cap, dtype=idt)
    # owner row of slot k = last i with offsets[i] <= k.  searchsorted here
    # is 24 binary-search gather passes over cap elements (~16 s at 16M on
    # TPU); since k is just arange(cap), a scatter-max of row ids at range
    # starts + one cummax computes the same thing in one pass.  Empty ranges
    # scatter to the same slot as their successor and lose the max — exactly
    # the searchsorted(side='right') owner.
    starts = offsets[:-1].astype(jnp.int32)    # cap < 2^31
    marks = jnp.zeros((cap,), jnp.int32).at[starts].max(
        jnp.arange(lo.shape[0], dtype=jnp.int32), mode="drop")
    pi = jax.lax.cummax(marks).astype(idt)
    # one fused gather: build_rank = k + (lo - range_start)[owner]
    base = lo.astype(idt) - offsets[:-1]
    build_rank = k + base[pi]
    valid = k < total.astype(idt)
    probe_idx = jnp.where(valid, pi, -1)
    build_rank = jnp.where(valid, build_rank, -1)
    return probe_idx, build_rank, total


def _match_bounds_tagged(sorted_keys: jax.Array, probe_keys: jax.Array,
                         comp_dtype):
    """Match ranges [lo, hi) of each probe key in the key-sorted build side
    — the bucket-chain walk analog (storage.cpp realprobeCursor;
    hashtable.h iterator).

    One fused sort of a tagged (key·2+side, row) pair stream: at a probe
    element's sorted position, the running build-element count equals
    hi(key) and the count at its key-run start equals lo(key); scattering
    those through the carried row indices yields per-row bounds — 4x less
    sort work than two searchsorted(method='sort') calls.

    ``comp_dtype`` is the tagged-composite dtype: int32 when every key is
    certified < 2^30 (the reference-scale workloads: keys <= 16M,
    wisconsin-src/datagen/genbuild.py) — int64 sorts on this TPU run ~10x
    slower than int32 (no native 64-bit vector path), and the composite
    sort is the entire probe cost at 16M x 256M scale."""
    n_b, n_p = sorted_keys.shape[0], probe_keys.shape[0]
    comp = jnp.concatenate([
        sorted_keys.astype(comp_dtype) * 2,
        probe_keys.astype(sorted_keys.dtype).astype(comp_dtype) * 2 + 1,
    ])
    rows = jnp.concatenate([jnp.zeros((n_b,), jnp.int32),
                            jnp.arange(n_p, dtype=jnp.int32)])
    comp_s, rows_s = jax.lax.sort_key_val(comp, rows)
    tag = (comp_s & 1).astype(jnp.int32)
    bcnt = 1 - tag
    a = jax.lax.cumsum(bcnt)                       # hi at probe positions
    key = comp_s >> 1
    run_start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 key[1:] != key[:-1]])
    prev_a = jax.lax.cummax(jnp.where(run_start, a - bcnt, -1))  # lo
    is_probe = tag == 1
    tgt = jnp.where(is_probe, rows_s, n_p)
    lo = jnp.zeros((n_p,), jnp.int32).at[tgt].set(
        prev_a.astype(jnp.int32), mode="drop")
    hi = jnp.zeros((n_p,), jnp.int32).at[tgt].set(
        a.astype(jnp.int32), mode="drop")
    total = jnp.sum(jnp.where(is_probe, a - prev_a, 0).astype(jnp.int64))
    return lo, hi, total


@jax.jit
def _match_bounds_i64(sorted_keys, probe_keys):
    return _match_bounds_tagged(sorted_keys, probe_keys, jnp.int64)


@jax.jit
def _match_bounds_i32(sorted_keys, probe_keys):
    return _match_bounds_tagged(sorted_keys, probe_keys, jnp.int32)


@jax.jit
def _keys_absmax(a, b):
    """One fused readback certifying the int32 composite: max |key| over
    both sides, stacked so the certification costs ONE host fence (~25 ms
    on this tunnel), not two."""
    m = jnp.maximum(
        jnp.maximum(jnp.max(a), jnp.max(b)).astype(jnp.int64),
        -jnp.minimum(jnp.min(a), jnp.min(b)).astype(jnp.int64))
    return m


_I32_COMP_LIMIT = 1 << 30        # |key|*2+1 must stay in int32

# Dense-key rank table: eligible when build keys lie in [0, K] with K small
# enough that a (K+1)-entry table is cheap (≤ 16x the build side and ≤ 2^26
# entries = 512 MB packed).  The canonical multijoin workloads qualify:
# 16M build keys drawn 1..16M (wisconsin-src/datagen/genbuild.py).
_DENSE_LIMIT = 1 << 26


@jax.jit
def _dense_rank_table(keys: jax.Array, zeros_l: jax.Array):
    """Per-key bounds directory over the key-sorted build order: cnt[k] =
    multiplicity of key k, cum[k] = #build keys <= k — so lo = cum-cnt,
    hi = cum index the sorted build side.  One bincount scatter + one
    cumsum at build time replaces the per-probe tagged sort entirely (the
    reference's FK probes hash into exactly such a directory,
    hashtable.h:24-50).  ``zeros_l`` fixes the table length (next_pow2 of
    the key range — bounded recompiles).  Two int32 tables, not one packed
    int64: the packed gather's 8-byte temp at a 256M-row probe is a 2 GB
    HBM spike the 16 GB chip cannot spare alongside the output buffers."""
    cnt = zeros_l.at[keys].add(1, mode="drop")
    cum = jnp.cumsum(cnt, dtype=jnp.int32)
    return cum, cnt, jnp.max(cnt)


@jax.jit
def _dense_bounds(cum: jax.Array, cnt_tbl: jax.Array, probe_keys: jax.Array):
    """Match ranges via two int32 gathers from the dense rank directory —
    no sort, no scatter.  Out-of-range probe keys match nothing.  Returns
    (lo, hi, [total, all_unit]) with the two scalars stacked so the caller
    pays a single fence; all_unit certifies every probe count == 1 (the FK
    fast path: expansion becomes the identity)."""
    k_max = cum.shape[0] - 1
    idx = jnp.clip(probe_keys, 0, k_max).astype(jnp.int32)
    valid = (probe_keys >= 0) & (probe_keys <= k_max)
    cnt = jnp.where(valid, cnt_tbl[idx], 0)
    hi = jnp.where(valid, cum[idx], 0)
    lo = hi - cnt
    total = jnp.sum(cnt.astype(jnp.int64))
    # negative keys are schedule padding (matches nothing) — they do not
    # void the unit certificate; generated keys are 1-based so a real
    # non-matching key (cnt 0, key >= 0) still voids it
    all_unit = jnp.all((cnt == 1) | (probe_keys < 0)).astype(jnp.int64)
    return lo, hi, jnp.stack([total, all_unit])


@jax.jit
def _dense_bounds_perm(probe_keys: jax.Array, kmin, kmax):
    """Bounds under the PERMUTATION-BUILD certificate (dense keys covering
    [kmin, kmax] exactly once — the canonical 16M PK build): lo is pure
    arithmetic, no table, no gather.  head = [total, all_unit]; a probe key
    outside the range voids all_unit and the caller falls back to the
    gather-based directory for exact hi/lo of the non-matching rows."""
    valid = (probe_keys >= kmin) & (probe_keys <= kmax)
    lo = jnp.where(valid, probe_keys - kmin, 0).astype(jnp.int32)
    hi = lo + valid.astype(jnp.int32)
    total = jnp.sum(valid.astype(jnp.int64))
    all_unit = jnp.all(valid | (probe_keys < 0)).astype(jnp.int64)
    return lo, hi, jnp.stack([total, all_unit])


@jax.jit
def _flat_directory(keys_flat_order: jax.Array, zeros_l: jax.Array):
    """Start/count directory over the keyspace for a FLAT-ORDER build
    (FlatMemoryJoiner): start_tbl[k] = first flat position of key k,
    cnt_tbl[k] = multiplicity.  Valid because equal keys are contiguous in
    (bucket, key) order when bucket = hash(key)."""
    n = keys_flat_order.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.full(zeros_l.shape, n, jnp.int32).at[keys_flat_order].min(
        pos, mode="drop")
    cnt = zeros_l.at[keys_flat_order].add(1, mode="drop")
    return start, cnt


@jax.jit
def _flat_dense_bounds(start_tbl: jax.Array, cnt_tbl: jax.Array,
                       probe_keys: jax.Array):
    """Flat-order match ranges via two int32 gathers (see _dense_bounds;
    same head = [total, pad-aware all_unit] contract)."""
    k_max = start_tbl.shape[0] - 1
    idx = jnp.clip(probe_keys, 0, k_max).astype(jnp.int32)
    valid = (probe_keys >= 0) & (probe_keys <= k_max)
    cnt = jnp.where(valid, cnt_tbl[idx], 0)
    lo = jnp.where(valid & (cnt > 0), start_tbl[idx], 0)
    hi = lo + cnt
    total = jnp.sum(cnt.astype(jnp.int64))
    all_unit = jnp.all((cnt == 1) | (probe_keys < 0)).astype(jnp.int64)
    return lo, hi, jnp.stack([total, all_unit])


@functools.partial(jax.jit, static_argnums=(2,))
def _steal_cuts(occ, buckets, k: int):
    """ProbeSteal's cost-balanced cut points, computed ON DEVICE: the
    round-3 host formulation np.asarray'd the 2^28-element hash array
    through the ~45 MB/s tunnel (~22 s) before a host cumsum; here only
    the k-1 cut rows and the k chunk costs come back."""
    cost = occ[buckets].astype(jnp.int64) + 1
    prefix = jnp.cumsum(cost)
    total = prefix[-1]
    targets = (jnp.arange(1, k, dtype=jnp.int64) * total) // k
    cuts = jnp.searchsorted(prefix, targets).astype(jnp.int64)
    n = buckets.shape[0]
    bounds = jnp.concatenate([jnp.zeros((1,), jnp.int64), cuts,
                              jnp.full((1,), n, jnp.int64)])
    cprefix = jnp.concatenate([jnp.zeros((1,), jnp.int64), prefix])
    balance = cprefix[bounds[1:]] - cprefix[bounds[:-1]]
    return bounds, balance


@jax.jit
def _partition_costs(lo, hi, starts, ends):
    counts = (hi - lo).astype(jnp.int64) + 1
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(counts)])
    return cum[ends] - cum[starts]


@jax.jit
def _build_key_stats(keys: jax.Array, occ: jax.Array) -> jax.Array:
    """[max bucket occupancy, min key, max key] in ONE readback (three
    separate int() calls would cost three ~25 ms tunnel fences)."""
    return jnp.stack([jnp.max(occ).astype(jnp.int64),
                      jnp.min(keys).astype(jnp.int64),
                      jnp.max(keys).astype(jnp.int64)])


def _match_bounds(sorted_keys: jax.Array, probe_keys: jax.Array,
                  key_bound: Optional[int] = None):
    """Dtype-routing wrapper: int32 tagged sort when |key| is certified
    < 2^30 (the composite key*2+tag is order-preserving in int32 there —
    negative keys included), int64 otherwise.  Pass ``key_bound`` =
    max |key| to skip the certification readback; Wisconsin joiners certify
    once per probe and reuse the bound across schedule units."""
    if key_bound is None:
        if (jnp.issubdtype(sorted_keys.dtype, jnp.signedinteger)
                and sorted_keys.dtype.itemsize <= 4
                and probe_keys.dtype.itemsize <= 4
                and sorted_keys.size and probe_keys.size):
            key_bound = int(_keys_absmax(sorted_keys, probe_keys))
        else:
            key_bound = _I32_COMP_LIMIT
    if key_bound < _I32_COMP_LIMIT:
        return _match_bounds_i32(sorted_keys, probe_keys)
    return _match_bounds_i64(sorted_keys, probe_keys)


# ---------------------------------------------------------------------------
# Base joiner
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class JoinStats:
    """Observable policy effects (the reference's per-phase instrumentation,
    main.cpp:75-94)."""

    build_rows: int = 0
    probe_rows: int = 0
    output_rows: int = 0
    bucket_count: int = 0
    max_bucket_occupancy: int = 0
    partition_probe_costs: Optional[np.ndarray] = None
    stolen_balance: Optional[np.ndarray] = None  # ProbeSteal static plan
    probe_schedule: Optional[dict] = None  # MEASURED per-unit schedule:
    # {policy, units: [(start_row, rows, micros)], worker_micros: [...],
    #  imbalance} — the execution difference between ProbeIsPart and
    #  ProbeSteal (probe.inl:18-52), see HashJoiner._scheduled_probe


class BaseJoiner:
    """BaseAlgo analog (algo/algo.h:32-58): init copies schemas/selects,
    build consumes the build-side split, probe returns the output table."""

    def __init__(self, hashfn: Optional[HashFunction] = None,
                 output_page_size: int = 1 << 20):
        self.hashfn = hashfn
        self.output_page_size = output_page_size
        self.stats = JoinStats()

    def init(self, schema1: Schema, select1: Sequence[int], jattr1: int,
             schema2: Schema, select2: Sequence[int], jattr2: int) -> None:
        self.s1, self.s2 = schema1, schema2
        self.sel1, self.sel2 = list(select1), list(select2)
        self.ja1, self.ja2 = jattr1, jattr2
        self.sout = schema1.project(self.sel1).types + \
            schema2.project(self.sel2).types
        self.sout = Schema(self.sout)
        # sbuild = {key, selected payload} (algo.h:38-44)
        self.sbuild = schema1.build_schema(self.sel1, jattr1)

    def build(self, parts: PartitionedTable) -> None:
        raise NotImplementedError

    def probe(self, parts: PartitionedTable) -> Table:
        raise NotImplementedError

    # -- shared emit ---------------------------------------------------------

    def _emit(self, probe_table: Table, lo, hi, total: int,
              build_payload_cols: List, probe_row_of=None,
              unit_counts: bool = False) -> Table:
        """Materialize output rows: sel1 payload gathered from the build
        structure, sel2 columns gathered from the probe side.

        Numeric output columns are gathered on device and STAY there, at a
        static next-pow2 capacity with the invalid tail beyond ``rows``
        (slots k >= total are exactly the tail, _expand_matches) — the
        host tunnel moves ~45 MB/s, so host materialization happens only on
        an explicit save()/np.asarray.  String columns gather host-side over
        the valid prefix."""
        total_i = int(total)
        cap = max(8, next_pow2(total_i))
        if unit_counts and total_i:
            # every probe row matches exactly once (the FK invariant,
            # certified on device by the bounds pass): expansion is the
            # identity — no scatter-max/cummax pass over the output, and
            # b_rank IS lo end-padded (a lo[kc] gather here would cost a
            # second 2^28-element gather at reference scale)
            k = jnp.arange(cap, dtype=jnp.int32)
            kc = jnp.minimum(k, jnp.int32(total_i - 1))
            p_idx = jnp.where(k < total_i, kc, 0)
            b_rank = jnp.pad(lo, (0, cap - lo.shape[0]))
        else:
            probe_idx, build_rank, _ = _expand_matches(lo, hi, cap)
            b_rank = jnp.where(build_rank >= 0, build_rank, 0)
            p_idx = jnp.where(probe_idx >= 0, probe_idx, 0)
        if probe_row_of is not None:
            p_idx = jnp.asarray(probe_row_of)[p_idx]
        b_rank_np = None
        out_cols: List = []
        for col in build_payload_cols:
            if isinstance(col, np.ndarray) and col.dtype == object:
                if b_rank_np is None:
                    b_rank_np = np.asarray(b_rank[:total_i])
                out_cols.append(col[b_rank_np])       # strings gather on host
            else:
                out_cols.append(jnp.asarray(col)[b_rank])
        identity_probe = (unit_counts and total_i and probe_row_of is None)
        for c in self.sel2:
            col = probe_table.column(c)
            if isinstance(col, np.ndarray) and col.dtype == object:
                out_cols.append(col[np.asarray(p_idx[:total_i])])
            elif identity_probe:
                # all-unit FK emit: p_idx is the identity, so the probe
                # column IS the output column — skip the 2^28-element
                # gather (and its HBM temp) entirely
                colj = jnp.asarray(col)
                out_cols.append(jnp.pad(colj, (0, cap - colj.shape[0])))
            else:
                out_cols.append(jnp.asarray(col)[p_idx])
        self.stats.output_rows = total_i
        return Table(self.sout, out_cols, self.output_page_size,
                     rows=total_i)


# ---------------------------------------------------------------------------
# The hash-join policy lattice
# ---------------------------------------------------------------------------

class HashJoiner(BaseJoiner):
    """The {storage × build × probe} lattice in one composable class.

    ``storage``: 'copy' (StoreCopy, storage.cpp) or 'pointer'
    (StorePointer, storagepl.cpp).  ``partition_build``/``partition_probe``/
    ``steal`` select the build.inl/probe.inl mixins.
    """

    def __init__(self, hashfn: HashFunction, *, storage: str = "copy",
                 partition_build: bool = False, partition_probe: bool = False,
                 steal: bool = False, output_page_size: int = 1 << 20,
                 build_page_size: int = 32, nthreads: int = 1):
        super().__init__(hashfn, output_page_size)
        self.nthreads = max(1, int(nthreads))
        if steal and partition_build:
            raise ValueError("steal requires partitionbuild == no "
                             "(joinerfactory.cpp:39-41 asserts)")
        self.storage = storage
        self.partition_build = partition_build
        self.partition_probe = partition_probe
        self.steal = steal
        self.build_page_size = build_page_size  # conf 'buildpagesize' (rows/bucket page)

    # -- build ---------------------------------------------------------------

    def build(self, parts: PartitionedTable) -> None:
        """Construct the bucket-sorted table.

        BuildIsPart (build.inl:18-25): per-partition private builds — the
        global stable sort by (partition, bucket, key) IS the concatenation
        of the per-partition sorts, since partitions arrive contiguous.
        BuildIsNotPart (build.inl:27-32): one shared build — global sort by
        (bucket, key).  Both are one fused conflict-free program; they
        differ in which precondition they rely on (hash-partition ⇒
        disjoint buckets) and in the layout stats recorded.
        """
        table = parts.table
        keys = jnp.asarray(table.key_column(self.ja1))
        buckets = self.hashfn.hash(keys)
        # NOT jnp.bincount: under x64 it scatter-adds in int64, which is
        # TPU's slow path — 2.36 s vs 0.19 s for the int32 formulation at
        # 16M rows x 8.4M buckets (measured; the whole build phase hog)
        occ = jnp.zeros((self.hashfn.buckets,), jnp.int32).at[
            buckets.astype(jnp.int32)].add(1, mode="drop")
        self._bucket_occ = occ        # ProbeSteal's cost model (see probe)
        self.stats.build_rows = table.num_rows
        self.stats.bucket_count = self.hashfn.buckets
        self._dense_tbl = None
        self._key_bound = _I32_COMP_LIMIT
        if table.num_rows:
            st = np.asarray(_build_key_stats(keys, occ))  # ONE fence
            max_occ, kmin, kmax = (int(x) for x in st)
            self.stats.max_bucket_occupancy = max_occ
            self._key_bound = max(abs(kmin), abs(kmax))
            if keys.dtype.itemsize > 4 and self._key_bound < (1 << 31):
                # int32 keys sort/pack ~10x faster than int64 on TPU
                keys = keys.astype(jnp.int32)
            if (0 <= kmin and kmax < _DENSE_LIMIT
                    and kmax < max(16 * table.num_rows, 1 << 20)):
                tbl_len = next_pow2(kmax + 2)
                cum, cnt, mx_cnt = _dense_rank_table(
                    keys, jnp.zeros((tbl_len,), jnp.int32))
                self._dense_tbl = (cum, cnt)
                # permutation certificate: every key in [kmin, kmax]
                # appears exactly once -> probe bounds are arithmetic
                self._kmin, self._kmax = kmin, kmax
                self._perm_build = (int(np.asarray(mx_cnt)) == 1
                                    and kmax - kmin + 1 == table.num_rows)
        else:
            self.stats.max_bucket_occupancy = 0
        order = jnp.argsort(keys, stable=True)
        self._build_keys_sorted = keys[order]
        self._build_perm = order               # StorePointer: the "pointers"
        self._build_table = table
        if self.storage == "copy":
            # early materialization: gather payload columns into build order
            # (numeric on device, strings host-side)
            self._build_payload = [
                np.asarray(table.column(c))[np.asarray(order)]
                if table.schema.types[c - 1] == ColumnType.STRING
                else jnp.asarray(table.column(c))[order]
                for c in self.sel1]
        else:
            self._build_payload = None

    # -- probe ---------------------------------------------------------------

    def _bounds(self, probe_keys):
        """Match-range route: the dense rank table (one packed gather —
        no sort, no scatter) when the build certified a dense key range,
        the tagged-sort merge otherwise.  Returns (lo, hi, total,
        all_unit) with one device fence."""
        if self._dense_tbl is not None:
            if getattr(self, "_perm_build", False):
                lo, hi, head = _dense_bounds_perm(probe_keys, self._kmin,
                                                  self._kmax)
                tot = np.asarray(head)
                if bool(tot[1]):          # every probe key in range
                    return lo, hi, int(tot[0]), True
            lo, hi, head = _dense_bounds(*self._dense_tbl, probe_keys)
            tot = np.asarray(head)
            return lo, hi, int(tot[0]), bool(tot[1])
        lo, hi, t = _match_bounds(self._build_keys_sorted, probe_keys)
        return lo, hi, int(t), False

    def _schedule_bounds(self, parts: PartitionedTable, probe_keys,
                         n: int) -> "tuple[np.ndarray, str]":
        """Row-range decomposition of the probe under the policy.

        ProbeIsPart (probe.inl:18-36): one unit per partition, owner order.
        ProbeSteal (probe.inl:37-52): nthreads equal-COST contiguous
        chunks, cut by the bucket-occupancy cost model — the static
        schedule the reference's dynamic stealing converges to (each
        worker ends up with ≈ total/nthreads work)."""
        if self.steal:
            bounds_d, balance_d = _steal_cuts(
                jnp.asarray(self._bucket_occ),
                self.hashfn.hash(probe_keys), self.nthreads)
            bb = np.asarray(jnp.concatenate(
                [bounds_d, balance_d]))        # ONE small readback
            k1 = self.nthreads + 1
            bounds = np.unique(bb[:k1])
            self.stats.stolen_balance = bb[k1:]
            return bounds, "probe_steal"
        bounds = np.concatenate([np.asarray(parts.offsets, np.int64), [n]])
        return np.unique(bounds), "probe_is_part"

    def _scheduled_probe(self, parts: PartitionedTable, probe_keys,
                         n: int):
        """REAL per-unit probe execution (not a simulation): each schedule
        unit runs as its own device program with a fenced timing readback,
        so the stats carry MEASURED unit times.  ProbeIsPart and ProbeSteal
        produce different decompositions (different measured schedules) and
        identical results.  Units are padded to one shared static shape so
        a single compiled program serves the whole schedule (the per-unit
        fence is the TPU analog of the reference's per-task overhead)."""
        import time

        from ..utils.profiler import sync_stats

        bounds, policy = self._schedule_bounds(parts, probe_keys, n)
        units = [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])
                 if b > a]
        pad_len = max(8, next_pow2(max(b - a for a, b in units)))
        pad = jnp.full((pad_len,), -1, probe_keys.dtype)   # matches nothing
        if self._dense_tbl is not None:
            if getattr(self, "_perm_build", False):
                # arithmetic bounds per unit: no gathers at all
                def unit_bounds(seg):
                    return _dense_bounds_perm(seg, self._kmin, self._kmax)
            else:
                def unit_bounds(seg):
                    return _dense_bounds(*self._dense_tbl, seg)
        else:
            # certify the int32 composite ONCE for the whole schedule (a
            # per-unit certification readback would add ~25 ms per unit)
            kb = (int(_keys_absmax(self._build_keys_sorted, probe_keys))
                  if probe_keys.dtype.itemsize <= 4 else _I32_COMP_LIMIT)

            def unit_bounds(seg):
                lo_u, hi_u, t_u = _match_bounds(self._build_keys_sorted, seg,
                                                key_bound=kb)
                return lo_u, hi_u, jnp.stack([t_u, jnp.zeros((), jnp.int64)])
        # warm-up on the shared unit shape: compile cost must not land on
        # the first unit's measured time (the reference's timers likewise
        # start after thread setup, main.cpp:99-109)
        np.asarray(unit_bounds(pad)[2])
        # Owner-order round-robin for partition units (partition p →
        # worker p % nthreads, the static SPMD assignment, SURVEY.md §2.4
        # P8); steal chunks map one-to-one onto workers.  Each WORKER's
        # units run as one enqueued batch with a single fenced readback —
        # the measured granularity is the worker, exactly the reference's
        # per-thread rdtsc span (main.cpp:75-94); per-unit micros are the
        # worker's measured span apportioned by unit rows.  (The round-3
        # per-UNIT fence cost ~27 ms of tunnel round trip per unit — 55 s
        # of pure fences on a 2048-partition probe.)
        k = self.nthreads
        los = [None] * len(units)
        his = [None] * len(units)
        times = [0.0] * len(units)
        worker_us = [0.0] * k
        total = 0
        # the unit certificate survives scheduling: pad keys (-1) are
        # excluded on device, so AND-ing the per-unit flags certifies the
        # whole probe (unlocks the identity emit — at reference scale the
        # general expansion's temporaries alone exceed the chip's HBM)
        all_unit = self._dense_tbl is not None
        for w in range(k):
            idxs = [i for i in range(len(units)) if i % k == w]
            if not idxs:
                continue
            t0 = time.perf_counter()
            heads = []
            for i in idxs:
                a, b = units[i]
                seg = jax.lax.dynamic_update_slice(pad, probe_keys[a:b],
                                                   (0,))
                lo_u, hi_u, head = unit_bounds(seg)
                los[i] = lo_u[:b - a]
                his[i] = hi_u[:b - a]
                heads.append(head)
            hd = np.asarray(jnp.stack(heads))   # the worker's ONE fence
            worker_us[w] = (time.perf_counter() - t0) * 1e6
            total += int(hd[:, 0].sum())
            all_unit = all_unit and bool(hd[:, 1].all())
            wrows = sum(units[i][1] - units[i][0] for i in idxs)
            for i in idxs:
                times[i] = worker_us[w] * (units[i][1] - units[i][0])                     / max(1, wrows)
        lo = jnp.concatenate(los) if len(los) > 1 else los[0]
        hi = jnp.concatenate(his) if len(his) > 1 else his[0]
        ss = sync_stats(worker_us)
        self.stats.probe_schedule = {
            "policy": policy,
            "units": [(a, b - a, us)
                      for (a, b), us in zip(units, times)],
            "worker_micros": worker_us,
            "imbalance": ss["imbalance"],
        }
        return lo, hi, total, all_unit

    def probe(self, parts: PartitionedTable) -> Table:
        """ProbeIsPart walks this worker's partitions; ProbeSteal
        cost-balances chunks across workers (probe.inl:18-52).  Both
        policies EXECUTE per schedule unit with measured per-unit timings
        (_scheduled_probe); ProbeIsNotPart runs the whole probe as one
        fused program."""
        table = parts.table
        probe_keys = jnp.asarray(table.key_column(self.ja2))
        n = int(probe_keys.shape[0])
        self.stats.probe_rows = table.num_rows

        if (self.partition_probe or self.steal) and n:
            lo, hi, total, all_unit = self._scheduled_probe(parts,
                                                            probe_keys, n)
            # predicted per-partition costs stay observable alongside the
            # measured schedule (the old stats surface); one jitted
            # program — eagerly-dispatched int64 cumsums here pinned 4 GB
            # of temporaries through the emit at reference scale
            starts = jnp.asarray(np.asarray(parts.offsets, np.int64))
            ends = starts + jnp.asarray(np.asarray(parts.sizes, np.int64))
            self.stats.partition_probe_costs = np.asarray(
                _partition_costs(lo, hi, starts, ends))
        else:
            lo, hi, total, all_unit = self._bounds(probe_keys)

        if self.storage == "copy":
            payload_cols = self._build_payload
        else:
            # late materialization: emit gathers through the row pointers
            payload_cols = [jnp.asarray(self._build_table.column(c))[self._build_perm]
                            for c in self.sel1]
        return self._emit(table, lo, hi, total, payload_cols,
                          unit_counts=all_unit)


# ---------------------------------------------------------------------------
# NestedLoops (algo/nl.cpp)
# ---------------------------------------------------------------------------

class NestedLoops(BaseJoiner):
    """Blocked all-pairs equi-join (algo/nl.cpp joinPagePage1).  Kept for the
    small/unhashable case and as the brute-force oracle: build tiles stream
    through VMEM against the whole probe vector; counts and emit positions
    are exact.  O(|R|·|S|) — use only for small inputs."""

    def __init__(self, output_page_size: int = 1 << 20, tile: int = 4096):
        super().__init__(None, output_page_size)
        self.tile = tile

    def build(self, parts: PartitionedTable) -> None:
        self._build_table = parts.table
        self.stats.build_rows = parts.table.num_rows

    def probe(self, parts: PartitionedTable) -> Table:
        table = parts.table
        bkeys = jnp.asarray(self._build_table.key_column(self.ja1)).astype(jnp.int64)
        pkeys = jnp.asarray(table.key_column(self.ja2)).astype(jnp.int64)
        self.stats.probe_rows = table.num_rows
        # order-insensitive: sort the build side once, reuse the searchsorted
        # kernel — the blocked compare loop of nl.cpp computes the same set;
        # on TPU the sorted formulation is the speed-of-light one, and the
        # tiled compare survives below as the count cross-check in debug.
        order = jnp.argsort(bkeys, stable=True)
        skeys = bkeys[order]
        self._pkeys_cache = pkeys
        lo, hi, total = _match_bounds(skeys, pkeys)
        payload_cols = [jnp.asarray(self._build_table.column(c))[order]
                        for c in self.sel1]
        return self._emit(table, lo, hi, int(total), payload_cols)

    def brute_count(self) -> int:
        """Tiled all-pairs count — the literal nl.cpp loop, for validation."""
        bkeys = jnp.asarray(self._build_table.key_column(self.ja1)).astype(jnp.int64)
        total = jnp.zeros((), jnp.int64)
        # pad build side to tile multiple with a sentinel no key can equal
        pad = (-bkeys.shape[0]) % self.tile
        bp = jnp.pad(bkeys, (0, pad), constant_values=jnp.iinfo(jnp.int64).min)
        pkeys = getattr(self, "_pkeys_cache", None)
        if pkeys is None:
            raise RuntimeError("call probe() first")
        def body(carry, tile_keys):
            return carry + jnp.sum(
                (tile_keys[None, :] == pkeys[:, None]).astype(jnp.int64)), None
        total, _ = jax.lax.scan(body, total, bp.reshape(-1, self.tile))
        return int(total)


# ---------------------------------------------------------------------------
# FlatMemoryJoiner (algo/flatmem.cpp)
# ---------------------------------------------------------------------------

class FlatMemoryJoiner(BaseJoiner):
    """Radix flat-array build + histogram-range probe (flatmem.cpp:70-177).

    The build *is* the radix partitioner's output (build() just runs the
    final split, flatmem.cpp:104-109); probe finds each key's bucket range
    from the inclusive histogram (bstart = hist[b-1], bitems = hist[b] -
    bstart) and scans it.  Here the radix-partitioned flat array is sorted
    within partitions, so the range scan is a bucket-masked searchsorted:
    composite (bucket << 32 | key) makes both steps one binary search.
    """

    def __init__(self, hashfn: HashFunction,
                 partitioner: RadixPartitioner,
                 output_page_size: int = 1 << 20):
        super().__init__(hashfn, output_page_size)
        self.partitioner = partitioner

    def init(self, schema1, select1, jattr1, schema2, select2, jattr2):
        # reference asserts jattr1 == first column and select = rest
        # (flatmem.cpp:75-81); we support the general layout.
        super().init(schema1, select1, jattr1, schema2, select2, jattr2)

    def build(self, parts: PartitionedTable) -> None:
        """parts must come from the RadixPartitioner (driver wires this);
        the flat array is its reordered table.

        Because bucket = hash(key) is a FUNCTION of the key, equal keys
        are contiguous in the (bucket, key)-sorted flat array — so for a
        dense bounded key range a start/count DIRECTORY over the keyspace
        (two int32 scatters at build) answers every probe with gathers,
        skipping the 272M-element int64 composite sort that exceeded the
        chip's HBM at reference scale.  Sparse/wide keys keep the
        composite path."""
        table = parts.table
        keys32 = jnp.asarray(table.key_column(self.ja1))
        keys = keys32.astype(jnp.int64)
        buckets = self.partitioner.hashfn.hash(
            table.key_column(self.ja1)).astype(jnp.int64)
        comp = (buckets << 32) | (keys & 0xFFFFFFFF)
        order = jnp.argsort(comp, stable=True)
        self._flat_comp = comp[order]
        self._order = order
        self._build_table = table
        self.stats.build_rows = table.num_rows
        self.stats.bucket_count = self.partitioner.hashfn.buckets
        self._flat_dir = None
        if table.num_rows:
            st = np.asarray(_build_key_stats(keys32, jnp.zeros((1,),
                                                               jnp.int32)))
            kmin, kmax = int(st[1]), int(st[2])
            if 0 <= kmin and kmax < _DENSE_LIMIT \
                    and kmax < max(16 * table.num_rows, 1 << 20):
                tbl_len = next_pow2(kmax + 2)
                kf = keys32.astype(jnp.int32)[order]
                self._flat_dir = _flat_directory(
                    kf, jnp.zeros((tbl_len,), jnp.int32))

    def probe(self, parts: PartitionedTable) -> Table:
        table = parts.table
        self.stats.probe_rows = table.num_rows
        payload_cols = [jnp.asarray(self._build_table.column(c))[self._order]
                        for c in self.sel1]
        if self._flat_dir is not None:
            pkeys32 = jnp.asarray(table.key_column(self.ja2))
            lo, hi, head = _flat_dense_bounds(*self._flat_dir, pkeys32)
            tot = np.asarray(head)
            return self._emit(table, lo, hi, int(tot[0]), payload_cols,
                              unit_counts=bool(tot[1]))
        pkeys = jnp.asarray(table.key_column(self.ja2)).astype(jnp.int64)
        pbuckets = self.partitioner.hashfn.hash(
            table.key_column(self.ja2)).astype(jnp.int64)
        pcomp = (pbuckets << 32) | (pkeys & 0xFFFFFFFF)
        lo, hi, total = _match_bounds(self._flat_comp, pcomp)
        return self._emit(table, lo, hi, int(total), payload_cols)


# ---------------------------------------------------------------------------
# Factory (joinerfactory.cpp:23-75)
# ---------------------------------------------------------------------------

def joiner_factory(conf: dict, hashfn: HashFunction,
                   build_partitioner=None) -> BaseJoiner:
    """Instantiate the lattice from the conf's algorithm group:
    flatmem/copydata/partitionbuild/partitionprobe/steal strings, exactly the
    reference's dispatch (joinerfactory.cpp:28-70)."""
    algo = conf.get("algorithm", {})
    yes = lambda k, d="no": str(algo.get(k, d)).lower() == "yes"
    if yes("flatmem"):
        if not isinstance(build_partitioner, RadixPartitioner):
            raise ValueError("flatmem requires a radix build partitioner "
                             "(flatmem.cpp custominit)")
        return FlatMemoryJoiner(hashfn, build_partitioner)
    if str(algo.get("nestedloops", "no")).lower() == "yes":
        return NestedLoops()
    return HashJoiner(
        hashfn,
        storage="copy" if yes("copydata", "yes") else "pointer",
        partition_build=yes("partitionbuild"),
        partition_probe=yes("partitionprobe"),
        steal=yes("steal"),
        build_page_size=algo.get("buildpagesize", 32),
        nthreads=int(conf.get("threads", 1)),
    )
