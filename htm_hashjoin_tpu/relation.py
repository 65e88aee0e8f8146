"""Relation: the framework's table abstraction.

The reference's relations are flat `uint64_t*` key arrays (include/DataGen.hpp:26)
or `tuple_t {key, payload}` arrays (mc/src/types.h:30-46).  On TPU we keep a
structure-of-arrays layout — a key vector plus an optional payload vector —
because SoA is what vector units and HBM streaming want; the AoS tuple layout
of the reference exists for cache-line locality that has no TPU analog.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

KEY_DTYPE = jnp.int32
EMPTY = jnp.int32(0)  # keys are always >= 1 (generators emit 1..N), 0 marks empty slots


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Relation:
    """A join relation: int32 keys (values >= 1) and optional int32 payloads.

    mirrors relation_t (mc/src/types.h:41-46) with row ids implicit.
    ``assume_sorted`` is a generator-provided plan hint (S is constructed
    sorted for most driver distributions, main.cpp:93): sorted probe sides
    unlock the banded Pallas engine without a re-sort.
    """

    keys: jax.Array
    payloads: Optional[jax.Array] = None
    assume_sorted: bool = False

    @property
    def num_tuples(self) -> int:
        return int(self.keys.shape[0])

    def key_sum(self) -> int:
        """Exact Σ keys — the `inputSum` conservation oracle
        (HTMHashBuild.hpp:312-320)."""
        return int(jnp.sum(self.keys.astype(jnp.int64)))

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.keys)

    def fence(self) -> "Relation":
        """Host-sync the backing arrays (a one-element readback — on this
        platform ``block_until_ready`` does not fence; only a readback
        does).  Drivers call this after generation so the timed join phases
        exclude generator compute, matching the reference's timer placement
        (gettimeofday AFTER generate_data, main.cpp:113-118 vs
        HTMHashBuild.hpp:93-94) — without it JAX async dispatch would bill
        generation to the build phase."""
        if self.num_tuples:
            int(self.keys[0])
            if self.payloads is not None:
                int(self.payloads.reshape(-1)[0])
        return self

    def tree_flatten(self):
        return (self.keys, self.payloads), self.assume_sorted

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, assume_sorted=aux)


def next_pow2(v: int) -> int:
    """Smallest power of two >= v (HTMHashBuild.hpp:25-37 bit-twiddle analog)."""
    if v <= 1:
        return 1
    return 1 << (v - 1).bit_length()
