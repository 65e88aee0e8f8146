"""Hash functions.

The reference uses three: the locality-preserving `(key/3) & mask`
(HTMHashBuild.hpp:122,180), identity `key & mask` (AtomicHashBuild.hpp:44,
NoCCHashBuild.hpp:43) and a Murmur 32-bit finalizer (include/DataGen.hpp:14-23,
defined but unused by the builds; we use it for device-level hash
partitioning where correlation with key order must be broken).
mc radix hashing is `(key & mask) >> skip` (mc/src/no_partitioning_join.c:65-67)
and per-pass digit extraction (mc/src/prj_params.h:76-78).
"""

from __future__ import annotations

import jax.numpy as jnp


def locality_hash(keys, mask):
    """(key / 3) & mask — consecutive keys share a 3-slot bucket
    (HTMHashBuild.hpp:122)."""
    return (keys // 3) & mask


def identity_hash(keys, mask):
    """key & mask (AtomicHashBuild.hpp:44)."""
    return keys & mask


def murmur32(keys):
    """Murmur3 32-bit finalizer (DataGen.hpp:14-23)."""
    h = keys.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h.astype(jnp.int32) & jnp.int32(0x7FFFFFFF)


def radix_digit(keys, shift, bits, *, hashed: bool = False):
    """Extract the radix digit for a partitioning pass
    (mc/src/prj_params.h:76-78; mc/src/parallel_radix_join.c:559-627)."""
    h = murmur32(keys) if hashed else keys
    return (h >> shift) & ((1 << bits) - 1)
