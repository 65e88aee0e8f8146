"""Device mesh construction.

The reference's parallel substrate is pinned pthreads + NUMA first-touch
(mc/src/cpu_mapping.c:54-81, generator.c:353-405 — SURVEY.md P12).  The TPU
equivalent is a jax.sharding.Mesh over ICI-connected chips; `cpu-mapping.txt`
becomes the mesh axis layout.  Multi-host pods extend the same mesh over DCN
(jax.distributed.initialize + jax.devices()), which the single-node reference
never had (SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, ...] = (), axis_names: Sequence[str] = ("x",)
              ) -> Mesh:
    """Build a mesh of the requested shape; () means all available devices
    on one axis."""
    devices = jax.devices()
    if not shape:
        shape = (len(devices),)
    n = math.prod(shape)
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[: len(shape)])


def shard_relation(keys: jax.Array, mesh: Mesh, axis: str = "x") -> jax.Array:
    """Place a key array row-sharded over the mesh axis (the distributed
    analog of the reference's static per-thread chunking,
    mc/src/no_partitioning_join.c:563-593)."""
    return jax.device_put(keys, NamedSharding(mesh, P(axis)))
