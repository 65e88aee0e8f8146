"""htm_hashjoin_tpu — a TPU-native in-memory equi-join framework.

A from-scratch re-design of the capability surface of the reference
HTM-HashJoin testbed (anilshanbhag/HTM-HashJoin): four families of join
algorithms (optimistic direct-scatter "HTM" build, claim-based linear-probing
"atomic" build, racy last-writer-wins "NoCC" build, sort-merge), a parallel
radix join engine, a Wisconsin-style policy-lattice joiner, synthetic data
generators, a locality-adaptive planner, conservation-checksum validation and
JSON-line metrics — all expressed as conflict-free data-parallel JAX/XLA/Pallas
programs instead of hardware-transactional-memory / atomics / latches.

Key idea: on a CPU the reference needs HTM transactions (HTMHashBuild.hpp:174-187),
CAS loops (AtomicHashBuild.hpp:43-64) and per-bucket latches
(mc/src/no_partitioning_join.c:383-439) purely to make concurrent scatter safe.
A TPU is an SPMD machine with no cache-coherent shared mutable state, so the
same operator surface is reached with:

  * optimistic scatter + gather-back collision detection  (the HTM analog)
  * iterative claim-table insertion                       (the CAS analog)
  * plain last-writer-wins scatter                        (the NoCC analog)
  * radix histogram -> prefix scan -> stable reorder      (the PRJ analog)
  * sorted-merge / partitioned binary search              (probe / sort-merge)

int64 support is required for conservation checksums (sum of 2^27 keys
overflows int32); we enable jax x64 at import time.  All hot-path arrays are
explicitly int32.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the banded megakernels take tens of seconds
# of Mosaic compile time; caching makes every CLI/harness process after the
# first start warm.  Opt out with HTM_HASHJOIN_NO_COMPILE_CACHE=1.
if not os.environ.get("HTM_HASHJOIN_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "htm_hashjoin_tpu",
                     "xla"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass

from .version import __version__  # noqa: E402
from .relation import Relation  # noqa: E402
from .config import JoinConfig, Distribution, Algo  # noqa: E402
from .data import generators  # noqa: E402
from .joins import (  # noqa: E402
    nocc_join,
    atomic_join,
    htm_join,
    radix_join,
    sortmerge_join,
    npo_join,
    adaptive_join,
)

__all__ = [
    "__version__",
    "Relation",
    "JoinConfig",
    "Distribution",
    "Algo",
    "generators",
    "nocc_join",
    "atomic_join",
    "htm_join",
    "radix_join",
    "sortmerge_join",
    "npo_join",
    "adaptive_join",
]
