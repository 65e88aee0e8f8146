"""Test configuration: run on CPU with a virtual 8-device mesh.

The reference had no tests at all (SURVEY.md §4); this suite implements its
embedded correctness methodology (conservation checksums, known-cardinality
match counts, fixed-seed determinism) as a real pytest suite, runnable
without TPU hardware.  Multi-device sharding tests use XLA's host-platform
device-count override — capability the single-node reference never had.

NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works.
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
