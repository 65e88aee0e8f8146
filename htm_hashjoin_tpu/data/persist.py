"""Relation persistence — the PERSIST_RELATIONS analog.

The reference can write generated relations to disk and reload them for
reproducible cross-run comparisons (mc/src/generator.c:25-26,211-224 write;
:255-257 load), and Wisconsin loads ``.tbl`` text files (table.cpp:198-204).
Here relations persist as ``.npz`` (fast binary) with a content-addressed
name derived from the generation parameters, so repeated harness runs at
reference scale skip regeneration — plus ``.tbl`` text for interchange with
the reference's own datagen files.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import JoinConfig
from ..relation import Relation


def cache_key(cfg: JoinConfig, side: str) -> str:
    """Stable name from the generation-relevant parameters (the reference
    encodes these in file names like 'S_256M_FK_M=16.tbl')."""
    fields = dict(side=side, dist=cfg.data_distr.value,
                  n=cfg.r_size if side == "r" else cfg.s_size,
                  distinct=cfg.distinct_keys, window=cfg.shuffle_range,
                  seed=cfg.seed, zipf=cfg.zipf_param, r_size=cfg.r_size)
    digest = hashlib.sha256(
        json.dumps(fields, sort_keys=True).encode()).hexdigest()[:12]
    return f"{side}_{cfg.data_distr.value}_{fields['n']}_{digest}"


def save_relation(rel: Relation, path: str) -> None:
    if path.endswith(".tbl"):
        keys = np.asarray(rel.keys)
        pay = (np.asarray(rel.payloads) if rel.payloads is not None
               else np.arange(1, keys.shape[0] + 1))
        with open(path, "w") as f:
            for k, p in zip(keys, pay):
                f.write(f"{k}|{p}\n")
        return
    arrays = {"keys": np.asarray(rel.keys)}
    if rel.payloads is not None:
        arrays["payloads"] = np.asarray(rel.payloads)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_relation(path: str) -> Relation:
    if path.endswith(".tbl"):
        data = np.loadtxt(path, delimiter="|", dtype=np.int64, ndmin=2)
        return Relation(jnp.asarray(data[:, 0], jnp.int32),
                        jnp.asarray(data[:, 1], jnp.int32))
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        keys = jnp.asarray(data["keys"])
        payloads = (jnp.asarray(data["payloads"])
                    if "payloads" in data.files else None)
    return Relation(keys, payloads)


def cached_relation(cfg: JoinConfig, side: str, cache_dir: str,
                    generate) -> Relation:
    """Load the relation for (cfg, side) from cache_dir, generating and
    persisting on miss (the PERSIST_RELATIONS read-through behavior,
    generator.c:211-257)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, cache_key(cfg, side) + ".npz")
    if os.path.exists(path):
        return load_relation(path)
    rel: Optional[Relation] = generate()
    save_relation(rel, path)
    return rel
