"""Sharding rules: ZeRO-style parameter/optimizer partitioning.

Replaces DeepSpeed ZeRO (reference: config/ds_config.json:2-21,
mm/trainer.py:130-162) with XLA-native sharding:

- ``fsdp_sharding(pytree, mesh)`` shards every large leaf's first
  fsdp-divisible dimension over the ``fsdp`` axis — applied to optimizer
  state it is ZeRO-1/2; applied to (teacher) params it is the ZeRO-3 analog
  (XLA inserts per-layer all-gathers during the forward).
- ``batch_sharding(mesh)`` splits the leading batch dim over
  ``('data','fsdp')`` so the global DP degree is data×fsdp.
- ``replicated(mesh)`` for small/irregular leaves.

All collectives are chosen by XLA from these annotations — no explicit
process-group API, per the sharding-first TPU recipe.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: sharding tiny tensors costs more
# in collective latency than it saves in HBM.
_MIN_SHARD_ELEMS = 2**14


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 0) -> NamedSharding:
    """Leading-dim batch sharding over the combined data-parallel axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def _fsdp_spec_for(shape: tuple[int, ...], fsdp_size: int) -> P:
    if fsdp_size == 1 or int(np.prod(shape)) < _MIN_SHARD_ELEMS:
        return P()
    # shard the largest divisible dim — maximizes memory savings and keeps
    # all-gather messages contiguous
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % fsdp_size == 0 and shape[d] >= fsdp_size:
            spec = [None] * len(shape)
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def fsdp_sharding(pytree, mesh: Mesh):
    """Per-leaf NamedSharding pytree for ZeRO-style partitioning."""
    fsdp_size = mesh.shape["fsdp"]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, _fsdp_spec_for(tuple(shape), fsdp_size))

    return jax.tree.map(leaf_sharding, pytree)


def shard_pytree(pytree, shardings):
    """Device-put a host pytree onto its shardings."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), pytree, shardings)
