"""Expert parallelism over the ``expert`` mesh axis (beyond-reference;
pairs with the MoE decoder families — ops/moe.py, models/llama.py).

Pure sharding annotations, per the sharding-first TPU recipe: the expert-
stacked weights [L, E, in, out] are placed with the E dim over 'expert';
every MoE einsum carries the expert index, so GSPMD partitions dispatch,
expert FFN, and combine across the axis and inserts the collectives (the
combine contraction over e lowers to a reduce-scatter/all-reduce over ICI).
Each device holds — and computes — E/ep experts: weights, optimizer state,
and FLOPs all divide by ``mesh.expert`` with no manual all-to-alls.

Composes freely with data/fsdp (batch stays sharded over ('data','fsdp'))
and with tensor parallelism on the attention projections (different leaves).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_EXPERT_STACKED = ("gate_proj", "up_proj", "down_proj")


def ep_degree(mesh) -> int:
    try:
        return int(mesh.shape.get("expert", 1)) if mesh is not None else 1
    except AttributeError:
        return 1


def ep_shard_decoder(params: dict, mesh: Mesh):
    """Place a MoE decoder's expert stacks over the 'expert' axis.

    4-D [L, E, in, out] leaves (and their int8 QTensor {'q','s'} pairs, whose
    leading dims match) get P(None, 'expert', None, ...); everything else is
    left on its current placement (fsdp/TP on the attention projections is
    orthogonal).
    """
    def spec_for(leaf):
        nd = getattr(leaf, "ndim", 0)
        return P(None, "expert", *([None] * (nd - 2)))

    def place(leaf):
        if isinstance(leaf, dict):  # QTensor {'q','s'}
            return {k: place(v) for k, v in leaf.items()}
        if getattr(leaf, "ndim", 0) < 2:
            return leaf
        return jax.device_put(leaf, NamedSharding(mesh, spec_for(leaf)))

    layers = dict(params["layers"])
    for name in _EXPERT_STACKED:
        if name in layers and (
            isinstance(layers[name], dict) or getattr(layers[name], "ndim", 0) == 4
        ):
            layers[name] = place(layers[name])
    return dict(params, layers=layers)
