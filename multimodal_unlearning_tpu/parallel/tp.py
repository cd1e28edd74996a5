"""Tensor-parallel sharding rules for the decoder (beyond-reference feature;
the reference has no TP anywhere — SURVEY.md §2.8).

Megatron-style partition over the ``tensor`` mesh axis, expressed purely as
NamedShardings on the stacked parameter tree — XLA GSPMD inserts the
all-reduces (o_proj/down_proj row-parallel outputs) over ICI:

- q/k/v_proj [L, H, heads·D]  → shard output dim (head-parallel)
- o_proj     [L, heads·D, H]  → shard input dim (row-parallel)
- gate/up    [L, H, I]        → shard output dim
- down_proj  [L, I, H]        → shard input dim
- embed/lm_head               → shard vocab dim
- norms                       → replicated

Composes with the fsdp axis: pass ``fsdp_axis=True`` to co-shard the other
big dim over 'fsdp' (2D sharding).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")  # shard dim 2
_ROW_PARALLEL = ("o_proj", "down_proj")                                  # shard dim 1


def decoder_tp_specs(fsdp_axis: bool = False) -> dict:
    """PartitionSpec tree for a stacked llama param dict."""
    other = "fsdp" if fsdp_axis else None
    layers = {}
    for name in _COL_PARALLEL:
        layers[name] = P(None, other, "tensor")
    for name in _ROW_PARALLEL:
        layers[name] = P(None, "tensor", other)
    layers["input_layernorm"] = P(None, None)
    layers["post_attention_layernorm"] = P(None, None)
    return {
        "embed_tokens": P("tensor", other),
        "layers": layers,
        "norm": P(None),
        "lm_head": P(other, "tensor"),
    }


def tp_shard_decoder(params: dict, mesh: Mesh, fsdp_axis: bool = False):
    """Place a decoder param tree with TP (+ optional fsdp) shardings."""
    specs = decoder_tp_specs(fsdp_axis)

    def place(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)


def tp_degree_ok(cfg, tp: int) -> bool:
    """TP degree must divide kv heads and intermediate size."""
    return (
        cfg.num_kv_heads % tp == 0
        and cfg.num_heads % tp == 0
        and cfg.intermediate_size % tp == 0
        and cfg.vocab_size % tp == 0
    )
