"""Tensor-parallel sharding rules for decoders (beyond-reference feature;
the reference has no TP anywhere — SURVEY.md §2.8).

Megatron-style partition over the ``tensor`` mesh axis, expressed purely as
NamedShardings on the stacked parameter tree — XLA GSPMD inserts the
all-reduces (o_proj/down_proj row-parallel outputs) over ICI:

- q/k/v_proj, gate/up (fc1)  [L, H, out] → shard output dim (head-parallel)
- o_proj, down_proj (fc2)    [L, in, H]  → shard input dim (row-parallel)
- q/k/v/fc1 biases           [L, out]    → shard with their output dim
- embed/lm_head                          → shard vocab dim
- norms / layernorm scale+bias           → replicated

Specs are derived from the actual parameter tree, so every decoder family
(llama/qwen2 with qkv biases, neox/phi/stablelm via models/gpt_decoder.py)
shards without per-family rules.  Pass ``fsdp_axis=True`` to co-shard the
other big dim over 'fsdp' (2D sharding).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1")
_ROW_PARALLEL = ("o_proj", "down_proj", "fc2")
_COL_BIAS = ("q_bias", "k_bias", "v_bias", "fc1_bias")


def _replicated_like(p):
    if isinstance(p, dict):
        return {k: _replicated_like(v) for k, v in p.items()}
    return P(*([None] * getattr(p, "ndim", 1)))


def decoder_tp_specs(params: dict, fsdp_axis: bool = False) -> dict:
    """PartitionSpec tree matching a stacked decoder param dict."""
    other = "fsdp" if fsdp_axis else None
    layers = {}
    for name, v in params["layers"].items():
        if name in _COL_PARALLEL:
            layers[name] = P(None, other, "tensor")
        elif name in _ROW_PARALLEL:
            layers[name] = P(None, "tensor", other)
        elif name in _COL_BIAS:
            layers[name] = P(None, "tensor")
        else:  # norms (arrays or {scale,bias} dicts), row-parallel biases
            layers[name] = _replicated_like(v)
    spec = {"layers": layers}
    for name, v in params.items():
        if name == "layers":
            continue
        if name == "embed_tokens":
            spec[name] = P("tensor", other)
        elif name == "lm_head":
            spec[name] = P(other, "tensor")
        elif name == "lm_head_bias":
            spec[name] = P("tensor")
        else:
            spec[name] = _replicated_like(v)
    return spec


def tp_shard_decoder(params: dict, mesh: Mesh, fsdp_axis: bool = False):
    """Place a decoder param tree with TP (+ optional fsdp) shardings."""
    specs = decoder_tp_specs(params, fsdp_axis)

    def place(p, spec):
        # absent params (tied lm_head, optional biases) stay None
        return None if p is None else jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs, is_leaf=lambda x: x is None)


def tp_degree_ok(cfg, tp: int) -> bool:
    """TP degree must divide kv heads and intermediate size."""
    return (
        cfg.num_kv_heads % tp == 0
        and cfg.num_heads % tp == 0
        and cfg.intermediate_size % tp == 0
        and cfg.vocab_size % tp == 0
    )
