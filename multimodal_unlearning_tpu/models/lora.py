"""LoRA adapters over stacked-layer param trees.

Reference behavior: peft LoRA on every linear except lm_head
(utils.py:10-19, mm/finetune.py:91-101), r/alpha/dropout from config,
merge_and_unload before saving (mm/finetune.py:129-133).

Here the adapter tree mirrors the decoder's stacked layout — each target
projection gets ``a: [L, in, r]`` (gaussian) and ``b: [L, r, out]`` (zeros) —
and is applied inside the matmul (models/llama.py:dense).  ``merge`` folds
adapters into the dense weights for checkpoint export.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# every decoder linear except lm_head (reference drops lm_head: utils.py:16-17)
DEFAULT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def lora_scale(r: int, alpha: float) -> float:
    return alpha / r if r else 0.0


def init_lora(layer_params: dict, r: int, key, targets=DEFAULT_TARGETS, dtype=jnp.float32) -> dict:
    """Build adapters for the stacked ``layers`` subtree of a decoder."""
    adapters = {}
    keys = iter(jax.random.split(key, len(targets)))
    for name in targets:
        w = layer_params[name]
        if isinstance(w, dict):  # int8 QTensor base (QLoRA)
            w = w["q"]
        L, d_in, d_out = w.shape
        adapters[name] = {
            "a": (jax.random.normal(next(keys), (L, d_in, r)) * d_in**-0.5).astype(dtype),
            "b": jnp.zeros((L, r, d_out), dtype),
        }
    return {"layers": adapters}


def merge(params: dict, lora: dict, scale: float) -> dict:
    """merge_and_unload analog: fold adapters into dense weights.

    Handles an int8-quantized (QLoRA) base: QTensor leaves are dequantized to
    bf16 before folding, and the whole returned tree is dense (saveable) —
    reference merges via peft then saves dense (mm/forget.py:110-115)."""
    from multimodal_unlearning_tpu.utils.quantize import dequantize_tree

    lead = next(iter(lora.get("layers", {}).values()), None)
    dq_dtype = lead["b"].dtype if lead is not None else jnp.bfloat16
    merged = dequantize_tree(params, dq_dtype)
    merged_layers = dict(merged["layers"])
    for name, ab in lora.get("layers", {}).items():
        w = merged_layers[name]
        delta = jnp.einsum("lir,lro->lio", ab["a"].astype(jnp.float32), ab["b"].astype(jnp.float32))
        merged_layers[name] = (w.astype(jnp.float32) + scale * delta).astype(w.dtype)
    merged["layers"] = merged_layers
    return merged
