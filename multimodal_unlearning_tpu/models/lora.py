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
        w = layer_params.get(name)
        if w is None:
            continue
        q4 = isinstance(w, dict) and "q4" in w
        if isinstance(w, dict):  # int8/int4 QTensor base (QLoRA)
            w = w["q4"] if q4 else w["q"]
        if w.ndim != 3:
            # MoE expert stacks [L,E,in,out] are not LoRA targets: top-k
            # routing shows each expert ~k/E of the tokens, so the
            # unlearning signal concentrates in the (adapted) attention
            # projections; the router stays frozen (no reference analog)
            continue
        L, d_in, d_out = w.shape
        if q4:  # nibble-packed contracting dim: physical in/2
            d_in *= 2
        adapters[name] = {
            "a": (jax.random.normal(next(keys), (L, d_in, r)) * d_in**-0.5).astype(dtype),
            "b": jnp.zeros((L, r, d_out), dtype),
        }
    return {"layers": adapters}


# the reference's find_all_linear_names also catches the VLM projector
# (multi_modal_projector.linear_1/linear_2 / the Qwen merger MLP) — every
# linear except lm_head gets an adapter (utils.py:10-19, mm/finetune.py:91-101)
PROJECTOR_TARGETS = ("fc1", "fc2")


def init_flat_lora(flat_params: dict, r: int, key, targets=PROJECTOR_TARGETS, dtype=jnp.float32) -> dict:
    """Adapters for unstacked 2-D linears (the VLM projector/merger MLP)."""
    adapters = {}
    keys = iter(jax.random.split(key, len(targets)))
    for name in targets:
        w = flat_params[name]
        q4 = isinstance(w, dict) and "q4" in w
        if isinstance(w, dict):
            w = w["q4"] if q4 else w["q"]
        d_in, d_out = w.shape
        if q4:  # nibble-packed contracting dim: physical in/2
            d_in *= 2
        adapters[name] = {
            "a": (jax.random.normal(next(keys), (d_in, r)) * d_in**-0.5).astype(dtype),
            "b": jnp.zeros((r, d_out), dtype),
        }
    return adapters


def _projector_site(params: dict):
    """Locate the projector subtree: LLaVA keeps it at params['projector'],
    Qwen2-VL inside the tower as params['vision_tower']['merger']."""
    if "projector" in params:
        return ("projector",)
    vt = params.get("vision_tower")
    if isinstance(vt, dict) and "merger" in vt:
        return ("vision_tower", "merger")
    return None


def init_model_lora(params: dict, r: int, key, *, projector: bool = True, dtype=jnp.float32) -> dict:
    """Full-model adapter tree (reference: every linear except lm_head).

    Decoder-only params get the stacked layer adapters; VLM params (with a
    'language_model' subtree) additionally get projector/merger adapters under
    the 'projector' key unless ``projector=False``."""
    if "language_model" not in params:
        return init_lora(params["layers"], r, key, dtype=dtype)
    k1, k2 = jax.random.split(key)
    adapters = {"language_model": init_lora(params["language_model"]["layers"], r, k1, dtype=dtype)}
    site = _projector_site(params) if projector else None
    if site is not None:
        node = params
        for k in site:
            node = node[k]
        adapters["projector"] = init_flat_lora(node, r, k2, dtype=dtype)
    return adapters


def stack_adapters(trees: list, scales: list) -> dict:
    """Stack same-structure adapter trees into ONE multi-adapter bank for
    per-row serving (models/llama.py:apply_lora_delta with ``lora_ids``;
    apply with ``lora_scale=1.0`` — each adapter's own alpha/r scale is
    folded into its ``b`` here).

    Decoder layer leaves [L,in,r] stack to [L,A,in,r] (axis 1: the layer
    scan still slices L); flat projector leaves [in,r] stack to [A,in,r]."""
    scaled = [
        jax.tree_util.tree_map_with_path(
            lambda p, x, s=s: x * s if p[-1].key == "b" else x, t)
        for t, s in zip(trees, scales)
    ]
    return jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=1 if xs[0].ndim == 3 else 0), *scaled)


def merge_flat(flat_params: dict, lora: dict, scale: float) -> dict:
    """Fold flat (2-D) adapters into their dense weights."""
    out = dict(flat_params)
    for name, ab in lora.items():
        w = out[name]
        # promote, never demote: bf16 adapters fold in f32, f64 stays f64
        acc = jnp.promote_types(ab["a"].dtype, jnp.float32)
        delta = ab["a"].astype(acc) @ ab["b"].astype(acc)
        out[name] = (w.astype(acc) + scale * delta).astype(w.dtype)
    return out


def merge_model(params: dict, adapters: dict, scale: float) -> dict:
    """Model-level merge_and_unload: decoder layers + projector adapters."""
    if "language_model" not in adapters:
        return merge(params, adapters, scale)
    out = dict(params, language_model=merge(params["language_model"], adapters["language_model"], scale))
    proj = adapters.get("projector")
    if proj:
        site = _projector_site(out)
        if site == ("projector",):
            out["projector"] = merge_flat(out["projector"], proj, scale)
        elif site is not None:
            vt = dict(out["vision_tower"])
            vt["merger"] = merge_flat(vt["merger"], proj, scale)
            out["vision_tower"] = vt
    return out


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
        # promote, never demote: bf16 adapters fold in f32, f64 stays f64
        acc = jnp.promote_types(ab["a"].dtype, jnp.float32)
        delta = jnp.einsum("lir,lro->lio", ab["a"].astype(acc), ab["b"].astype(acc))
        merged_layers[name] = (w.astype(acc) + scale * delta).astype(w.dtype)
    merged["layers"] = merged_layers
    return merged
