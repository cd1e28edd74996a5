"""HF-checkpoint bridge: stacked JAX pytrees ↔ HF safetensors state dicts.

The reference saves/loads HF-layout checkpoints everywhere
(mm/forget.py:73-115, mm/finetune.py:129-133); BASELINE.json requires the
on-disk layout to stay HF-compatible.  This module maps:

- our stacked decoder layers ``layers/{name}: [L, in, out]`` ↔ per-layer HF
  keys ``model.layers.{i}.self_attn.{q,k,v,o}_proj.weight`` (HF Linear
  weights are [out, in] → transposed);
- ViT tower ↔ ``vision_tower.vision_model.encoder.layers.{i}...`` CLIP keys;
- projector ↔ ``multi_modal_projector.linear_{1,2}``.

Works in both directions so real Llama-2/LLaVA checkpoints import once the
weights are on local disk.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x).T


# ---------------------------------------------------------------------------
# Llama decoder
# ---------------------------------------------------------------------------

_LLAMA_LAYER_MAP = {
    "q_proj": "self_attn.q_proj.weight",
    "k_proj": "self_attn.k_proj.weight",
    "v_proj": "self_attn.v_proj.weight",
    "o_proj": "self_attn.o_proj.weight",
    "gate_proj": "mlp.gate_proj.weight",
    "up_proj": "mlp.up_proj.weight",
    "down_proj": "mlp.down_proj.weight",
}
_LLAMA_NORM_MAP = {
    "input_layernorm": "input_layernorm.weight",
    "post_attention_layernorm": "post_attention_layernorm.weight",
}


def llama_to_hf(params: dict, prefix: str = "") -> dict:
    sd = {}
    sd[f"{prefix}model.embed_tokens.weight"] = np.asarray(params["embed_tokens"])
    sd[f"{prefix}model.norm.weight"] = np.asarray(params["norm"])
    sd[f"{prefix}lm_head.weight"] = _t(params["lm_head"])
    L = params["layers"]["q_proj"].shape[0]
    for i in range(L):
        for ours, hf in _LLAMA_LAYER_MAP.items():
            sd[f"{prefix}model.layers.{i}.{hf}"] = _t(params["layers"][ours][i])
        for ours, hf in _LLAMA_NORM_MAP.items():
            sd[f"{prefix}model.layers.{i}.{hf}"] = np.asarray(params["layers"][ours][i])
    return sd


def llama_from_hf(sd: dict, num_layers: int, prefix: str = "", dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[f"{prefix}{k}"], dtype)

    layers = {}
    for ours, hf in _LLAMA_LAYER_MAP.items():
        layers[ours] = np.stack(
            [g(f"model.layers.{i}.{hf}").T for i in range(num_layers)]
        )
    for ours, hf in _LLAMA_NORM_MAP.items():
        layers[ours] = np.stack([g(f"model.layers.{i}.{hf}") for i in range(num_layers)])
    return {
        "embed_tokens": g("model.embed_tokens.weight"),
        "layers": layers,
        "norm": g("model.norm.weight"),
        "lm_head": g("lm_head.weight").T,
    }


# ---------------------------------------------------------------------------
# CLIP ViT tower
# ---------------------------------------------------------------------------

_VIT_LAYER_MAP = {
    "q_proj": ("self_attn.q_proj.weight", True),
    "q_bias": ("self_attn.q_proj.bias", False),
    "k_proj": ("self_attn.k_proj.weight", True),
    "k_bias": ("self_attn.k_proj.bias", False),
    "v_proj": ("self_attn.v_proj.weight", True),
    "v_bias": ("self_attn.v_proj.bias", False),
    "o_proj": ("self_attn.out_proj.weight", True),
    "o_bias": ("self_attn.out_proj.bias", False),
    "fc1": ("mlp.fc1.weight", True),
    "fc1_bias": ("mlp.fc1.bias", False),
    "fc2": ("mlp.fc2.weight", True),
    "fc2_bias": ("mlp.fc2.bias", False),
}


def vit_to_hf(params: dict, patch_size: int, prefix: str = "vision_tower.vision_model.") -> dict:
    sd = {}
    # patch_embed [P·P·3, H] ← conv kernel [H, 3, P, P]
    pe = np.asarray(params["patch_embed"])
    H = pe.shape[1]
    P = patch_size
    sd[f"{prefix}embeddings.patch_embedding.weight"] = (
        pe.reshape(P, P, 3, H).transpose(3, 2, 0, 1)
    )
    sd[f"{prefix}embeddings.class_embedding"] = np.asarray(params["class_embed"])
    sd[f"{prefix}embeddings.position_embedding.weight"] = np.asarray(params["pos_embed"])
    sd[f"{prefix}pre_layrnorm.weight"] = np.asarray(params["pre_ln"]["scale"])
    sd[f"{prefix}pre_layrnorm.bias"] = np.asarray(params["pre_ln"]["bias"])
    sd[f"{prefix}post_layernorm.weight"] = np.asarray(params["post_ln"]["scale"])
    sd[f"{prefix}post_layernorm.bias"] = np.asarray(params["post_ln"]["bias"])
    L = params["layers"]["q_proj"].shape[0]
    for i in range(L):
        lp = params["layers"]
        for ours, (hf, transpose) in _VIT_LAYER_MAP.items():
            w = np.asarray(lp[ours][i])
            sd[f"{prefix}encoder.layers.{i}.{hf}"] = w.T if transpose else w
        for ln_ours, ln_hf in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            sd[f"{prefix}encoder.layers.{i}.{ln_hf}.weight"] = np.asarray(lp[ln_ours]["scale"][i])
            sd[f"{prefix}encoder.layers.{i}.{ln_hf}.bias"] = np.asarray(lp[ln_ours]["bias"][i])
    return sd


def vit_from_hf(sd: dict, num_layers: int, prefix: str = "vision_tower.vision_model.", dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[f"{prefix}{k}"], dtype)

    conv = g("embeddings.patch_embedding.weight")  # [H, 3, P, P]
    H, C, P, _ = conv.shape
    layers = {}
    for ours, (hf, transpose) in _VIT_LAYER_MAP.items():
        ws = [g(f"encoder.layers.{i}.{hf}") for i in range(num_layers)]
        layers[ours] = np.stack([w.T if transpose else w for w in ws])
    for ln_ours, ln_hf in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
        layers[ln_ours] = {
            "scale": np.stack([g(f"encoder.layers.{i}.{ln_hf}.weight") for i in range(num_layers)]),
            "bias": np.stack([g(f"encoder.layers.{i}.{ln_hf}.bias") for i in range(num_layers)]),
        }
    return {
        "patch_embed": conv.transpose(2, 3, 1, 0).reshape(P * P * C, H),
        "class_embed": g("embeddings.class_embedding").reshape(-1),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "pre_ln": {"scale": g("pre_layrnorm.weight"), "bias": g("pre_layrnorm.bias")},
        "post_ln": {"scale": g("post_layernorm.weight"), "bias": g("post_layernorm.bias")},
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# LLaVA assembly
# ---------------------------------------------------------------------------


def llava_to_hf(params: dict, patch_size: int) -> dict:
    sd = llama_to_hf(params["language_model"], prefix="language_model.")
    sd.update(vit_to_hf(params["vision_tower"], patch_size))
    pj = params["projector"]
    sd["multi_modal_projector.linear_1.weight"] = _t(pj["fc1"])
    sd["multi_modal_projector.linear_1.bias"] = np.asarray(pj["fc1_bias"])
    sd["multi_modal_projector.linear_2.weight"] = _t(pj["fc2"])
    sd["multi_modal_projector.linear_2.bias"] = np.asarray(pj["fc2_bias"])
    return sd


def llava_from_hf(sd: dict, decoder_layers: int, vit_layers: int, dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[k], dtype)

    return {
        "language_model": llama_from_hf(sd, decoder_layers, prefix="language_model.", dtype=dtype),
        "vision_tower": vit_from_hf(sd, vit_layers, dtype=dtype),
        "projector": {
            "fc1": g("multi_modal_projector.linear_1.weight").T,
            "fc1_bias": g("multi_modal_projector.linear_1.bias"),
            "fc2": g("multi_modal_projector.linear_2.weight").T,
            "fc2_bias": g("multi_modal_projector.linear_2.bias"),
        },
    }
