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
    moe = "router" in params["layers"]  # Mixtral MoE layer layout
    layer_map = (
        {k: v for k, v in _LLAMA_LAYER_MAP.items() if not k.endswith(("gate_proj", "up_proj", "down_proj"))}
        if moe else _LLAMA_LAYER_MAP
    )
    for i in range(L):
        for ours, hf in layer_map.items():
            sd[f"{prefix}model.layers.{i}.{hf}"] = _t(params["layers"][ours][i])
        if moe:
            # HF Mixtral: gate.weight [E,H]; experts.{e}.{w1,w3,w2} = gate/up/down
            sd[f"{prefix}model.layers.{i}.block_sparse_moe.gate.weight"] = _t(
                params["layers"]["router"][i])
            E = params["layers"]["gate_proj"].shape[1]
            for e in range(E):
                base = f"{prefix}model.layers.{i}.block_sparse_moe.experts.{e}"
                sd[f"{base}.w1.weight"] = _t(params["layers"]["gate_proj"][i, e])
                sd[f"{base}.w3.weight"] = _t(params["layers"]["up_proj"][i, e])
                sd[f"{base}.w2.weight"] = _t(params["layers"]["down_proj"][i, e])
        for ours, hf in _LLAMA_NORM_MAP.items():
            sd[f"{prefix}model.layers.{i}.{hf}"] = np.asarray(params["layers"][ours][i])
        for b in ("q", "k", "v"):  # Qwen2-style qkv biases, when present
            if f"{b}_bias" in params["layers"]:
                sd[f"{prefix}model.layers.{i}.self_attn.{b}_proj.bias"] = np.asarray(
                    params["layers"][f"{b}_bias"][i]
                )
    return sd


def llama_from_hf(
    sd: dict, num_layers: int, prefix: str = "", dtype=np.float32,
    qkv_bias: bool = False, num_experts: int = 0,
) -> dict:
    def g(k):
        return np.asarray(sd[f"{prefix}{k}"], dtype)

    layers = {}
    layer_map = (
        {k: v for k, v in _LLAMA_LAYER_MAP.items() if not k.endswith(("gate_proj", "up_proj", "down_proj"))}
        if num_experts else _LLAMA_LAYER_MAP
    )
    for ours, hf in layer_map.items():
        layers[ours] = np.stack(
            [g(f"model.layers.{i}.{hf}").T for i in range(num_layers)]
        )
    if num_experts:
        # Mixtral MoE: router [H,E]; expert stacks [L,E,in,out]
        layers["router"] = np.stack(
            [g(f"model.layers.{i}.block_sparse_moe.gate.weight").T for i in range(num_layers)]
        )
        for ours, w in (("gate_proj", "w1"), ("up_proj", "w3"), ("down_proj", "w2")):
            layers[ours] = np.stack([
                np.stack([
                    g(f"model.layers.{i}.block_sparse_moe.experts.{e}.{w}.weight").T
                    for e in range(num_experts)
                ])
                for i in range(num_layers)
            ])
    for ours, hf in _LLAMA_NORM_MAP.items():
        layers[ours] = np.stack([g(f"model.layers.{i}.{hf}") for i in range(num_layers)])
    if qkv_bias:
        for b in ("q", "k", "v"):
            layers[f"{b}_bias"] = np.stack(
                [g(f"model.layers.{i}.self_attn.{b}_proj.bias") for i in range(num_layers)]
            )
    embed = g("model.embed_tokens.weight")
    # tied lm_head (e.g. Qwen2-VL-2B): fall back to the embedding table
    head_key = f"{prefix}lm_head.weight"
    lm_head = np.asarray(sd[head_key], dtype).T if head_key in sd else embed.T.copy()
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": g("model.norm.weight"),
        "lm_head": lm_head,
    }


# ---------------------------------------------------------------------------
# GPT-NeoX (pythia) — fused query_key_value de-interleaved per head
# (HF layout: rows grouped per head as [q(d), k(d), v(d)]).
# Reference loads these families via AutoModelForCausalLM
# (nlp/finetune.py:96-98, config/model_config.yaml:36-47).
# ---------------------------------------------------------------------------


def neox_to_hf(params: dict, num_heads: int, prefix: str = "") -> dict:
    sd = {}
    sd[f"{prefix}gpt_neox.embed_in.weight"] = np.asarray(params["embed_tokens"])
    sd[f"{prefix}gpt_neox.final_layer_norm.weight"] = np.asarray(params["final_ln"]["scale"])
    sd[f"{prefix}gpt_neox.final_layer_norm.bias"] = np.asarray(params["final_ln"]["bias"])
    sd[f"{prefix}embed_out.weight"] = _t(params["lm_head"])
    lp = params["layers"]
    L, H = lp["q_proj"].shape[0], lp["q_proj"].shape[1]
    d = H // num_heads
    for i in range(L):
        base = f"{prefix}gpt_neox.layers.{i}"
        sd[f"{base}.input_layernorm.weight"] = np.asarray(lp["ln1"]["scale"][i])
        sd[f"{base}.input_layernorm.bias"] = np.asarray(lp["ln1"]["bias"][i])
        sd[f"{base}.post_attention_layernorm.weight"] = np.asarray(lp["ln2"]["scale"][i])
        sd[f"{base}.post_attention_layernorm.bias"] = np.asarray(lp["ln2"]["bias"][i])
        # interleave q/k/v back into the fused per-head layout
        qw, kw, vw = (_t(lp[n][i]) for n in ("q_proj", "k_proj", "v_proj"))  # [H, H]
        qkv = np.stack(
            [qw.reshape(num_heads, d, H), kw.reshape(num_heads, d, H), vw.reshape(num_heads, d, H)],
            axis=1,
        ).reshape(3 * H, H)
        sd[f"{base}.attention.query_key_value.weight"] = qkv
        qb, kb, vb = (np.asarray(lp[n][i]) for n in ("q_bias", "k_bias", "v_bias"))
        sd[f"{base}.attention.query_key_value.bias"] = np.stack(
            [qb.reshape(num_heads, d), kb.reshape(num_heads, d), vb.reshape(num_heads, d)], axis=1
        ).reshape(3 * H)
        sd[f"{base}.attention.dense.weight"] = _t(lp["o_proj"][i])
        sd[f"{base}.attention.dense.bias"] = np.asarray(lp["o_bias"][i])
        sd[f"{base}.mlp.dense_h_to_4h.weight"] = _t(lp["fc1"][i])
        sd[f"{base}.mlp.dense_h_to_4h.bias"] = np.asarray(lp["fc1_bias"][i])
        sd[f"{base}.mlp.dense_4h_to_h.weight"] = _t(lp["fc2"][i])
        sd[f"{base}.mlp.dense_4h_to_h.bias"] = np.asarray(lp["fc2_bias"][i])
    return sd


def neox_from_hf(sd: dict, num_layers: int, num_heads: int, prefix: str = "", dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[f"{prefix}{k}"], dtype)

    H = g("gpt_neox.embed_in.weight").shape[1]
    d = H // num_heads
    q_w, k_w, v_w, q_b, k_b, v_b = [], [], [], [], [], []
    ln1s, ln1b, ln2s, ln2b, o_w, o_b = [], [], [], [], [], []
    fc1_w, fc1_b, fc2_w, fc2_b = [], [], [], []
    for i in range(num_layers):
        base = f"gpt_neox.layers.{i}"
        qkv = g(f"{base}.attention.query_key_value.weight").reshape(num_heads, 3, d, H)
        q_w.append(qkv[:, 0].reshape(H, H).T)
        k_w.append(qkv[:, 1].reshape(H, H).T)
        v_w.append(qkv[:, 2].reshape(H, H).T)
        qkvb = g(f"{base}.attention.query_key_value.bias").reshape(num_heads, 3, d)
        q_b.append(qkvb[:, 0].reshape(H))
        k_b.append(qkvb[:, 1].reshape(H))
        v_b.append(qkvb[:, 2].reshape(H))
        ln1s.append(g(f"{base}.input_layernorm.weight"))
        ln1b.append(g(f"{base}.input_layernorm.bias"))
        ln2s.append(g(f"{base}.post_attention_layernorm.weight"))
        ln2b.append(g(f"{base}.post_attention_layernorm.bias"))
        o_w.append(g(f"{base}.attention.dense.weight").T)
        o_b.append(g(f"{base}.attention.dense.bias"))
        fc1_w.append(g(f"{base}.mlp.dense_h_to_4h.weight").T)
        fc1_b.append(g(f"{base}.mlp.dense_h_to_4h.bias"))
        fc2_w.append(g(f"{base}.mlp.dense_4h_to_h.weight").T)
        fc2_b.append(g(f"{base}.mlp.dense_4h_to_h.bias"))
    return {
        "embed_tokens": g("gpt_neox.embed_in.weight"),
        "layers": {
            "ln1": {"scale": np.stack(ln1s), "bias": np.stack(ln1b)},
            "ln2": {"scale": np.stack(ln2s), "bias": np.stack(ln2b)},
            "q_proj": np.stack(q_w), "q_bias": np.stack(q_b),
            "k_proj": np.stack(k_w), "k_bias": np.stack(k_b),
            "v_proj": np.stack(v_w), "v_bias": np.stack(v_b),
            "o_proj": np.stack(o_w), "o_bias": np.stack(o_b),
            "fc1": np.stack(fc1_w), "fc1_bias": np.stack(fc1_b),
            "fc2": np.stack(fc2_w), "fc2_bias": np.stack(fc2_b),
        },
        "final_ln": {
            "scale": g("gpt_neox.final_layer_norm.weight"),
            "bias": g("gpt_neox.final_layer_norm.bias"),
        },
        "lm_head": g("embed_out.weight").T,
    }


# ---------------------------------------------------------------------------
# Phi (phi-1_5)
# ---------------------------------------------------------------------------

_PHI_LINEAR_MAP = {
    "q_proj": ("self_attn.q_proj", "q_bias"),
    "k_proj": ("self_attn.k_proj", "k_bias"),
    "v_proj": ("self_attn.v_proj", "v_bias"),
    "o_proj": ("self_attn.dense", "o_bias"),
    "fc1": ("mlp.fc1", "fc1_bias"),
    "fc2": ("mlp.fc2", "fc2_bias"),
}


def phi_to_hf(params: dict, prefix: str = "") -> dict:
    sd = {}
    sd[f"{prefix}model.embed_tokens.weight"] = np.asarray(params["embed_tokens"])
    sd[f"{prefix}model.final_layernorm.weight"] = np.asarray(params["final_ln"]["scale"])
    sd[f"{prefix}model.final_layernorm.bias"] = np.asarray(params["final_ln"]["bias"])
    sd[f"{prefix}lm_head.weight"] = _t(params["lm_head"])
    sd[f"{prefix}lm_head.bias"] = np.asarray(params["lm_head_bias"])
    lp = params["layers"]
    L = lp["q_proj"].shape[0]
    for i in range(L):
        base = f"{prefix}model.layers.{i}"
        sd[f"{base}.input_layernorm.weight"] = np.asarray(lp["ln1"]["scale"][i])
        sd[f"{base}.input_layernorm.bias"] = np.asarray(lp["ln1"]["bias"][i])
        for ours, (hf, bias) in _PHI_LINEAR_MAP.items():
            sd[f"{base}.{hf}.weight"] = _t(lp[ours][i])
            sd[f"{base}.{hf}.bias"] = np.asarray(lp[bias][i])
    return sd


def phi_from_hf(sd: dict, num_layers: int, prefix: str = "", dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[f"{prefix}{k}"], dtype)

    layers = {
        "ln1": {
            "scale": np.stack([g(f"model.layers.{i}.input_layernorm.weight") for i in range(num_layers)]),
            "bias": np.stack([g(f"model.layers.{i}.input_layernorm.bias") for i in range(num_layers)]),
        }
    }
    for ours, (hf, bias) in _PHI_LINEAR_MAP.items():
        layers[ours] = np.stack(
            [g(f"model.layers.{i}.{hf}.weight").T for i in range(num_layers)]
        )
        layers[bias] = np.stack(
            [g(f"model.layers.{i}.{hf}.bias") for i in range(num_layers)]
        )
    return {
        "embed_tokens": g("model.embed_tokens.weight"),
        "layers": layers,
        "final_ln": {
            "scale": g("model.final_layernorm.weight"),
            "bias": g("model.final_layernorm.bias"),
        },
        "lm_head": g("lm_head.weight").T,
        "lm_head_bias": g("lm_head.bias"),
    }


# ---------------------------------------------------------------------------
# StableLM (3b-4e1t): llama layout + LayerNorm biases, no linear biases
# ---------------------------------------------------------------------------


def stablelm_to_hf(params: dict, prefix: str = "") -> dict:
    sd = {}
    sd[f"{prefix}model.embed_tokens.weight"] = np.asarray(params["embed_tokens"])
    sd[f"{prefix}model.norm.weight"] = np.asarray(params["final_ln"]["scale"])
    sd[f"{prefix}model.norm.bias"] = np.asarray(params["final_ln"]["bias"])
    sd[f"{prefix}lm_head.weight"] = _t(params["lm_head"])
    lp = params["layers"]
    L = lp["q_proj"].shape[0]
    for i in range(L):
        base = f"{prefix}model.layers.{i}"
        sd[f"{base}.input_layernorm.weight"] = np.asarray(lp["ln1"]["scale"][i])
        sd[f"{base}.input_layernorm.bias"] = np.asarray(lp["ln1"]["bias"][i])
        sd[f"{base}.post_attention_layernorm.weight"] = np.asarray(lp["ln2"]["scale"][i])
        sd[f"{base}.post_attention_layernorm.bias"] = np.asarray(lp["ln2"]["bias"][i])
        for ours, hf in _LLAMA_LAYER_MAP.items():
            sd[f"{base}.{hf}"] = _t(lp[ours][i])
    return sd


def stablelm_from_hf(sd: dict, num_layers: int, prefix: str = "", dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[f"{prefix}{k}"], dtype)

    layers = {}
    for ours, hf in _LLAMA_LAYER_MAP.items():
        layers[ours] = np.stack(
            [g(f"model.layers.{i}.{hf}").T for i in range(num_layers)]
        )
    for ln_ours, ln_hf in (("ln1", "input_layernorm"), ("ln2", "post_attention_layernorm")):
        layers[ln_ours] = {
            "scale": np.stack([g(f"model.layers.{i}.{ln_hf}.weight") for i in range(num_layers)]),
            "bias": np.stack([g(f"model.layers.{i}.{ln_hf}.bias") for i in range(num_layers)]),
        }
    return {
        "embed_tokens": g("model.embed_tokens.weight"),
        "layers": layers,
        "final_ln": {"scale": g("model.norm.weight"), "bias": g("model.norm.bias")},
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
# Qwen2-VL (published flat layout: text under "model.", tower under "visual.")
# ---------------------------------------------------------------------------

_QWEN_VIT_QKV = ("q", "k", "v")


def qwen2vl_to_hf(params: dict) -> dict:
    sd = llama_to_hf(params["language_model"])
    vt = params["vision_tower"]
    bp = vt["blocks"]
    L, E = bp["q_proj"].shape[0], bp["q_proj"].shape[1]
    v25 = "gate" in bp  # Qwen2.5-VL tower: RMS norms + biased SwiGLU MLP
    pe = np.asarray(vt["patch_embed"])  # [patch_dim, E]
    # conv3d kernel [E, 3, T, P, P] ← patch vector order (c, t, ph, pw)
    patch_dim = pe.shape[0]
    sd["visual.patch_embed.proj.weight"] = pe.T.reshape(E, 3, 2, -1).reshape(
        E, 3, 2, int(np.sqrt(patch_dim // 6)), int(np.sqrt(patch_dim // 6))
    )
    for i in range(L):
        base = f"visual.blocks.{i}"
        sd[f"{base}.norm1.weight"] = np.asarray(bp["ln1"]["scale"][i])
        sd[f"{base}.norm2.weight"] = np.asarray(bp["ln2"]["scale"][i])
        if not v25:
            sd[f"{base}.norm1.bias"] = np.asarray(bp["ln1"]["bias"][i])
            sd[f"{base}.norm2.bias"] = np.asarray(bp["ln2"]["bias"][i])
        sd[f"{base}.attn.qkv.weight"] = np.concatenate(
            [_t(bp[f"{n}_proj"][i]) for n in _QWEN_VIT_QKV], axis=0
        )
        sd[f"{base}.attn.qkv.bias"] = np.concatenate(
            [np.asarray(bp[f"{n}_bias"][i]) for n in _QWEN_VIT_QKV], axis=0
        )
        sd[f"{base}.attn.proj.weight"] = _t(bp["o_proj"][i])
        sd[f"{base}.attn.proj.bias"] = np.asarray(bp["o_bias"][i])
        if v25:
            for ours, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                sd[f"{base}.mlp.{hf}.weight"] = _t(bp[ours][i])
                sd[f"{base}.mlp.{hf}.bias"] = np.asarray(bp[f"{ours}_bias"][i])
        else:
            sd[f"{base}.mlp.fc1.weight"] = _t(bp["fc1"][i])
            sd[f"{base}.mlp.fc1.bias"] = np.asarray(bp["fc1_bias"][i])
            sd[f"{base}.mlp.fc2.weight"] = _t(bp["fc2"][i])
            sd[f"{base}.mlp.fc2.bias"] = np.asarray(bp["fc2_bias"][i])
    m = vt["merger"]
    sd["visual.merger.ln_q.weight"] = np.asarray(m["ln_q"]["scale"])
    if not v25:
        sd["visual.merger.ln_q.bias"] = np.asarray(m["ln_q"]["bias"])
    sd["visual.merger.mlp.0.weight"] = _t(m["fc1"])
    sd["visual.merger.mlp.0.bias"] = np.asarray(m["fc1_bias"])
    sd["visual.merger.mlp.2.weight"] = _t(m["fc2"])
    sd["visual.merger.mlp.2.bias"] = np.asarray(m["fc2_bias"])
    return sd


def qwen2vl_from_hf(sd: dict, decoder_layers: int, vision_depth: int, dtype=np.float32) -> dict:
    def g(k):
        return np.asarray(sd[k], dtype)

    conv = g("visual.patch_embed.proj.weight")  # [E, 3, T, P, P]
    E = conv.shape[0]
    v25 = "visual.blocks.0.mlp.gate_proj.weight" in sd  # Qwen2.5-VL tower
    if v25:
        blocks = {
            "ln1": {"scale": np.stack(
                [g(f"visual.blocks.{i}.norm1.weight") for i in range(vision_depth)])},
            "ln2": {"scale": np.stack(
                [g(f"visual.blocks.{i}.norm2.weight") for i in range(vision_depth)])},
        }
    else:
        blocks = {
            "ln1": {
                "scale": np.stack([g(f"visual.blocks.{i}.norm1.weight") for i in range(vision_depth)]),
                "bias": np.stack([g(f"visual.blocks.{i}.norm1.bias") for i in range(vision_depth)]),
            },
            "ln2": {
                "scale": np.stack([g(f"visual.blocks.{i}.norm2.weight") for i in range(vision_depth)]),
                "bias": np.stack([g(f"visual.blocks.{i}.norm2.bias") for i in range(vision_depth)]),
            },
        }
    for j, n in enumerate(_QWEN_VIT_QKV):
        blocks[f"{n}_proj"] = np.stack(
            [g(f"visual.blocks.{i}.attn.qkv.weight")[j * E:(j + 1) * E].T for i in range(vision_depth)]
        )
        blocks[f"{n}_bias"] = np.stack(
            [g(f"visual.blocks.{i}.attn.qkv.bias")[j * E:(j + 1) * E] for i in range(vision_depth)]
        )
    blocks["o_proj"] = np.stack(
        [g(f"visual.blocks.{i}.attn.proj.weight").T for i in range(vision_depth)]
    )
    blocks["o_bias"] = np.stack(
        [g(f"visual.blocks.{i}.attn.proj.bias") for i in range(vision_depth)]
    )
    mlp_names = (
        (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj"))
        if v25 else (("fc1", "fc1"), ("fc2", "fc2"))
    )
    for ours, hf in mlp_names:
        blocks[ours] = np.stack(
            [g(f"visual.blocks.{i}.mlp.{hf}.weight").T for i in range(vision_depth)]
        )
        blocks[f"{ours}_bias"] = np.stack(
            [g(f"visual.blocks.{i}.mlp.{hf}.bias") for i in range(vision_depth)]
        )
    ln_q = {"scale": g("visual.merger.ln_q.weight")}
    if not v25:
        ln_q["bias"] = g("visual.merger.ln_q.bias")
    return {
        "language_model": llama_from_hf(sd, decoder_layers, qkv_bias=True, dtype=dtype),
        "vision_tower": {
            "patch_embed": conv.reshape(E, -1).T,
            "blocks": blocks,
            "merger": {
                "ln_q": ln_q,
                "fc1": g("visual.merger.mlp.0.weight").T,
                "fc1_bias": g("visual.merger.mlp.0.bias"),
                "fc2": g("visual.merger.mlp.2.weight").T,
                "fc2_bias": g("visual.merger.mlp.2.bias"),
            },
        },
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
