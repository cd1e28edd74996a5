"""CLIP-style ViT vision tower (pre-LN, quick-GELU, CLS token).

The reference's vision tower arrives frozen inside HF LLaVA/Qwen-VL
(config/model_config.yaml:59-79, vision freeze at mm/finetune.py:104-105).
This is a from-scratch functional ViT matching CLIP-ViT-L/14-336 semantics:

- patchify as a *reshape + matmul* (not conv) — lands directly on the MXU;
- stacked layers under ``lax.scan`` with feature capture at
  ``vision_feature_layer`` (LLaVA uses -2: hidden state before the last
  block, HF CLIPVisionTransformer semantics);
- sequence padded to a flash-block multiple (577 is prime) with a validity
  mask, unpadded after the encoder.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.ops.attention import flash_attention


@dataclass(frozen=True)
class VitConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    patch_size: int
    image_size: int
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # CLS

    @classmethod
    def from_registry(cls, arch) -> "VitConfig":
        return cls(
            hidden_size=int(arch["hidden_size"]),
            intermediate_size=int(arch["intermediate_size"]),
            num_layers=int(arch["num_layers"]),
            num_heads=int(arch["num_heads"]),
            patch_size=int(arch["patch_size"]),
            image_size=int(arch["image_size"]),
            layer_norm_eps=float(arch.get("layer_norm_eps", 1e-5)),
        )


def init_params(cfg: VitConfig, key, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 12))
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    p3 = cfg.patch_size * cfg.patch_size * 3

    def w_init(key, shape):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(shape[-2] ** -0.5, dtype)

    def ln(shape=(L, h)):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "patch_embed": w_init(next(keys), (p3, h)),
        "class_embed": (jax.random.normal(next(keys), (h,)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(next(keys), (cfg.seq_len, h)) * 0.02).astype(dtype),
        "pre_ln": ln((h,)),
        "layers": {
            "ln1": ln(),
            "q_proj": w_init(next(keys), (L, h, h)),
            "q_bias": jnp.zeros((L, h), dtype),
            "k_proj": w_init(next(keys), (L, h, h)),
            "k_bias": jnp.zeros((L, h), dtype),
            "v_proj": w_init(next(keys), (L, h, h)),
            "v_bias": jnp.zeros((L, h), dtype),
            "o_proj": w_init(next(keys), (L, h, h)),
            "o_bias": jnp.zeros((L, h), dtype),
            "ln2": ln(),
            "fc1": w_init(next(keys), (L, h, i)),
            "fc1_bias": jnp.zeros((L, i), dtype),
            "fc2": w_init(next(keys), (L, i, h)),
            "fc2_bias": jnp.zeros((L, h), dtype),
        },
        "post_ln": ln((h,)),
    }


def layer_norm(x, p, eps):
    # promote, never demote (torch nn.LayerNorm runs in native dtype)
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(
        1.702 * x.astype(jnp.promote_types(x.dtype, jnp.float32))
    ).astype(x.dtype)


def patchify(pixel_values, patch_size: int):
    """[B, H, W, 3] → [B, N, P·P·3] as a pure reshape (feeds one big matmul)."""
    B, H, W, C = pixel_values.shape
    nh, nw = H // patch_size, W // patch_size
    x = pixel_values.reshape(B, nh, patch_size, nw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, nh, nw, P, P, C]
    return x.reshape(B, nh * nw, patch_size * patch_size * C)


def _round_up(n, m):
    return (n + m - 1) // m * m


def forward(
    params: dict,
    cfg: VitConfig,
    pixel_values,
    *,
    feature_layer: int = -2,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
):
    """Encode images; returns hidden states at ``feature_layer`` incl. CLS.

    feature_layer uses HF hidden_states indexing: -1 = after last block,
    -2 = after the penultimate block (LLaVA default).
    """
    B = pixel_values.shape[0]
    patches = patchify(pixel_values.astype(compute_dtype), cfg.patch_size)
    x = patches @ params["patch_embed"].astype(compute_dtype)
    cls = jnp.broadcast_to(params["class_embed"].astype(compute_dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(compute_dtype)
    x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)

    S = cfg.seq_len
    S_pad = _round_up(S, 128)
    x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0)))
    mask = jnp.zeros((B, S_pad), jnp.int32).at[:, :S].set(1)

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    L = cfg.num_layers
    # hidden_states indexing: h_0 = embeddings, h_i = after block i-1 (L+1 entries)
    h_index = (L + 1 + feature_layer) if feature_layer < 0 else feature_layer

    def block(x, lp):
        h = layer_norm(x, {"scale": lp["ln1"]["scale"], "bias": lp["ln1"]["bias"]}, cfg.layer_norm_eps)
        q = (h @ lp["q_proj"].astype(h.dtype) + lp["q_bias"]).reshape(B, S_pad, nh, hd).transpose(0, 2, 1, 3)
        k = (h @ lp["k_proj"].astype(h.dtype) + lp["k_bias"]).reshape(B, S_pad, nh, hd).transpose(0, 2, 1, 3)
        v = (h @ lp["v_proj"].astype(h.dtype) + lp["v_bias"]).reshape(B, S_pad, nh, hd).transpose(0, 2, 1, 3)
        attn = flash_attention(q, k, v, mask, causal=False, impl=attn_impl)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S_pad, cfg.hidden_size)
        x = x + attn @ lp["o_proj"].astype(h.dtype) + lp["o_bias"]
        h = layer_norm(x, {"scale": lp["ln2"]["scale"], "bias": lp["ln2"]["bias"]}, cfg.layer_norm_eps)
        h = quick_gelu(h @ lp["fc1"].astype(h.dtype) + lp["fc1_bias"])
        x = x + h @ lp["fc2"].astype(h.dtype) + lp["fc2_bias"]
        return x

    def scan_body(carry, inp):
        x, captured = carry
        layer_id, lp = inp
        x = block(x, lp)
        captured = jnp.where(layer_id == h_index - 1, x, captured)
        return (x, captured), None

    captured0 = x  # hidden_states[0] == embeddings
    (x, captured), _ = jax.lax.scan(
        scan_body, (x, captured0), (jnp.arange(L), params["layers"])
    )
    feats = x if h_index >= L else captured
    return feats[:, :S, :]
