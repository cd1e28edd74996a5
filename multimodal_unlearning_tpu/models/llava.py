"""LLaVA-class VLM assembly: ViT tower → MLP projector → Llama decoder.

Reference model surface: HF LLaVA-1.5 / Qwen2-VL loaded by class name
(mm/forget.py:83-89, config/model_config.yaml:59-79).  Built from scratch:

- the collator pre-expands ``<image>`` into ``num_patches`` copies of
  ``image_token_id`` in ``input_ids`` (HF processor behavior), so shapes are
  static under jit;
- the splice is a masked gather: image-token positions pull rows from the
  projected patch features via a cumsum index — no dynamic shapes, rows
  without images ride through untouched (mixed text/image batches,
  reference mm/dataset.py:144-180);
- image patch positions carry labels -100 (loss never sees them), matching
  HF LLaVA loss semantics the reference relies on via ``outputs.loss``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.models import llama, vit


@dataclass(frozen=True)
class LlavaConfig:
    decoder: llama.LlamaConfig
    vision: vit.VitConfig
    image_token_id: int
    vision_feature_layer: int = -2
    vision_feature_select: str = "patch"  # drop CLS

    @property
    def num_image_tokens(self) -> int:
        n = self.vision.num_patches
        return n if self.vision_feature_select == "patch" else n + 1

    @classmethod
    def from_registry(cls, arch) -> "LlavaConfig":
        return cls(
            decoder=llama.LlamaConfig.from_registry(arch["decoder"]),
            vision=vit.VitConfig.from_registry(arch["vision"]),
            image_token_id=int(arch["image_token_id"]),
            vision_feature_layer=int(arch.get("vision_feature_layer", -2)),
            vision_feature_select=str(arch.get("vision_feature_select", "patch")),
        )


def init_params(cfg: LlavaConfig, key, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    vh, dh = cfg.vision.hidden_size, cfg.decoder.hidden_size
    k3a, k3b = jax.random.split(k3)
    return {
        "language_model": llama.init_params(cfg.decoder, k1, dtype),
        "vision_tower": vit.init_params(cfg.vision, k2, dtype),
        "projector": {
            "fc1": jax.random.normal(k3a, (vh, dh), dtype) * jnp.asarray(vh**-0.5, dtype),
            "fc1_bias": jnp.zeros((dh,), dtype),
            "fc2": jax.random.normal(k3b, (dh, dh), dtype) * jnp.asarray(dh**-0.5, dtype),
            "fc2_bias": jnp.zeros((dh,), dtype),
        },
    }


def reachable_mask(params: dict, cfg: LlavaConfig) -> dict:
    """Per-leaf 1/0 factors marking params the loss actually reaches.

    LLaVA selects ``hidden_states[vision_feature_layer]`` (HF default -2,
    config/model_config.yaml), so vision blocks at or above the cutoff never
    receive gradients; torch leaves their ``.grad`` as None and
    torch.optim.AdamW then skips them entirely — including weight decay.
    A functional optimizer sees exact-zero grads instead and would decay
    them every step (≈ lr·wd·w per step of silent divergence).  Feed this
    into ``optim.make_optimizer(reachable_mask=...)``.  Stacked-layer leaves
    get an [L,1,..] vector, everything else scalar True."""
    L = cfg.vision.num_layers
    cut = (L + 1 + cfg.vision_feature_layer) if cfg.vision_feature_layer < 0 \
        else cfg.vision_feature_layer
    used = jnp.arange(L) < cut

    def leaf_mask(path, leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys[:2] == ["vision_tower", "layers"]:
            return used.astype(jnp.float32).reshape((L,) + (1,) * (leaf.ndim - 1))
        if keys[:2] == ["vision_tower", "post_ln"]:
            return False  # CLIP post_layernorm only feeds pooled output
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def project(params, feats, lora=None, lora_scale: float = 0.0, lora_ids=None):
    def dense(x, name):
        y = x @ params[name].astype(x.dtype) + params[f"{name}_bias"]
        ab = lora.get(name) if lora is not None else None
        return llama.apply_lora_delta(y, x, ab, lora_scale, lora_ids)

    h = dense(feats, "fc1")
    # exact (erf) gelu: HF ACT2FN["gelu"] is torch.nn.GELU(approximate="none")
    # (projector_hidden_act="gelu", LlavaConfig) — jax's default is the tanh
    # approximation, a different function (~1e-3 abs), not an fp-noise matter
    h = jax.nn.gelu(
        h.astype(jnp.promote_types(h.dtype, jnp.float32)), approximate=False
    ).astype(feats.dtype)
    return dense(h, "fc2")


def splice_image_embeds(token_embeds, image_embeds, image_token_mask):
    """Scatter per-row image embeddings into masked positions.

    token_embeds: [B, S, H]; image_embeds: [B, N, H];
    image_token_mask: [B, S] bool — each row has 0 or exactly N True entries.
    """
    idx = jnp.cumsum(image_token_mask.astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, image_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(image_embeds, idx[..., None], axis=1)
    return jnp.where(image_token_mask[..., None], gathered.astype(token_embeds.dtype), token_embeds)


def forward(
    params: dict,
    cfg: LlavaConfig,
    input_ids,
    *,
    pixel_values=None,
    attention_mask=None,
    positions=None,
    kv_cache=None,
    cache_offset=0,
    kv_valid_mask=None,
    lora: dict | None = None,
    lora_scale: float = 0.0,
    capture_layer: int | None = None,
    remat: bool = False,
    remat_policy: str | None = None,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    logits_dtype=None,  # None -> promote(compute dtype, f32): f32 for bf16 runs, f64 stays f64
    last_logit_only: bool = False,
    chunk_decode: bool = False,
    lora_ids=None,
    mesh=None,
    pp_microbatches=None,
):
    """VLM forward. ``input_ids`` already contain expanded image tokens."""
    lm = params["language_model"]
    et = lm["embed_tokens"]
    if isinstance(et, dict):  # quantized embedding table (utils/quantize.py)
        from multimodal_unlearning_tpu.utils.quantize import embed_lookup

        embeds = embed_lookup(et, input_ids).astype(compute_dtype)
    else:
        embeds = jnp.take(et, input_ids, axis=0).astype(compute_dtype)

    if pixel_values is not None:
        feats = vit.forward(
            params["vision_tower"], cfg.vision, pixel_values,
            feature_layer=cfg.vision_feature_layer,
            attn_impl=attn_impl, compute_dtype=compute_dtype,
        )
        if cfg.vision_feature_select == "patch":
            feats = feats[:, 1:, :]
        image_embeds = project(
            params["projector"], feats,
            lora=None if lora is None else lora.get("projector"),
            lora_scale=lora_scale, lora_ids=lora_ids,
        )
        mask = input_ids == cfg.image_token_id
        embeds = splice_image_embeds(embeds, image_embeds, mask)

    out = llama.forward(
        lm, cfg.decoder,
        inputs_embeds=embeds,
        attention_mask=attention_mask,
        positions=positions,
        kv_cache=kv_cache,
        cache_offset=cache_offset,
        kv_valid_mask=kv_valid_mask,
        lora=lora if lora is None else lora.get("language_model"),
        lora_scale=lora_scale,
        capture_layer=capture_layer,
        remat=remat,
        remat_policy=remat_policy,
        attn_impl=attn_impl,
        compute_dtype=compute_dtype,
        logits_dtype=logits_dtype,
        last_logit_only=last_logit_only,
        chunk_decode=chunk_decode,
        lora_ids=lora_ids,
        mesh=mesh,
        pp_microbatches=pp_microbatches,
    )
    return out
