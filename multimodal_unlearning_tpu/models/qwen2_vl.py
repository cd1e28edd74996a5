"""Qwen2-VL / Qwen2.5-VL: NaViT-style vision tower + M-RoPE Qwen2 decoder.

The reference's *default* mm family is qwen-vl2-2b loaded as HF
``Qwen2VLForConditionalGeneration`` (reference config/mm/finetune.yaml:2,
config/model_config.yaml:66-79, mm/finetune.py:79-84), and its qwen-vl-3b
family is HF ``Qwen2_5_VLForConditionalGeneration`` (reference
config/model_config.yaml:59-65).  Both true architectures, built TPU-first:

- the vision tower consumes pre-patchified pixels
  ``[B, N, C·T·P·P]`` (the Qwen2VLImageProcessor flatten order) with a
  *static* (t, h, w) grid per batch — variable resolution maps to bucketed
  static shapes instead of cu_seqlens ragged attention (XLA-friendly);
  2D rotary position embeddings over the merge-block patch order;
- PatchMerger (LN → 2×2 group → MLP) down to the decoder width;
- the decoder is models/llama.py with ``qkv_bias=True`` and 3D M-RoPE
  (``mrope_section``) — image spans get (t, h, w) grid positions, text gets
  equal positions across streams (HF get_rope_index semantics), computed
  in-graph with cumsums for the single-image-per-row case (the CLEAR data
  shape, reference mm/dataset.py:54-84).

The 2.5 tower (``version: "2.5"``) differs from 2.0 in exactly the HF ways:
RMSNorm block/merger norms (no biases), a biased SwiGLU block MLP
(gate/up/down), and *windowed* attention — every block attends within
static windows of ``window_size`` pixels except ``fullatt_block_indexes``.
The window partition (HF ``get_window_index``) is a function of the static
grid only, so it compiles to constant gathers: patches are permuted into
window order once, windowed blocks fold windows into the batch dim, and
the merger's output is un-permuted back to raster order.

HF-parity is tested against torch Qwen2VLForConditionalGeneration and
Qwen2_5_VLForConditionalGeneration in tests/test_hf_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.models.vit import layer_norm, quick_gelu
from multimodal_unlearning_tpu.ops.attention import flash_attention


@dataclass(frozen=True)
class QwenVisionConfig:
    embed_dim: int
    depth: int
    num_heads: int
    out_hidden_size: int
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    image_size: int = 336  # fixed-resolution operating point
    # Qwen2.5-VL tower (HF Qwen2_5_VisionTransformerPretrainedModel):
    version: str = "2"  # "2" (LN + GELU MLP, full attn) | "2.5" (RMS + SwiGLU + windows)
    intermediate_size: int | None = None  # 2.5 SwiGLU width (2.0 uses mlp_ratio)
    window_size: int = 0  # 2.5 window attention, in pixels (0 = full attention)
    fullatt_block_indexes: tuple = ()  # 2.5 blocks that attend over the full grid

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size**2

    @property
    def mlp_hidden(self) -> int:
        if self.intermediate_size is not None:
            return self.intermediate_size
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def merge_dim(self) -> int:
        return self.embed_dim * self.spatial_merge_size**2

    @classmethod
    def from_registry(cls, arch) -> "QwenVisionConfig":
        inter = arch.get("intermediate_size")
        return cls(
            embed_dim=int(arch["embed_dim"]),
            depth=int(arch["depth"]),
            num_heads=int(arch["num_heads"]),
            out_hidden_size=int(arch["out_hidden_size"]),
            patch_size=int(arch.get("patch_size", 14)),
            temporal_patch_size=int(arch.get("temporal_patch_size", 2)),
            spatial_merge_size=int(arch.get("spatial_merge_size", 2)),
            mlp_ratio=float(arch.get("mlp_ratio", 4.0)),
            layer_norm_eps=float(arch.get("layer_norm_eps", 1e-6)),
            image_size=int(arch.get("image_size", 336)),
            version=str(arch.get("version", "2")),
            intermediate_size=None if inter is None else int(inter),
            window_size=int(arch.get("window_size", 0)),
            fullatt_block_indexes=tuple(
                int(i) for i in arch.get("fullatt_block_indexes", ())
            ),
        )


@dataclass(frozen=True)
class QwenVLConfig:
    decoder: llama.LlamaConfig
    vision: QwenVisionConfig
    image_token_id: int
    vision_start_token_id: int
    vision_end_token_id: int

    @property
    def num_image_tokens(self) -> int:
        """Merged image tokens at the fixed-resolution operating point."""
        g = self.vision.image_size // self.vision.patch_size
        return g * g // self.vision.spatial_merge_size**2

    @property
    def default_grid(self) -> tuple:
        g = self.vision.image_size // self.vision.patch_size
        return (1, g, g)

    @classmethod
    def from_registry(cls, arch) -> "QwenVLConfig":
        return cls(
            decoder=llama.LlamaConfig.from_registry(arch["decoder"]),
            vision=QwenVisionConfig.from_registry(arch["vision"]),
            image_token_id=int(arch["image_token_id"]),
            vision_start_token_id=int(arch["vision_start_token_id"]),
            vision_end_token_id=int(arch["vision_end_token_id"]),
        )


def init_params(cfg: QwenVLConfig, key, dtype=jnp.float32) -> dict:
    kd, kv = jax.random.split(key)
    v = cfg.vision
    keys = iter(jax.random.split(kv, 12))
    E, L, M = v.embed_dim, v.depth, v.mlp_hidden

    def w_init(key, shape):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(shape[-2] ** -0.5, dtype)

    def ln(shape=(L, E)):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    patch_embed = w_init(next(keys), (v.patch_dim, E))
    blocks = {
        "q_proj": w_init(next(keys), (L, E, E)),
        "q_bias": jnp.zeros((L, E), dtype),
        "k_proj": w_init(next(keys), (L, E, E)),
        "k_bias": jnp.zeros((L, E), dtype),
        "v_proj": w_init(next(keys), (L, E, E)),
        "v_bias": jnp.zeros((L, E), dtype),
        "o_proj": w_init(next(keys), (L, E, E)),
        "o_bias": jnp.zeros((L, E), dtype),
    }
    if v.version == "2.5":
        # RMSNorm (scale only) + biased SwiGLU MLP (HF Qwen2_5_VLVisionBlock)
        blocks.update({
            "ln1": {"scale": jnp.ones((L, E), dtype)},
            "ln2": {"scale": jnp.ones((L, E), dtype)},
            "gate": w_init(next(keys), (L, E, M)),
            "gate_bias": jnp.zeros((L, M), dtype),
            "up": w_init(next(keys), (L, E, M)),
            "up_bias": jnp.zeros((L, M), dtype),
            "down": w_init(next(keys), (L, M, E)),
            "down_bias": jnp.zeros((L, E), dtype),
        })
        merger_ln = {"scale": jnp.ones((E,), dtype)}
    else:
        blocks.update({
            "ln1": ln(),
            "ln2": ln(),
            "fc1": w_init(next(keys), (L, E, M)),
            "fc1_bias": jnp.zeros((L, M), dtype),
            "fc2": w_init(next(keys), (L, M, E)),
            "fc2_bias": jnp.zeros((L, E), dtype),
        })
        merger_ln = {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)}
    vision = {
        "patch_embed": patch_embed,
        "blocks": blocks,
        "merger": {
            "ln_q": merger_ln,
            "fc1": w_init(next(keys), (v.merge_dim, v.merge_dim)),
            "fc1_bias": jnp.zeros((v.merge_dim,), dtype),
            "fc2": w_init(next(keys), (v.merge_dim, v.out_hidden_size)),
            "fc2_bias": jnp.zeros((v.out_hidden_size,), dtype),
        },
    }
    return {
        "language_model": llama.init_params(cfg.decoder, kd, dtype),
        "vision_tower": vision,
    }


def _vision_rope(cfg: QwenVisionConfig, grid: tuple) -> tuple:
    """(cos, sin) [N, head_dim] for the merge-block patch order (static)."""
    t, h, w = grid
    ms = cfg.spatial_merge_size
    # patch order: (t, h_block, w_block, merge_h, merge_w)
    hb, wb = np.meshgrid(np.arange(h // ms), np.arange(w // ms), indexing="ij")
    a, b = np.meshgrid(np.arange(ms), np.arange(ms), indexing="ij")
    h_ids = (hb[:, :, None, None] * ms + a[None, None]).reshape(-1)
    w_ids = (wb[:, :, None, None] * ms + b[None, None]).reshape(-1)
    h_ids = np.tile(h_ids, t)
    w_ids = np.tile(w_ids, t)
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.concatenate(
        [np.outer(h_ids, inv_freq), np.outer(w_ids, inv_freq)], axis=-1
    )  # [N, head_dim//2]
    emb = np.concatenate([freqs, freqs], axis=-1).astype(np.float32)  # [N, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _window_partition(cfg: QwenVisionConfig, grid: tuple):
    """Static Qwen2.5-VL window partition (HF get_window_index semantics).

    Everything here is a function of the static grid, so it runs in numpy at
    trace time and compiles to constant gathers.  Returns
    ``(patch_perm, gather, gmask, inv_scatter, inv_perm, uniform)``:

    - patch_perm [N]: permutation taking patches (merge-block order) into
      window order — groups of merge_size² patches move together;
    - gather [W, Lw]: per-window indices into the *permuted* patch sequence,
      right-padded with the last valid index (mask says which are real);
    - gmask [W, Lw]: 1 where gather holds a real patch;
    - inv_scatter [N]: flat (w·Lw + l) index of each permuted patch, so
      windowed attention output scatters back with one static gather;
    - inv_perm [U]: merged-token inverse permutation (HF argsort(window_index))
      applied after the PatchMerger to restore raster order;
    - uniform: True when every window is full (gather is a pure reshape).
    """
    t, h, w = grid
    ms = cfg.spatial_merge_size
    lh, lw = h // ms, w // ms
    vit_win = cfg.window_size // ms // cfg.patch_size
    unit = ms * ms
    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    # HF pads by `vit_win - l % vit_win` (a full empty window row when l
    # divides evenly — those windows have seqlen 0 and are dropped below,
    # so (-l) % vit_win is equivalent).
    pad_h, pad_w = (-lh) % vit_win, (-lw) % vit_win
    idx_p = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
    idx_p[:, :lh, :lw] = idx
    nwh, nww = (lh + pad_h) // vit_win, (lw + pad_w) // vit_win
    idx_p = (
        idx_p.reshape(t, nwh, vit_win, nww, vit_win)
        .transpose(0, 1, 3, 2, 4)
        .reshape(t * nwh * nww, vit_win * vit_win)
    )
    seqlens = (idx_p != -100).sum(axis=1)  # merge units per window
    flat = idx_p.reshape(-1)
    perm = flat[flat != -100]  # [U] merge-unit permutation (window order)
    lens = seqlens[seqlens > 0] * unit  # patches per (nonempty) window
    U, Wn, Lw = perm.shape[0], lens.shape[0], int(lens.max())
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    gather = np.full((Wn, Lw), 0, np.int64)
    gmask = np.zeros((Wn, Lw), np.int32)
    for i in range(Wn):
        gather[i, : lens[i]] = np.arange(starts[i], starts[i] + lens[i])
        gather[i, lens[i]:] = starts[i] + lens[i] - 1  # clamp padding in-range
        gmask[i, : lens[i]] = 1
    inv_scatter = np.empty(U * unit, np.int64)
    pos = (np.arange(Wn)[:, None] * Lw + np.arange(Lw)[None, :])
    inv_scatter[gather[gmask == 1]] = pos[gmask == 1]
    patch_perm = (perm[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    uniform = bool(gmask.all()) and Wn * Lw == U * unit
    return patch_perm, gather, gmask, inv_scatter, np.argsort(perm), uniform


def vision_forward(
    params: dict,
    cfg: QwenVisionConfig,
    patches,
    *,
    grid: tuple,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    merger_lora: dict | None = None,
    lora_scale: float = 0.0,
    lora_ids=None,
):
    """Encode pre-patchified images → merged features.

    patches: [B, N, patch_dim] in Qwen2VLImageProcessor flatten order
    (one image per batch row, all sharing the static ``grid``).
    Returns [B, N // merge², out_hidden_size].
    """
    B, N, _ = patches.shape
    E, nh, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    is25 = cfg.version == "2.5"
    windowed = is25 and cfg.window_size > 0
    x = patches.astype(compute_dtype) @ params["patch_embed"].astype(compute_dtype)
    cos, sin = _vision_rope(cfg, grid)  # [N, hd] fp32 (merge-block order)

    if windowed:
        patch_perm, gather, gmask, inv_scatter, inv_perm, uniform = _window_partition(cfg, grid)
        # one static permutation into window order; rope rows move with it
        x = x[:, patch_perm]
        cos, sin = cos[patch_perm], sin[patch_perm]
        Wn, Lw = gather.shape

    mask = jnp.ones((B, N), jnp.int32)

    def rope(q):  # q: [B, nh, N, hd] — fp32 rotation (HF vision path)
        q32 = q.astype(jnp.float32)
        out = q32 * cos[None, None] + _rotate_half(q32) * sin[None, None]
        return out.astype(q.dtype)

    def norm(h, lp_n):
        if is25:  # HF Qwen2RMSNorm, scale only
            return llama.rms_norm(h, lp_n["scale"], eps)
        return layer_norm(h, lp_n, eps)

    def full_attn(q, k, v):
        return flash_attention(q, k, v, mask, causal=False, impl=attn_impl)

    def win_attn(q, k, v):
        # fold windows into the batch dim: [B, nh, N, hd] -> [B·W, nh, Lw, hd]
        if uniform:  # windows tile the permuted sequence exactly — reshape
            def gw(z):
                return (
                    z.reshape(B, nh, Wn, Lw, hd)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(B * Wn, nh, Lw, hd)
                )
        else:  # ragged windows: static gather, right-pad masked
            def gw(z):
                zg = z[:, :, jnp.asarray(gather)]  # [B, nh, Wn, Lw, hd]
                return zg.transpose(0, 2, 1, 3, 4).reshape(B * Wn, nh, Lw, hd)
        wmask = jnp.broadcast_to(
            jnp.asarray(gmask)[None], (B, Wn, Lw)
        ).reshape(B * Wn, Lw)
        ow = flash_attention(gw(q), gw(k), gw(v), wmask, causal=False, impl=attn_impl)
        ow = (
            ow.reshape(B, Wn, nh, Lw, hd)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, nh, Wn * Lw, hd)
        )
        return ow if uniform else ow[:, :, jnp.asarray(inv_scatter)]

    def block(x, inp):
        lp, is_full = inp
        h = norm(x, lp["ln1"])
        q = (h @ lp["q_proj"].astype(h.dtype) + lp["q_bias"]).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        k = (h @ lp["k_proj"].astype(h.dtype) + lp["k_bias"]).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        v = (h @ lp["v_proj"].astype(h.dtype) + lp["v_bias"]).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        q, k = rope(q), rope(k)
        if windowed:
            attn = jax.lax.cond(is_full, full_attn, win_attn, q, k, v)
        else:
            attn = full_attn(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, N, E)
        x = x + attn @ lp["o_proj"].astype(h.dtype) + lp["o_bias"]
        h = norm(x, lp["ln2"])
        if is25:  # biased SwiGLU (HF Qwen2_5_VLMLP with bias=True)
            g = h @ lp["gate"].astype(h.dtype) + lp["gate_bias"]
            u = h @ lp["up"].astype(h.dtype) + lp["up_bias"]
            return x + (jax.nn.silu(g) * u) @ lp["down"].astype(h.dtype) + lp["down_bias"]
        h = quick_gelu(h @ lp["fc1"].astype(h.dtype) + lp["fc1_bias"])
        return x + h @ lp["fc2"].astype(h.dtype) + lp["fc2_bias"]

    full_flags = jnp.asarray(
        [(not windowed) or (i in cfg.fullatt_block_indexes) for i in range(cfg.depth)]
    )
    x, _ = jax.lax.scan(
        lambda c, inp: (block(c, inp), None), x, (params["blocks"], full_flags)
    )

    # PatchMerger: LN/RMS, group merge²-consecutive patches, 2-layer GELU MLP
    m = params["merger"]

    def dense(z, name):
        y = z @ m[name].astype(z.dtype) + m[f"{name}_bias"]
        ab = merger_lora.get(name) if merger_lora is not None else None
        return llama.apply_lora_delta(y, z, ab, lora_scale, lora_ids)

    if is25:
        y = llama.rms_norm(x, m["ln_q"]["scale"], eps)
    else:
        y = layer_norm(x, m["ln_q"], eps)
    y = y.reshape(B, N // cfg.spatial_merge_size**2, cfg.merge_dim)
    y = dense(y, "fc1")
    y = jax.nn.gelu(
        y.astype(jnp.promote_types(y.dtype, jnp.float32)), approximate=False
    ).astype(x.dtype)
    y = dense(y, "fc2")
    if windowed:  # un-permute merged tokens back to raster order
        y = y[:, jnp.asarray(inv_perm)]
    return y


def mrope_positions(input_ids, attention_mask, image_token_id: int, grid_merged: tuple):
    """3D rope position ids + rope delta (HF get_rope_index semantics,
    single contiguous image span per row; text-only rows degrade to 1D).

    Returns positions [3, B, S] and rope_delta [B] (decode-step offset)."""
    t, Hm, Wm = grid_merged
    valid = attention_mask.astype(jnp.int32)
    is_img = ((input_ids == image_token_id) & (valid == 1))
    n_img = jnp.sum(is_img.astype(jnp.int32), axis=1, keepdims=True)
    cum_img = jnp.cumsum(is_img.astype(jnp.int32), axis=1)
    n_before = jnp.sum(
        ((cum_img == 0) & (valid == 1)).astype(jnp.int32), axis=1, keepdims=True
    )
    pos1d = jnp.cumsum(valid, axis=1) - 1

    idx_in_img = jnp.maximum(cum_img - 1, 0)
    per_frame = Hm * Wm
    t_id = idx_in_img // per_frame
    h_id = (idx_in_img % per_frame) // Wm
    w_id = idx_in_img % Wm
    st_after = n_before + jnp.maximum(jnp.maximum(Hm, Wm), t)
    after_pos = st_after + (pos1d - (n_before + n_img))

    text_pos = jnp.where((cum_img > 0) & ~is_img, after_pos, pos1d)
    pos_t = jnp.where(is_img, n_before + t_id, text_pos)
    pos_h = jnp.where(is_img, n_before + h_id, text_pos)
    pos_w = jnp.where(is_img, n_before + w_id, text_pos)
    positions = jnp.maximum(jnp.stack([pos_t, pos_h, pos_w]), 0).astype(jnp.int32)

    max_pos = jnp.max(jnp.where(valid[None] == 1, positions, -1), axis=(0, 2))
    rope_delta = max_pos + 1 - jnp.sum(valid, axis=1)
    return positions, rope_delta


def forward(
    params: dict,
    cfg: QwenVLConfig,
    input_ids,
    *,
    pixel_values=None,
    attention_mask=None,
    positions=None,
    rope_delta=None,
    grid=None,
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
    mesh=None,
    last_logit_only: bool = False,
    chunk_decode: bool = False,
    lora_ids=None,
    pp_microbatches=None,
):
    """VLM forward.  ``input_ids`` contain the expanded image-token span;
    ``pixel_values`` are pre-patchified [B, N, patch_dim] (flatten order of
    Qwen2VLImageProcessor) with static ``grid`` (defaults to the
    fixed-resolution operating point)."""
    B, S = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    grid = tuple(grid) if grid is not None else cfg.default_grid
    ms = cfg.vision.spatial_merge_size
    grid_merged = (grid[0], grid[1] // ms, grid[2] // ms)

    lm = params["language_model"]
    et = lm["embed_tokens"]
    if isinstance(et, dict):  # quantized embedding table
        from multimodal_unlearning_tpu.utils.quantize import embed_lookup

        embeds = embed_lookup(et, input_ids).astype(compute_dtype)
    else:
        embeds = jnp.take(et, input_ids, axis=0).astype(compute_dtype)

    if pixel_values is not None:
        image_embeds = vision_forward(
            params["vision_tower"], cfg.vision, pixel_values,
            grid=grid, attn_impl=attn_impl, compute_dtype=compute_dtype,
            merger_lora=None if lora is None else lora.get("projector"),
            lora_scale=lora_scale, lora_ids=lora_ids,
        )
        from multimodal_unlearning_tpu.models.llava import splice_image_embeds

        mask = input_ids == cfg.image_token_id
        embeds = splice_image_embeds(embeds, image_embeds, mask)

    out_delta = None
    if positions is None:
        positions, out_delta = mrope_positions(
            input_ids, attention_mask, cfg.image_token_id, grid_merged
        )
    elif positions.ndim == 2:
        # decode continuation: all three streams equal, offset by rope delta
        p = positions + (rope_delta[:, None] if rope_delta is not None else 0)
        positions = jnp.broadcast_to(p[None], (3, *p.shape))

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
    if out_delta is not None:
        out["rope_delta"] = out_delta
    return out
