"""Llama-family decoder (RMSNorm + RoPE + SwiGLU + GQA), pure-functional JAX.

Covers the reference's decoder families (llama2-7b, mistral, phi, stablelm,
pythia surfaces in config/model_config.yaml) as one parametric architecture.

TPU-first choices:
- layer params are *stacked* along a leading L dim and the forward runs a
  single ``lax.scan`` over layers → O(1) HLO size, fast compiles, natural
  per-layer rematerialization (``remat=True`` ≙ gradient_checkpointing);
- attention runs through the Pallas flash kernel (ops/attention.py);
- LoRA is applied inside each projection (y = x·W + s·(x·A)·B), never
  materializing merged weights (reference merges via peft:
  mm/finetune.py:129-133 — here merging is a checkpoint-time op);
- KV cache is a pytree of [L, B, Hkv, Smax, D] arrays updated with
  ``dynamic_update_slice`` under the same scan;
- single-token decode routes to the XLA path (bandwidth-bound; no point
  launching the flash kernel for Sq=1).

Activation capture for RMU (reference: mm/trainer.py:302-326 uses forward
hooks on layer 7) is a ``capture_layer`` argument — the scan carry keeps the
selected layer's hidden states, no hook machinery needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from multimodal_unlearning_tpu.ops.attention import flash_attention
from multimodal_unlearning_tpu.ops.rope import apply_rope_bsd, rope_table


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    qkv_bias: bool = False  # Qwen2 family: q/k/v projections carry biases
    mrope_section: tuple = ()  # Qwen2-VL 3D M-RoPE channel split (t, h, w)
    num_experts: int = 0  # >0: Mixtral-style MoE MLP (ops/moe.py)
    num_experts_per_tok: int = 2
    moe_route: str = "dense"  # "dense" (exact, HF parity) | "capacity" (Switch)
    moe_capacity_factor: float = 1.25

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_registry(cls, arch) -> "LlamaConfig":
        return cls(
            vocab_size=int(arch["vocab_size"]),
            hidden_size=int(arch["hidden_size"]),
            intermediate_size=int(arch["intermediate_size"]),
            num_layers=int(arch["num_layers"]),
            num_heads=int(arch["num_heads"]),
            num_kv_heads=int(arch["num_kv_heads"]),
            rope_theta=float(arch.get("rope_theta", 10000.0)),
            max_position_embeddings=int(arch.get("max_position_embeddings", 4096)),
            rms_norm_eps=float(arch.get("rms_norm_eps", 1e-5)),
            qkv_bias=bool(arch.get("qkv_bias", False)),
            mrope_section=tuple(arch.get("mrope_section", ())),
            num_experts=int(arch.get("num_experts", 0)),
            num_experts_per_tok=int(arch.get("num_experts_per_tok", 2)),
            moe_route=str(arch.get("moe_route", "dense")),
            moe_capacity_factor=float(arch.get("moe_capacity_factor", 1.25)),
        )


def init_params(cfg: LlamaConfig, key, dtype=jnp.float32) -> dict:
    """Random init; weight layout is [in, out] (checkpoint bridge transposes HF)."""
    keys = iter(jax.random.split(key, 16))
    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    kvh = cfg.num_kv_heads * d
    L = cfg.num_layers

    def w_init(key, shape):
        # generate directly in target dtype: no fp32 transient (2× HBM at init)
        return jax.random.normal(key, shape, dtype) * jnp.asarray(shape[-2] ** -0.5, dtype)

    layers = {
        "input_layernorm": jnp.ones((L, h), dtype),
        "q_proj": w_init(next(keys), (L, h, h)),
        "k_proj": w_init(next(keys), (L, h, kvh)),
        "v_proj": w_init(next(keys), (L, h, kvh)),
        "o_proj": w_init(next(keys), (L, h, h)),
        "post_attention_layernorm": jnp.ones((L, h), dtype),
    }
    if cfg.num_experts:  # Mixtral MoE: expert-stacked SwiGLU + router
        E = cfg.num_experts
        layers.update(
            router=w_init(next(keys), (L, h, E)),
            gate_proj=w_init(next(keys), (L, E, h, i)),
            up_proj=w_init(next(keys), (L, E, h, i)),
            down_proj=w_init(next(keys), (L, E, i, h)),
        )
    else:
        layers.update(
            gate_proj=w_init(next(keys), (L, h, i)),
            up_proj=w_init(next(keys), (L, h, i)),
            down_proj=w_init(next(keys), (L, i, h)),
        )
    if cfg.qkv_bias:
        layers["q_bias"] = jnp.zeros((L, h), dtype)
        layers["k_bias"] = jnp.zeros((L, kvh), dtype)
        layers["v_bias"] = jnp.zeros((L, kvh), dtype)
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype) * jnp.asarray(0.02, dtype),
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        "lm_head": w_init(next(keys), (h, cfg.vocab_size)),
    }


def rms_norm(x, weight, eps):
    # promote, never demote: bf16 → f32 exactly like HF LlamaRMSNorm's
    # .to(torch.float32); f64 parity runs stay f64 (the torch side is run
    # f64-native there — tests/test_reference_parity_optim.py)
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


INT8_COMPUTE = False  # set via enable_int8_compute(); W8A8 on QTensor leaves


def enable_int8_compute(on: bool = True) -> bool:
    """Opt-in W8A8: quantized-weight matmuls also quantize activations
    dynamically (straight-through backward).  Faster (int8 MXU) but noisier
    than the default W8A16 dequant path.  Returns the previous value so
    callers can restore it (in-process orchestrators set it globally)."""
    global INT8_COMPUTE
    prev = INT8_COMPUTE
    INT8_COMPUTE = on
    return prev


def _maybe_dequant(w, dtype):
    """QTensor leaves ({'q','s'}, utils/quantize.py — int8 per-channel or
    int4 grouped) dequantize in place — one layer's weight at a time under
    the scan, never the whole tree."""
    if isinstance(w, dict):
        from multimodal_unlearning_tpu.utils.quantize import dequantize_leaf

        return dequantize_leaf(w, dtype)
    return w.astype(dtype)


def apply_lora_delta(y, t, ll, scale, ids=None):
    """Add a LoRA delta to projection output ``y`` (input ``t`` [B,S,in]).

    ``ll`` leaves are [in,r]/[r,out] for one adapter, or an ADAPTER BANK
    [A,in,r]/[A,r,out] selected per batch row by ``ids`` [B] — multi-LoRA
    serving (serve/engine.py): each slot decodes through its own adapter in
    the same forward, the bank gather feeding two batched einsums."""
    if ll is None:
        return y
    a, b = ll["a"].astype(t.dtype), ll["b"].astype(t.dtype)
    if a.ndim == 3:
        if ids is None:  # a silent [A,in,r] @ matmul broadcast would be wrong
            raise ValueError("multi-adapter LoRA bank applied without lora_ids")
        return y + jnp.einsum(
            "bsr,bro->bso", jnp.einsum("bsi,bir->bsr", t, a[ids]), b[ids]) * scale
    return y + ((t @ a) @ b) * scale


def dense(x, w, lora_leaf=None, lora_scale: float = 0.0, lora_ids=None):
    # the int8-MXU W8A8 route is int8-only; q4 (grouped int4) leaves take the
    # half-split W4A16 matmul (dequant fused into the operand stream — a
    # dense dequant here would materialize bf16 weights every decode step)
    if isinstance(w, dict) and INT8_COMPUTE and "q" in w and w["q"].dtype == jnp.int8:
        from multimodal_unlearning_tpu.utils.quantize import int8_matmul

        y = int8_matmul(x, w["q"], w["s"])
    elif isinstance(w, dict) and "q4" in w:
        from multimodal_unlearning_tpu.utils.quantize import int4_matmul

        y = int4_matmul(x, w["q4"], w["s"])
    else:
        y = x @ _maybe_dequant(w, x.dtype)
    return apply_lora_delta(y, x, lora_leaf, lora_scale, lora_ids)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """KV cache pytree.  ``dtype=jnp.int8`` stores K/V quantized per
    (layer, batch, head, position) with f32 scales shaped [L,B,H,1,S] —
    the explicit 1 keeps the scale rows legal as (1, S) Mosaic blocks.
    Halves the decode HBM stream; exact-rescale math in the decode kernel
    (scales factor out of both dot products)."""
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if dtype == jnp.int8:
        sshape = shape[:3] + (1, max_len)
        cache["k_s"] = jnp.zeros(sshape, jnp.float32)
        cache["v_s"] = jnp.zeros(sshape, jnp.float32)
    return cache


def _cache_write(cache, k, v, layer_id, offset):
    """Write [B,H,S,D] k/v into the stacked cache carry at (layer, offset),
    quantizing on the fly when the cache is int8.

    ``offset`` may be a per-row [B] vector (continuous-batching decode:
    every slot sits at its own sequence position — serve/engine.py); that
    path is single-token (S == 1) and scatters one column per row."""
    if isinstance(offset, jnp.ndarray) and offset.ndim == 1:
        return _cache_write_per_row(cache, k, v, layer_id, offset)
    if "table" in cache:
        raise ValueError(
            "paged caches are written per-row (offset must be a [B] vector); "
            "prefill into a contiguous slab and scatter its pages instead")
    # dynamic_update_slice requires every index to share one dtype; under
    # jax_enable_x64 (the reference-parity harness) the scan-carried
    # layer_id is int64 while generate's while_loop position is int32 —
    # pin all five to int32.
    layer_id = jnp.asarray(layer_id).astype(jnp.int32)
    offset = jnp.asarray(offset).astype(jnp.int32)
    z = jnp.int32(0)
    if cache["k"].dtype == jnp.int8:
        k_s = jnp.max(jnp.abs(k).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        v_s = jnp.max(jnp.abs(v).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        k_q = jnp.round(k.astype(jnp.float32) / jnp.maximum(k_s, 1e-12)).astype(jnp.int8)
        v_q = jnp.round(v.astype(jnp.float32) / jnp.maximum(v_s, 1e-12)).astype(jnp.int8)
        return {
            "k": jax.lax.dynamic_update_slice(cache["k"], k_q[None], (layer_id, z, z, offset, z)),
            "v": jax.lax.dynamic_update_slice(cache["v"], v_q[None], (layer_id, z, z, offset, z)),
            "k_s": jax.lax.dynamic_update_slice(
                cache["k_s"], k_s.transpose(0, 1, 3, 2)[None], (layer_id, z, z, z, offset)),
            "v_s": jax.lax.dynamic_update_slice(
                cache["v_s"], v_s.transpose(0, 1, 3, 2)[None], (layer_id, z, z, z, offset)),
        }
    return {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype)[None], (layer_id, z, z, offset, z)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype)[None], (layer_id, z, z, offset, z)),
    }


def init_paged_kv_cache(cfg, n_pages: int, page: int, dtype=jnp.bfloat16):
    """Paged KV pool: ``n_pages`` shared pages of ``page`` columns each
    (ops/paged_attention.py).  The engine pairs it with a host-managed
    [B, MP] block table ("table" key merged into the cache dict per
    dispatch); logical column c of row b lives at pool page
    ``table[b, c//page]``, offset ``c % page``.  int8 pools carry the same
    per-position scales as the dense int8 cache (init_kv_cache)."""
    shape = (cfg.num_layers, cfg.num_kv_heads, n_pages, page, cfg.head_dim)
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if dtype == jnp.int8:
        sshape = shape[:3] + (1, page)
        cache["k_s"] = jnp.zeros(sshape, jnp.float32)
        cache["v_s"] = jnp.zeros(sshape, jnp.float32)
    return cache


def _cache_write_per_row(cache, k, v, layer_id, offset):
    """Cache write at a DIFFERENT column range per row: k/v are [B,H,C,D],
    ``offset`` is [B] — row b's C tokens land at columns offset[b]..
    offset[b]+C-1.  C == 1 is the continuous-batching decode
    (serve/engine.py); C > 1 is the speculative verify chunk
    (evaluation/generate.py).  Paged caches (a "table" key — see
    init_paged_kv_cache) route through the block table.

    Each row's target columns are CONTIGUOUS, so this is a (statically
    unrolled) chain of per-row ``dynamic_update_slice`` — in-place on the
    carried cache, one [H,C,D] DMA per row.  The batched-scatter
    formulation (``.at[layer, rows, :, cols, :]``) is mathematically the
    same but lowers to an XLA scatter that measured ~8x a plain decode
    step on a v5e (28.5 ms/verify-round vs 3.6 ms/step at the 2B op
    point, examples/decode_bench.py +spec4)."""
    if "table" in cache:
        return _cache_write_paged(cache, k, v, layer_id, offset)
    B = k.shape[0]
    layer_id = jnp.asarray(layer_id).astype(jnp.int32)
    offset = jnp.asarray(offset).astype(jnp.int32)
    z = jnp.int32(0)
    out = dict(cache)
    if cache["k"].dtype == jnp.int8:
        k_s = jnp.max(jnp.abs(k).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        v_s = jnp.max(jnp.abs(v).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        k_q = jnp.round(k.astype(jnp.float32) / jnp.maximum(k_s, 1e-12)).astype(jnp.int8)
        v_q = jnp.round(v.astype(jnp.float32) / jnp.maximum(v_s, 1e-12)).astype(jnp.int8)
        for b in range(B):
            at = (layer_id, jnp.int32(b), z, offset[b], z)
            at_s = (layer_id, jnp.int32(b), z, z, offset[b])
            out["k"] = jax.lax.dynamic_update_slice(out["k"], k_q[b][None, None], at)
            out["v"] = jax.lax.dynamic_update_slice(out["v"], v_q[b][None, None], at)
            out["k_s"] = jax.lax.dynamic_update_slice(
                out["k_s"], k_s[b][None, None].transpose(0, 1, 2, 4, 3), at_s)
            out["v_s"] = jax.lax.dynamic_update_slice(
                out["v_s"], v_s[b][None, None].transpose(0, 1, 2, 4, 3), at_s)
        return out
    for b in range(B):
        at = (layer_id, jnp.int32(b), z, offset[b], z)
        out["k"] = jax.lax.dynamic_update_slice(
            out["k"], k[b].astype(cache["k"].dtype)[None, None], at)
        out["v"] = jax.lax.dynamic_update_slice(
            out["v"], v[b].astype(cache["v"].dtype)[None, None], at)
    return out


def _cache_write_paged(cache, k, v, layer_id, offset):
    """Per-row write through the block table: logical columns
    offset[b]..offset[b]+C-1 scatter to pool pages ``table[b, col // page]``
    at offsets ``col % page``.  Rows mapped to the same page (only the
    engine's never-read trash page 0, for retired slots) race benignly.

    C == 1 (the engine's plain decode step) unrolls to per-row
    ``dynamic_update_slice`` — in-place, no XLA scatter (see
    _cache_write_per_row).  C > 1 (speculative verify into a paged pool)
    keeps the scatter: a row's chunk may straddle a page boundary, so the
    columns are not contiguous in the pool."""
    B, _, C, _ = k.shape
    page = cache["k"].shape[3]
    layer_id = jnp.asarray(layer_id).astype(jnp.int32)
    cols = offset[:, None].astype(jnp.int32) + jnp.arange(C, dtype=jnp.int32)[None, :]
    pg = jnp.take_along_axis(cache["table"], cols // page, axis=1)  # [B,C]
    off = cols % page
    out = dict(cache)
    if C == 1:
        z = jnp.int32(0)
        quant = cache["k"].dtype == jnp.int8
        if quant:
            k_s = jnp.max(jnp.abs(k).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
            v_s = jnp.max(jnp.abs(v).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
            k_w = jnp.round(k.astype(jnp.float32) / jnp.maximum(k_s, 1e-12)).astype(jnp.int8)
            v_w = jnp.round(v.astype(jnp.float32) / jnp.maximum(v_s, 1e-12)).astype(jnp.int8)
        else:
            k_w, v_w = k.astype(cache["k"].dtype), v.astype(cache["v"].dtype)
        for b in range(B):
            at = (layer_id, z, pg[b, 0], off[b, 0], z)
            out["k"] = jax.lax.dynamic_update_slice(out["k"], k_w[b][None, :, None], at)
            out["v"] = jax.lax.dynamic_update_slice(out["v"], v_w[b][None, :, None], at)
            if quant:
                at_s = (layer_id, z, pg[b, 0], z, off[b, 0])
                out["k_s"] = jax.lax.dynamic_update_slice(
                    out["k_s"], k_s[b][None, :, None], at_s)
                out["v_s"] = jax.lax.dynamic_update_slice(
                    out["v_s"], v_s[b][None, :, None], at_s)
        return out
    if cache["k"].dtype == jnp.int8:
        k_s = jnp.max(jnp.abs(k).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        v_s = jnp.max(jnp.abs(v).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        k_q = jnp.round(k.astype(jnp.float32) / jnp.maximum(k_s, 1e-12)).astype(jnp.int8)
        v_q = jnp.round(v.astype(jnp.float32) / jnp.maximum(v_s, 1e-12)).astype(jnp.int8)
        out["k"] = cache["k"].at[layer_id, :, pg, off, :].set(k_q.transpose(0, 2, 1, 3))
        out["v"] = cache["v"].at[layer_id, :, pg, off, :].set(v_q.transpose(0, 2, 1, 3))
        out["k_s"] = cache["k_s"].at[layer_id, :, pg, 0, off].set(
            k_s[..., 0].transpose(0, 2, 1))
        out["v_s"] = cache["v_s"].at[layer_id, :, pg, 0, off].set(
            v_s[..., 0].transpose(0, 2, 1))
        return out
    out["k"] = cache["k"].at[layer_id, :, pg, off, :].set(
        k.astype(cache["k"].dtype).transpose(0, 2, 1, 3))
    out["v"] = cache["v"].at[layer_id, :, pg, off, :].set(
        v.astype(cache["v"].dtype).transpose(0, 2, 1, 3))
    return out


def positions_from_mask(attention_mask):
    """Absolute positions under left/right padding: cumsum of validity."""
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    return jnp.maximum(pos, 0).astype(jnp.int32)


def forward(
    params: dict,
    cfg: LlamaConfig,
    input_ids=None,
    *,
    inputs_embeds=None,
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
    return_hidden: bool = False,
    last_logit_only: bool = False,
    chunk_decode: bool = False,
    lora_ids=None,
    mesh=None,
    pp_microbatches=None,
):
    """Decoder forward.

    Modes:
      train/prefill-no-cache: ``kv_cache=None``; causal attention over the
        padded batch with ``attention_mask`` as KV validity.
      prefill-into-cache: ``kv_cache`` zero-filled [L,B,Hkv,Smax,D], writes at
        ``cache_offset``; ``kv_valid_mask`` [B,Smax] marks valid slots.
      decode: S==1 query against the cache (non-causal + validity mask).

    ``attn_impl="ring"`` runs sequence-parallel ring attention over the
    mesh's 'seq' axis (requires ``mesh``; train/no-cache mode only).

    A ``mesh`` with pipe > 1 runs the layer stack as a GPipe microbatch
    pipeline over the 'pipe' axis (parallel/pp.py; train/no-cache mode only;
    ``pp_microbatches`` sets the schedule's microbatch count).

    Returns dict(logits, kv_cache, captured, hidden).
    """
    if logits_dtype is None:
        logits_dtype = jnp.promote_types(compute_dtype, jnp.float32)
    if inputs_embeds is None:
        et = params["embed_tokens"]
        if isinstance(et, dict):  # quantized embedding table (int8 or q4)
            from multimodal_unlearning_tpu.utils.quantize import embed_lookup

            inputs_embeds = embed_lookup(et, input_ids)
        else:
            inputs_embeds = jnp.take(et, input_ids, axis=0)
    x = inputs_embeds.astype(compute_dtype)
    B, S, H = x.shape

    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    if positions is None:
        if kv_cache is None:
            # HF PLAIN-forward convention (training / teacher-forced eval):
            # positions are arange REGARDLESS of padding — padded rows see
            # pad-shifted ropes exactly like the torch reference, which is
            # load-bearing for losses that reduce over pad positions
            # (nlp/dataloader.py logits2probs view(-1, V) + batchmean)
            positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        else:
            # generation (cache present): HF generate's mask-aware positions
            positions = positions_from_mask(attention_mask)

    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        dtype=jnp.promote_types(compute_dtype, jnp.float32),  # f32 unless f64 parity
    )
    if positions.ndim == 3:  # M-RoPE [3, B, S] (Qwen2-VL)
        from multimodal_unlearning_tpu.ops.rope import mrope_select

        cos_p, sin_p = mrope_select(cos, sin, positions, cfg.mrope_section, cfg.head_dim)
    else:
        cos_p, sin_p = cos[positions], sin[positions]  # [B, S, D]

    use_cache = kv_cache is not None
    decoding = use_cache and S == 1
    # speculative verify chunk: C>1 candidate tokens read the WHOLE cache
    # (accepted prefix + per-row in-chunk causal) instead of the local-only
    # prefill attention; per-row cache columns via a [B] cache_offset
    chunk_decode = chunk_decode and use_cache and not decoding
    if chunk_decode:
        offset_vec = jnp.broadcast_to(
            jnp.asarray(cache_offset, jnp.int32).reshape(-1), (B,))
    kv_mask = kv_valid_mask if kv_valid_mask is not None else attention_mask
    has_lora = lora is not None and lora.get("layers") is not None
    L = cfg.num_layers

    def block(x, lp, lora_l, cache, layer_id, cos_p=cos_p, sin_p=sin_p, kv_mask=kv_mask):
        # rope/mask default to the full-batch closures (plain scan); the
        # pipeline path passes per-microbatch slices explicitly
        hdim, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
        B, S, _ = x.shape  # microbatch-local under pipeline parallelism

        def extras(y, t, name):
            ll = lora_l.get(name) if has_lora else None
            y = apply_lora_delta(y, t, ll, lora_scale, lora_ids)
            bias = lp.get(name[0] + "_bias") if name != "o_proj" else None
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        def proj(name, t):
            ll = lora_l.get(name) if has_lora else None
            y = dense(t, lp[name], ll, lora_scale, lora_ids)
            bias = lp.get(name[0] + "_bias") if name != "o_proj" else None
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        def grouped(t, names):
            """W8A8 projections sharing input t: quantize activations once."""
            from multimodal_unlearning_tpu.utils.quantize import int8_matmul_group

            ys = int8_matmul_group(
                t,
                tuple(lp[n]["q"] for n in names),
                tuple(lp[n]["s"] for n in names),
            )
            return [extras(y, t, n) for y, n in zip(ys, names)]

        int8_grouped = INT8_COMPUTE and all(
            isinstance(lp[n], dict) and "q" in lp[n] and lp[n]["q"].dtype == jnp.int8
            for n in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
        )

        h_attn = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        if int8_grouped:
            q, k, v = grouped(h_attn, ("q_proj", "k_proj", "v_proj"))
        else:
            q = proj("q_proj", h_attn)
            k = proj("k_proj", h_attn)
            v = proj("v_proj", h_attn)
        q = q.reshape(B, S, nh, hdim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nkv, hdim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nkv, hdim).transpose(0, 2, 1, 3)
        q = apply_rope_bsd(q, cos_p, sin_p)
        k = apply_rope_bsd(k, cos_p, sin_p)

        if use_cache:
            # write this token/chunk into the layer's slab of the FULL
            # stacked cache (scan carry -> in-place update, no per-layer
            # slab copies); int8 caches quantize at write
            cache = _cache_write(
                cache, k, v, layer_id,
                offset_vec if chunk_decode else cache_offset)

        if chunk_decode:
            from multimodal_unlearning_tpu.ops.decode_attention import (
                chunk_decode_attention,
            )

            attn = chunk_decode_attention(
                q, cache, layer_id, kv_mask, offset_vec, mesh=mesh)
        elif decoding:
            # flash-decode: read layer_id's K/V straight out of the stacked
            # cache (scalar-prefetch indexing — see ops/decode_attention.py)
            from multimodal_unlearning_tpu.ops.decode_attention import decode_attention

            attn = decode_attention(
                q, cache, layer_id, kv_mask,
                impl="xla" if attn_impl == "xla" else "auto",
                mesh=mesh,  # TP eval: per-shard kernel over the head axis
            )
        elif attn_impl == "ring" and not use_cache:
            from multimodal_unlearning_tpu.ops.ring_attention import ring_flash_attention

            attn = ring_flash_attention(
                q, k.astype(q.dtype), v.astype(q.dtype), mesh,
                axis="seq", kv_mask=kv_mask, batch_axes=("data", "fsdp"),
            )
        else:
            # train, or prefill-into-cache at offset 0: the just-computed
            # local k/v ARE the written prefix, so attend over them with the
            # mask's first S columns (identical to reading the slab back)
            attn = flash_attention(
                q, k.astype(q.dtype), v.astype(q.dtype),
                kv_mask if kv_mask.shape[1] == S else kv_mask[:, :S],
                causal=True,
                impl="xla" if attn_impl == "ring" else attn_impl,
            )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * hdim)
        attn = checkpoint_name(attn, "attn_out")
        x = x + proj("o_proj", attn)

        h_mlp = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        if cfg.num_experts:
            # Mixtral MoE MLP (ops/moe.py): int8 bases run W8A8 on the int8
            # MXU when INT8_COMPUTE is on (dense route, grouped activation
            # quantization), else dequantize per layer under the scan (W8A16)
            from multimodal_unlearning_tpu.ops.moe import moe_mlp

            moe_out = moe_mlp(
                h_mlp,
                lp["router"],
                lp["gate_proj"],
                lp["up_proj"],
                lp["down_proj"],
                cfg.num_experts_per_tok,
                route=cfg.moe_route,
                capacity_factor=cfg.moe_capacity_factor,
                int8_compute=INT8_COMPUTE,
            )
            return x + checkpoint_name(moe_out, "ffn_pre_down"), cache
        if int8_grouped:
            gate, up = grouped(h_mlp, ("gate_proj", "up_proj"))
        else:
            gate = proj("gate_proj", h_mlp)
            up = proj("up_proj", h_mlp)
        # promote, never demote (torch act_fn runs in native dtype; f64 parity)
        ff = jax.nn.silu(gate.astype(jnp.promote_types(gate.dtype, jnp.float32))).astype(x.dtype) * up
        ff = checkpoint_name(ff, "ffn_pre_down")
        x = x + dense(
            ff, lp["down_proj"],
            lora_l.get("down_proj") if has_lora else None, lora_scale, lora_ids,
        )
        return x, cache

    if remat:
        policy = None
        if remat_policy == "dots":
            policy = jax.checkpoint_policies.checkpoint_dots
        elif remat_policy == "dots_no_batch":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif remat_policy == "save_attn":
            # keep the flash-attention output: backward skips the VPU-heavy
            # attention recompute at [B,S,H] memory per layer
            policy = jax.checkpoint_policies.save_only_these_names("attn_out")
        elif remat_policy == "save_attn_ffn":
            policy = jax.checkpoint_policies.save_only_these_names("attn_out", "ffn_pre_down")
        block = jax.checkpoint(block, policy=policy)

    layer_ids = jnp.arange(L)
    # dummy per-layer scan inputs when a feature is off (never touched inside)
    lora_scan = lora["layers"] if has_lora else jnp.zeros((L,))

    from multimodal_unlearning_tpu.parallel.pp import pp_degree

    if pp_degree(mesh) > 1:
        # GPipe microbatch pipeline over the 'pipe' mesh axis: stages hold
        # L/pipe layers each; rope/mask travel with their microbatch
        if use_cache or capture_layer is not None or attn_impl == "ring":
            raise NotImplementedError(
                "pipeline parallelism supports the train/no-cache forward "
                "(no KV cache, no capture_layer, not combined with ring)"
            )
        from multimodal_unlearning_tpu.parallel.pp import pipeline_layers

        def pp_block(h, inp, ex):
            layer_id, lp, lora_l = inp
            h, _ = block(h, lp, lora_l, jnp.zeros(()), layer_id,
                         ex["cos"], ex["sin"], ex["mask"])
            return h

        x = pipeline_layers(
            pp_block, x, (layer_ids, params["layers"], lora_scan),
            {"cos": cos_p, "sin": sin_p, "mask": kv_mask},
            mesh, num_microbatches=pp_microbatches,
        )
        captured, caches_out = None, None
        return _epilogue(
            params, cfg, x, lora, lora_scale, lora_ids,
            logits_dtype, last_logit_only, return_hidden,
            captured, caches_out,
        )

    def scan_body(carry, inp):
        # the full stacked cache rides the CARRY: per-layer updates are
        # in-place on the loop-donated buffer (the old per-layer xs/ys form
        # re-materialized every layer's [B,Hkv,Smax,D] slab each step)
        x, captured, cache = carry
        layer_id, lp, lora_l = inp
        x, cache = block(x, lp, lora_l, cache, layer_id)
        if capture_layer is not None:
            captured = jnp.where(layer_id == capture_layer, x.astype(jnp.float32), captured)
        return (x, captured, cache), None

    captured0 = (
        jnp.zeros((B, S, H), jnp.float32) if capture_layer is not None else jnp.zeros((), jnp.float32)
    )
    cache0 = kv_cache if use_cache else jnp.zeros(())
    (x, captured, caches_out), _ = jax.lax.scan(
        scan_body, (x, captured0, cache0), (layer_ids, params["layers"], lora_scan)
    )

    return _epilogue(
        params, cfg, x, lora, lora_scale, lora_ids,
        logits_dtype, last_logit_only, return_hidden,
        captured if capture_layer is not None else None,
        caches_out if use_cache else None,
    )


def _epilogue(params, cfg, x, lora, lora_scale, lora_ids,
              logits_dtype, last_logit_only, return_hidden, captured, caches_out):
    """Final norm + LM head (shared by the plain scan and the pipeline path)."""
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    lm_lora = lora.get("lm_head") if lora is not None else None
    # prefill-for-decode only needs the final position: skipping the full
    # [B,S,V] head saves S/1 x the logit memory (1.9 GB at B8 S3712 V32k)
    xh = x[:, -1:] if last_logit_only else x
    logits = dense(xh, params["lm_head"], lm_lora, lora_scale, lora_ids).astype(logits_dtype)

    return {
        "logits": logits,
        "kv_cache": caches_out,
        "captured": captured,
        "hidden": x if return_hidden else None,
    }
