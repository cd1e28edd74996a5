"""Non-llama decoder families: GPT-NeoX (pythia), Phi, StableLM.

The reference registry advertises these as distinct HF architectures
(reference config/model_config.yaml:13-47, loaded via AutoModelForCausalLM at
nlp/finetune.py:96-98).  They differ from llama in ways that change logits:

- **GPT-NeoX / pythia**: LayerNorm (with bias), *parallel* residual
  ``x + attn(ln1(x)) + mlp(ln2(x))``, fused-QKV with biases, partial rotary
  (rotary_pct=0.25), erf-GELU MLP with biases.
- **Phi (phi-1_5)**: LayerNorm, parallel residual off a *single* layernorm
  ``x + attn(ln(x)) + mlp(ln(x))``, q/k/v/dense with biases, partial rotary
  (factor 0.5), tanh-GELU ("gelu_new"), lm_head WITH bias.
- **StableLM (3b-4e1t)**: sequential residual like llama but LayerNorm
  (with bias) instead of RMSNorm, partial rotary (factor 0.25), silu-gated
  MLP, no linear biases.

One parametric module covers all three — same TPU-first shape as
models/llama.py: stacked layer params under a single ``lax.scan``, Pallas
flash attention, [L,B,Hkv,Smax,D] KV cache, LoRA inside each projection,
``capture_layer`` for RMU-style activation taps.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.models.llama import dense
from multimodal_unlearning_tpu.ops.attention import flash_attention
from multimodal_unlearning_tpu.ops.rope import apply_rope, rope_table

# Flag presets per reference family (values mirror the HF config defaults the
# reference loads: GPTNeoXConfig / PhiConfig / StableLmConfig).
PRESETS = {
    "neox": dict(
        residual="parallel", num_layernorms=2, act="gelu", gated_mlp=False,
        qkv_bias=True, out_bias=True, mlp_bias=True, lm_head_bias=False,
        rotary_pct=0.25,
    ),
    "phi": dict(
        residual="parallel", num_layernorms=1, act="gelu_new", gated_mlp=False,
        qkv_bias=True, out_bias=True, mlp_bias=True, lm_head_bias=True,
        rotary_pct=0.5,
    ),
    "stablelm": dict(
        residual="sequential", num_layernorms=2, act="silu", gated_mlp=True,
        qkv_bias=False, out_bias=False, mlp_bias=False, lm_head_bias=False,
        rotary_pct=0.25,
    ),
}


@dataclass(frozen=True)
class GptConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    rope_theta: float = 10000.0
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    rotary_pct: float = 1.0
    residual: str = "parallel"  # parallel | sequential
    num_layernorms: int = 2
    act: str = "gelu"  # gelu | gelu_new | silu
    gated_mlp: bool = False
    qkv_bias: bool = True
    out_bias: bool = True
    mlp_bias: bool = True
    lm_head_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        rot = int(self.head_dim * self.rotary_pct)
        return rot - rot % 2  # even, as HF computes it

    @classmethod
    def from_registry(cls, arch) -> "GptConfig":
        preset = dict(PRESETS[str(arch["decoder"])])
        for k in preset:
            if k in arch:
                preset[k] = type(preset[k])(arch[k])
        return cls(
            vocab_size=int(arch["vocab_size"]),
            hidden_size=int(arch["hidden_size"]),
            intermediate_size=int(arch["intermediate_size"]),
            num_layers=int(arch["num_layers"]),
            num_heads=int(arch["num_heads"]),
            num_kv_heads=int(arch["num_kv_heads"]),
            rope_theta=float(arch.get("rope_theta", 10000.0)),
            max_position_embeddings=int(arch.get("max_position_embeddings", 2048)),
            layer_norm_eps=float(arch.get("layer_norm_eps", arch.get("rms_norm_eps", 1e-5))),
            **preset,
        )


def init_params(cfg: GptConfig, key, dtype=jnp.float32) -> dict:
    """Random init; weight layout is [in, out] (bridge transposes HF)."""
    keys = iter(jax.random.split(key, 24))
    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    kvh = cfg.num_kv_heads * d
    L = cfg.num_layers

    def w_init(key, shape):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(shape[-2] ** -0.5, dtype)

    def ln(width):
        return {"scale": jnp.ones((L, width), dtype), "bias": jnp.zeros((L, width), dtype)}

    layers = {
        "ln1": ln(h),
        "q_proj": w_init(next(keys), (L, h, h)),
        "k_proj": w_init(next(keys), (L, h, kvh)),
        "v_proj": w_init(next(keys), (L, h, kvh)),
        "o_proj": w_init(next(keys), (L, h, h)),
    }
    if cfg.num_layernorms == 2:
        layers["ln2"] = ln(h)
    if cfg.qkv_bias:
        layers["q_bias"] = jnp.zeros((L, h), dtype)
        layers["k_bias"] = jnp.zeros((L, kvh), dtype)
        layers["v_bias"] = jnp.zeros((L, kvh), dtype)
    if cfg.out_bias:
        layers["o_bias"] = jnp.zeros((L, h), dtype)
    if cfg.gated_mlp:
        layers["gate_proj"] = w_init(next(keys), (L, h, i))
        layers["up_proj"] = w_init(next(keys), (L, h, i))
        layers["down_proj"] = w_init(next(keys), (L, i, h))
    else:
        layers["fc1"] = w_init(next(keys), (L, h, i))
        layers["fc2"] = w_init(next(keys), (L, i, h))
        if cfg.mlp_bias:
            layers["fc1_bias"] = jnp.zeros((L, i), dtype)
            layers["fc2_bias"] = jnp.zeros((L, h), dtype)

    params = {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype)
        * jnp.asarray(0.02, dtype),
        "layers": layers,
        "final_ln": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "lm_head": w_init(next(keys), (h, cfg.vocab_size)),
    }
    if cfg.lm_head_bias:
        params["lm_head_bias"] = jnp.zeros((cfg.vocab_size,), dtype)
    return params


def layer_norm(x, p, eps):
    # promote, never demote (torch nn.LayerNorm runs in native dtype)
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y.astype(x.dtype) * p["scale"] + p["bias"]).astype(x.dtype)


_ACTS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "silu": jax.nn.silu,
}


def init_kv_cache(cfg: GptConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """KV cache pytree; ``dtype=jnp.int8`` = quantized (models/llama.py)."""
    from multimodal_unlearning_tpu.models import llama

    return llama.init_kv_cache(cfg, batch, max_len, dtype=dtype)


def positions_from_mask(attention_mask):
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    return jnp.maximum(pos, 0).astype(jnp.int32)


def forward(
    params: dict,
    cfg: GptConfig,
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
    """Decoder forward; same modes/contract as models/llama.py:forward
    (including the speculative ``chunk_decode`` verify mode and the
    pipe>1 GPipe pipeline — parallel/pp.py)."""
    if logits_dtype is None:
        logits_dtype = jnp.promote_types(compute_dtype, jnp.float32)
    if inputs_embeds is None:
        et = params["embed_tokens"]
        if isinstance(et, dict):  # quantized embedding table (int8 or int4)
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
            # HF plain-forward convention: arange regardless of padding
            # (see models/llama.py:forward for the rationale)
            positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        else:
            positions = positions_from_mask(attention_mask)

    rot = cfg.rotary_dim
    cos, sin = rope_table(
        cfg.max_position_embeddings, rot, cfg.rope_theta,
        dtype=jnp.promote_types(compute_dtype, jnp.float32),  # f32 unless f64 parity
    )

    def rope_partial(t, positions):
        if rot == cfg.head_dim:
            return apply_rope(t, cos, sin, positions)
        t_rot, t_pass = t[..., :rot], t[..., rot:]
        return jnp.concatenate(
            [apply_rope(t_rot, cos, sin, positions), t_pass], axis=-1
        )

    use_cache = kv_cache is not None
    decoding = use_cache and S == 1
    # speculative verify chunk — same contract as models/llama.py: C>1
    # candidate tokens read the whole cache with per-row in-chunk causality
    chunk_decode = chunk_decode and use_cache and not decoding
    if chunk_decode:
        offset_vec = jnp.broadcast_to(
            jnp.asarray(cache_offset, jnp.int32).reshape(-1), (B,))
    kv_mask = kv_valid_mask if kv_valid_mask is not None else attention_mask
    has_lora = lora is not None and lora.get("layers") is not None
    act = _ACTS[cfg.act]
    L = cfg.num_layers

    def block(x, lp, lora_l, cache, layer_id, positions=positions, kv_mask=kv_mask):
        # positions/mask default to the full-batch closures (plain scan);
        # the pipeline path passes per-microbatch slices explicitly
        hdim, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
        B, S, _ = x.shape  # microbatch-local under pipeline parallelism

        def proj(name, t, bias_name=None):
            ll = lora_l.get(name) if has_lora else None
            y = dense(t, lp[name], ll, lora_scale, lora_ids)
            if bias_name is not None and bias_name in lp:
                y = y + lp[bias_name].astype(y.dtype)
            return y

        def attention(h_attn, cache):
            q = proj("q_proj", h_attn, "q_bias").reshape(B, S, nh, hdim).transpose(0, 2, 1, 3)
            k = proj("k_proj", h_attn, "k_bias").reshape(B, S, nkv, hdim).transpose(0, 2, 1, 3)
            v = proj("v_proj", h_attn, "v_bias").reshape(B, S, nkv, hdim).transpose(0, 2, 1, 3)
            q, k = rope_partial(q, positions), rope_partial(k, positions)
            if use_cache:
                # in-place update of the stacked cache carry (models/llama.py)
                from multimodal_unlearning_tpu.models.llama import _cache_write

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
                from multimodal_unlearning_tpu.ops.decode_attention import decode_attention

                attn = decode_attention(
                    q, cache, layer_id, kv_mask,
                    impl="xla" if attn_impl == "xla" else "auto",
                    mesh=mesh,  # TP eval: per-shard kernel (see models/llama.py)
                )
            else:
                attn = flash_attention(
                    q, k.astype(q.dtype), v.astype(q.dtype),
                    kv_mask if kv_mask.shape[1] == S else kv_mask[:, :S],
                    causal=True, impl=attn_impl,
                )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * hdim)
            return proj("o_proj", attn, "o_bias"), cache

        def mlp(h_mlp):
            if cfg.gated_mlp:
                gate = proj("gate_proj", h_mlp)
                up = proj("up_proj", h_mlp)
                ff = act(gate.astype(jnp.promote_types(gate.dtype, jnp.float32))).astype(x.dtype) * up
                return proj("down_proj", ff)
            ff = proj("fc1", h_mlp, "fc1_bias")
            ff = act(ff.astype(jnp.promote_types(ff.dtype, jnp.float32))).astype(x.dtype)
            return proj("fc2", ff, "fc2_bias")

        if cfg.residual == "parallel":
            h1 = layer_norm(x, lp["ln1"], cfg.layer_norm_eps)
            h2 = layer_norm(x, lp["ln2"], cfg.layer_norm_eps) if cfg.num_layernorms == 2 else h1
            attn_out, cache = attention(h1, cache)
            x_out = x + attn_out + mlp(h2)
        else:  # sequential (stablelm)
            attn_out, cache = attention(layer_norm(x, lp["ln1"], cfg.layer_norm_eps), cache)
            x_mid = x + attn_out
            x_out = x_mid + mlp(layer_norm(x_mid, lp["ln2"], cfg.layer_norm_eps))
        return x_out, cache

    if remat:
        policy = None
        if remat_policy == "dots":
            policy = jax.checkpoint_policies.checkpoint_dots
        elif remat_policy == "dots_no_batch":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        block = jax.checkpoint(block, policy=policy)

    layer_ids = jnp.arange(L)
    lora_scan = lora["layers"] if has_lora else jnp.zeros((L,))

    from multimodal_unlearning_tpu.parallel.pp import pp_degree

    if pp_degree(mesh) > 1:
        # GPipe microbatch pipeline over the 'pipe' axis (models/llama.py)
        if use_cache or capture_layer is not None:
            raise NotImplementedError(
                "pipeline parallelism supports the train/no-cache forward"
            )
        from multimodal_unlearning_tpu.parallel.pp import pipeline_layers

        def pp_block(h, inp, ex):
            layer_id, lp, lora_l = inp
            h, _ = block(h, lp, lora_l, jnp.zeros(()), layer_id,
                         ex["positions"], ex["mask"])
            return h

        x = pipeline_layers(
            pp_block, x, (layer_ids, params["layers"], lora_scan),
            {"positions": positions, "mask": kv_mask},
            mesh, num_microbatches=pp_microbatches,
        )
        captured, caches_out = None, None
        return _epilogue(params, cfg, x, lora, lora_scale, lora_ids,
                         logits_dtype, last_logit_only, return_hidden,
                         captured, caches_out)

    def scan_body(carry, inp):
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

    return _epilogue(params, cfg, x, lora, lora_scale, lora_ids,
                     logits_dtype, last_logit_only, return_hidden,
                     captured if capture_layer is not None else None,
                     caches_out if use_cache else None)


def _epilogue(params, cfg, x, lora, lora_scale, lora_ids,
              logits_dtype, last_logit_only, return_hidden, captured, caches_out):
    """Final LN + LM head (shared by the plain scan and the pipeline path)."""
    x = layer_norm(x, params["final_ln"], cfg.layer_norm_eps)
    lm_lora = lora.get("lm_head") if lora is not None else None
    xh = x[:, -1:] if last_logit_only else x  # see models/llama.py
    logits = dense(xh, params["lm_head"], lm_lora, lora_scale, lora_ids)
    if "lm_head_bias" in params:
        logits = logits + params["lm_head_bias"].astype(logits.dtype)
    logits = logits.astype(logits_dtype)

    return {
        "logits": logits,
        "kv_cache": caches_out,
        "captured": captured,
        "hidden": x if return_hidden else None,
    }
