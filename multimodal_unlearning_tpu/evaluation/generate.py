"""Greedy batched generation with a sharded KV cache.

Replaces HF ``model.generate(..., use_cache=True)`` (reference:
mm/eval.py:126-133, nlp/evaluate_util.py:172-185):

- prefill writes the left-padded prompt into a [L,B,Hkv,Smax,D] cache in one
  flash-attention pass;
- decode is a single ``lax.scan`` over ``max_new_tokens`` — one XLA program,
  no per-token dispatch; finished rows (eos) keep emitting pad;
- everything is static-shape: Smax = prompt bucket + max_new_tokens.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.models import decoder_module, vlm_module


def pad_prompts(encoded: list[list[int]], pad_id: int, multiple: int = 128):
    """Left-pad variable-length prompts into a lane-aligned [B, S] batch."""
    import numpy as np

    S = -(-max(len(e) for e in encoded) // multiple) * multiple
    ids = np.full((len(encoded), S), pad_id, np.int32)
    mask = np.zeros((len(encoded), S), np.int32)
    for r, e in enumerate(encoded):
        e = e[-S:]
        ids[r, S - len(e):] = e
        mask[r, S - len(e):] = 1
    return ids, mask


def greedy_generate(
    params,
    model_cfg,
    input_ids,
    attention_mask,
    *,
    max_new_tokens: int,
    pad_token_id: int,
    eos_token_id: int | None = None,
    pixel_values=None,
    is_vlm: bool = False,
    cache_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
):
    """Returns generated token ids [B, max_new_tokens] (pad after eos)."""
    B, S = input_ids.shape
    Smax = -(-(S + max_new_tokens) // 128) * 128  # lane-aligned cache
    dec_cfg = model_cfg.decoder if is_vlm else model_cfg
    dec = decoder_module(dec_cfg)

    cache = dec.init_kv_cache(dec_cfg, B, Smax, dtype=cache_dtype)
    kv_valid = jnp.zeros((B, Smax), jnp.int32).at[:, :S].set(attention_mask)
    prompt_len = jnp.sum(attention_mask, axis=-1)  # valid tokens per row

    fwd = partial(
        vlm_module(model_cfg).forward, params, model_cfg,
        attn_impl=attn_impl, compute_dtype=compute_dtype,
    ) if is_vlm else partial(
        dec.forward, params, model_cfg,
        attn_impl=attn_impl, compute_dtype=compute_dtype,
    )

    prefill_kw = dict(
        attention_mask=attention_mask,
        kv_cache=cache, cache_offset=0, kv_valid_mask=kv_valid,
    )
    if is_vlm:
        prefill_kw["pixel_values"] = pixel_values
    out = fwd(input_ids, **prefill_kw)
    cache = out["kv_cache"]
    # Qwen2-VL M-RoPE: decode positions continue from max prompt position
    rope_delta = out.get("rope_delta")
    first_token = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(input_ids.dtype)

    eos = -1 if eos_token_id is None else eos_token_id
    finished0 = (first_token == eos) if eos_token_id is not None else jnp.zeros((B,), bool)
    first_emit = jnp.where(finished0, pad_token_id, first_token)

    def step(carry, t):
        cache, kv_valid, token, finished = carry
        kv_valid = kv_valid.at[:, S + t].set((~finished).astype(jnp.int32))
        pos = (prompt_len + t)[:, None]
        dec_kw = dict(
            attention_mask=jnp.ones((B, 1), jnp.int32),
            positions=pos,
            kv_cache=cache, cache_offset=S + t, kv_valid_mask=kv_valid,
        )
        if is_vlm:
            dec_kw["pixel_values"] = None
        if rope_delta is not None:
            dec_kw["rope_delta"] = rope_delta
        out = fwd(token[:, None], **dec_kw)
        nxt = jnp.argmax(out["logits"][:, -1, :], axis=-1).astype(token.dtype)
        newly_finished = finished | (nxt == eos)
        emit = jnp.where(newly_finished, pad_token_id, nxt)
        return (out["kv_cache"], kv_valid, nxt, newly_finished), emit

    if max_new_tokens == 1:
        return first_emit[:, None]

    (_, _, _, _), emitted = jax.lax.scan(
        step, (cache, kv_valid, first_token, finished0), jnp.arange(max_new_tokens - 1)
    )
    # emitted: [T-1, B] → [B, T-1]
    gen = jnp.concatenate([first_emit[:, None], emitted.T], axis=1)
    return gen
