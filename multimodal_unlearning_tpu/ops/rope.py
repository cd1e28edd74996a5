"""Rotary position embeddings (Llama-style, half-rotation layout).

Matches the HF Llama convention (rotate_half over concatenated halves) so
imported checkpoints produce identical activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_table(max_len: int, head_dim: int, theta: float = 10000.0, dtype=jnp.float32):
    """Precompute (cos, sin) tables of shape [max_len, head_dim].

    ``inv_freq`` is always computed in f32 (HF registers it as an f32 buffer);
    the angles and cos/sin run in ``dtype`` — f32 matches HF's forced-f32
    rotary (LlamaRotaryEmbedding.forward autocast-disabled block), f64 is for
    roundoff-exact parity runs where the torch side's rotary is run in f64."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=dtype)
    freqs = jnp.outer(t, inv_freq.astype(dtype))  # [L, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [L, D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x, cos, sin, positions):
    """Apply rotary embedding.

    x: [B, H, S, D]; positions: [B, S] absolute token positions
    (computed from the attention mask, so left padding Just Works).
    """
    c = cos[positions][:, None, :, :]  # [B, 1, S, D]
    s = sin[positions][:, None, :, :]
    return (x * c + _rotate_half(x) * s).astype(x.dtype)


def apply_rope_bsd(x, cos_bsd, sin_bsd):
    """Apply rotary embedding from precomputed per-token tables.

    x: [B, H, S, D]; cos_bsd/sin_bsd: [B, S, D] (e.g. M-RoPE-selected).
    """
    c = cos_bsd[:, None, :, :]
    s = sin_bsd[:, None, :, :]
    return (x * c + _rotate_half(x) * s).astype(x.dtype)


def mrope_select(cos, sin, positions, mrope_section, head_dim: int):
    """Qwen2-VL multimodal RoPE: pick per-dim cos/sin from 3 position streams.

    positions: [3, B, S] (temporal, height, width); ``mrope_section`` gives the
    per-stream channel widths over the first half of head_dim (HF
    apply_multimodal_rotary_pos_emb semantics: sections cycled i%3 over the
    duplicated-freqs layout).  Returns ([B,S,D], [B,S,D]).
    """
    half = head_dim // 2
    seg = jnp.repeat(
        jnp.arange(len(mrope_section)), jnp.asarray(mrope_section), total_repeat_length=half
    )
    seg = jnp.concatenate([seg, seg])  # duplicated-freqs layout [D]
    cos3 = cos[positions]  # [3, B, S, D]
    sin3 = sin[positions]
    onehot = jax.nn.one_hot(seg, len(mrope_section), dtype=cos.dtype)  # [D, 3]
    cos_sel = jnp.einsum("kbsd,dk->bsd", cos3, onehot)
    sin_sel = jnp.einsum("kbsd,dk->bsd", sin3, onehot)
    return cos_sel, sin_sel
