"""Rotary position embeddings (Llama-style, half-rotation layout).

Matches the HF Llama convention (rotate_half over concatenated halves) so
imported checkpoints produce identical activations.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_table(max_len: int, head_dim: int, theta: float = 10000.0, dtype=jnp.float32):
    """Precompute (cos, sin) tables of shape [max_len, head_dim]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [L, D/2]
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
