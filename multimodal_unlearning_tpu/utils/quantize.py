"""Int8 weight quantization for frozen param trees (QLoRA-style).

The reference holds student + teacher in bf16 and needs DeepSpeed sharding
across GPUs for 7B teachers (mm/trainer.py:130-162).  Here frozen trees
(teacher; LoRA base) can be stored int8 with per-output-channel scales and
dequantized layer-by-layer inside the scanned forward — 2× HBM saving, which
is what lets a 7B student + 7B teacher co-reside on one 16GB v5e chip.

A quantized leaf is ``{"q": int8[..., in, out], "s": f32[..., 1, out]}``;
``models/llama.dense`` and the embedding lookup dequantize transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_QUANT_ELEMS = 2**16


def is_qtensor(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "s"}


def quantize_leaf(w):
    """Per-output-channel (last dim) symmetric int8."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_leaf(qt, dtype=jnp.bfloat16):
    return (qt["q"].astype(jnp.float32) * qt["s"]).astype(dtype)


def quantize_tree(params, *, min_elems: int = _MIN_QUANT_ELEMS):
    """Quantize every large (≥2-D) float leaf; small leaves stay as-is."""

    def q(x):
        if (
            hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[-1] >= 256 and x.shape[-2] >= 256  # matmul weights only
            and x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
            and x.size >= min_elems
        ):
            return quantize_leaf(x)
        return x

    return jax.tree.map(q, params)


def tree_nbytes(tree) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "size")
    )
