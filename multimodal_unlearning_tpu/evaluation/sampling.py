"""Stochastic decoding: temperature / top-k / top-p (nucleus) sampling.

The reference decodes greedily everywhere (HF ``generate`` with
``do_sample=False`` — mm/eval.py:126-133, methods/eco/attk_model.py); a
production serving stack also needs sampled decoding, so this module adds
it as a beyond-reference capability shared by ``evaluation/generate.py``
and the serving engine (serve/engine.py).

TPU-first determinism contract: token ``i`` of a stream seeded with ``s``
is drawn with ``fold_in(fold_in(key0, s), i)`` — a pure function of
(seed, output index).  The same request therefore samples the SAME stream
whether it runs solo through ``greedy_generate`` or through the
continuous-batching engine, regardless of slot placement, admission order,
or chunk boundaries (tests/test_sampling.py asserts equality).  All ops
are batch-wide and static-shape: masking via where(-inf), one sort for
top-p, ``jax.random.categorical`` per row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def row_keys(seeds):
    """Per-row PRNG keys from int32 seeds [B] (vmapped fold_in of a fixed
    base key — stable across batch shapes and devices)."""
    base = jax.random.PRNGKey(0)
    return jax.vmap(lambda s: jax.random.fold_in(base, s))(seeds)


def process_logits(logits, temperature, top_k: int = 0, top_p=1.0):
    """Scale by temperature, then restrict support to the top-k tokens and
    the top-p (nucleus) mass.  ``logits`` [B, V] float; ``temperature`` and
    ``top_p`` may be traced scalars; ``top_k`` is static (0 = off).

    Top-p keeps the smallest prefix of the descending-prob distribution
    whose mass reaches ``top_p`` (HF semantics: a token stays while the
    mass *before* it is < top_p, so the argmax always survives)."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, _NEG_INF, logits)
    if isinstance(top_p, (int, float)) and top_p >= 1.0:
        return logits  # nucleus off: skip the per-step [B,V] sort
    srt = jnp.sort(logits, axis=-1)[..., ::-1]  # descending
    probs = jax.nn.softmax(srt, axis=-1)
    before = jnp.cumsum(probs, axis=-1) - probs
    keep = before < top_p
    # smallest kept logit per row; +inf where dropped so min() ignores them
    cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, _NEG_INF, logits)


def sample_token(keys, out_idx, logits, temperature, top_k: int = 0, top_p=1.0):
    """Draw one token per row.  ``keys`` [B] PRNG keys (row_keys), ``out_idx``
    [B] int32 output positions (the fold index), ``logits`` [B, V]."""
    masked = process_logits(logits, temperature, top_k, top_p)
    return jax.vmap(
        lambda k, i, l: jax.random.categorical(jax.random.fold_in(k, i), l)
    )(keys, out_idx, masked).astype(jnp.int32)
