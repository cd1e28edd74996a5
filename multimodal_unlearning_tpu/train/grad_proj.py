"""Gradient-projection unlearning (reference: nlp/grad_proj.py).

The reference vendors HF Trainer's inner loop to run TWO backward passes per
step — negative (forget, ascent) then positive (retain) — accumulating both
grad sets, then at the optimizer boundary either

- ``grad_proj``   : g ← g_neg − min(⟨g_neg, g_pos⟩ / ‖g_pos‖², 0) · g_pos
                    computed PER PARAMETER TENSOR — a separate coefficient for
                    every ``model.parameters()`` entry (nlp/grad_proj.py:482-491)
                    — stripping the component of each tensor's ascent gradient
                    that *conflicts* with retain descent.  On this framework's
                    stacked ``[L, ...]`` layer leaves that maps to a per-layer
                    coefficient along axis 0; flat leaves (embeddings, final
                    norm, lm_head) get a scalar coefficient;
- ``grad_proj_l2``: adds γ·Σ‖g_neg − g_pos‖² as an extra differentiable loss
                    (nlp/grad_proj.py:493-506).  The reference's tensor
                    bookkeeping aliases both grad dicts to the same buffers;
                    here the *intended* objective is implemented:
                    L = L_pos + γ·‖∇L_neg − ∇L_pos‖² differentiated exactly
                    (second-order autodiff — free in JAX, impossible in the
                    reference's in-place autograd without the vendored loop).

Loss definitions (nlp/grad_proj.py:42-97): per-sequence token-mean CE then
batch mean; negative is its negation.  Optimizer is SGD (nlp/forget.py:166).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from multimodal_unlearning_tpu.train.losses import shift

PROJECTION_METHODS = ("grad_proj", "grad_proj_l2")


def per_seq_mean_ce(logits, labels):
    """Per-sequence mean CE (sum / valid count) then batch mean
    (nlp/grad_proj.py:59-72) — differs from HF's global token mean."""
    lg, lb = shift(logits, labels)
    valid = lb != -100
    lb_safe = jnp.where(valid, lb, 0)
    lg32 = lg.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg32, axis=-1)
    ll = jnp.take_along_axis(lg32, lb_safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, lse - ll, 0.0)
    per_seq = jnp.sum(nll, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)
    return jnp.mean(per_seq)


def _dot(a, b):
    return sum(jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _is_stacked(path):
    """True for leaves under the stacked-layers subtree (leading dim = L)."""
    return any(getattr(k, "key", None) == "layers" for k in path)


def _project_leaf(path, n, p):
    """Reference per-tensor projection (nlp/grad_proj.py:483-491) on one leaf.

    The reference iterates ``model.parameters()`` — one coefficient per HF
    tensor, i.e. per layer per matrix.  A stacked ``[L, ...]`` leaf therefore
    gets L independent coefficients (reduced over all axes but 0); a flat
    leaf gets one.  The ``min(coef, 0)`` clamp is per tensor, so layers whose
    ascent gradient already agrees with retain descent pass through unchanged
    while conflicting layers are projected.
    """
    n32, p32 = n.astype(jnp.float32), p.astype(jnp.float32)
    if _is_stacked(path) and n.ndim >= 1:
        axes = tuple(range(1, n.ndim))
        inner = jnp.sum(n32 * p32, axis=axes, keepdims=True)
        denom = jnp.sum(p32 * p32, axis=axes, keepdims=True)
    else:
        inner = jnp.sum(n32 * p32)
        denom = jnp.sum(p32 * p32)
    coef = jnp.minimum(inner / (denom + 1e-30), 0.0)
    return (n32 - coef * p32).astype(n.dtype)


def make_grad_proj_step(apply_fn, optimizer, *, method: str = "grad_proj", gamma: float = 1.0,
                        ref_behavior: bool = False):
    """Returns jitted step(trainable, opt_state, frozen, batch) → (trainable, opt_state, metrics).

    batch: {"forget": {...}, "retain": {...}} with input_ids/labels/attention_mask.

    ``ref_behavior`` (grad_proj_l2 only) reproduces what the reference
    *actually computes* rather than the intended objective: its grad dicts
    hold the live ``param.grad`` tensors (nlp/grad_proj.py:685-688,713-716),
    ``zero_grad(set_to_none=True)`` then detaches them, and the extra
    ``new_loss.backward`` (nlp/grad_proj.py:493-506) differentiates a
    constant built from detached grads — no parameter gradient flows from the
    γ‖g_neg − g_pos‖² term at all.  The optimizer therefore steps on the
    positive (retain) gradient alone; with this flag the step does exactly
    that (analog of the ``dpo_fix`` quirk switch in train/losses.py)."""
    if method not in PROJECTION_METHODS:
        raise ValueError(f"method must be one of {PROJECTION_METHODS}")

    def neg_loss(tr, frozen, batch):
        out = apply_fn((frozen, tr) if frozen is not None else tr, batch["forget"])
        return -per_seq_mean_ce(out["logits"], jnp.asarray(batch["forget"]["labels"]))

    def pos_loss(tr, frozen, batch):
        out = apply_fn((frozen, tr) if frozen is not None else tr, batch["retain"])
        return per_seq_mean_ce(out["logits"], jnp.asarray(batch["retain"]["labels"]))

    def step(trainable, opt_state, frozen, batch):
        g_neg = jax.grad(neg_loss)(trainable, frozen, batch)
        g_pos = jax.grad(pos_loss)(trainable, frozen, batch)

        if method == "grad_proj":
            grads = jax.tree_util.tree_map_with_path(_project_leaf, g_neg, g_pos)
            # global diagnostics (the per-tensor coefficients live in `grads`)
            metrics = {"inner_product": _dot(g_neg, g_pos)}
        elif ref_behavior:  # grad_proj_l2, reference's actual numerics
            grads = g_pos
            metrics = {}
        else:  # grad_proj_l2, intended objective

            def l2_objective(tr):
                gn = jax.grad(neg_loss)(tr, frozen, batch)
                gp = jax.grad(pos_loss)(tr, frozen, batch)
                sq = sum(
                    jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
                    for a, b in zip(jax.tree.leaves(gn), jax.tree.leaves(gp))
                )
                return pos_loss(tr, frozen, batch) + gamma * sq

            grads = jax.grad(l2_objective)(trainable)
            metrics = {}

        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics["neg_loss"] = neg_loss(trainable, frozen, batch)
        metrics["pos_loss"] = pos_loss(trainable, frozen, batch)
        return trainable, opt_state, metrics

    return jax.jit(step)
