"""SalUn saliency-mask generation (reference: methods/salun/generate_mask.py).

Accumulates |∇θ| of the forget-set CE over the model, then emits binary
masks keeping the top-t fraction of weights per tensor for thresholds
0.1..1.0 (generate_mask.py:52-85), saved as ``with_{t}.npz``.

Unlike the reference (mask produced, never consumed in-repo), the trainer
can consume these: ``apply_salun_mask(grads, mask)`` zeroes non-salient
gradient entries inside any optax pipeline.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)


def accumulate_saliency(grad_fn, trainable, batches) -> dict:
    """Sum of |grad| over forget batches; grad_fn(trainable, batch) → grads."""
    acc = None
    for batch in batches:
        g = grad_fn(trainable, batch)
        g_abs = jax.tree.map(lambda x: jnp.abs(x.astype(jnp.float32)), g)
        acc = g_abs if acc is None else jax.tree.map(jnp.add, acc, g_abs)
    return acc


def masks_for_thresholds(saliency, thresholds=THRESHOLDS) -> dict[float, dict]:
    """Per-tensor top-k binary masks (generate_mask.py:54-85: threshold is the
    kept fraction per tensor, ranked by accumulated |grad|)."""
    out = {}
    for t in thresholds:
        def mask_leaf(x):
            flat = x.reshape(-1)
            k = max(1, int(round(t * flat.size)))
            kth = jnp.sort(flat)[-k]
            return (x >= kth).astype(jnp.float32)

        out[t] = jax.tree.map(mask_leaf, saliency)
    return out


def save_masks(masks: dict[float, dict], out_dir: str):
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    for t, mask in masks.items():
        flat = {}
        for kp, leaf in jax.tree_util.tree_flatten_with_path(mask)[0]:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            flat[key] = np.asarray(leaf)
        np.savez(p / f"with_{t}.npz", **flat)


def load_mask(path: str, template) -> dict:
    z = np.load(path)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, _ in leaves_kp:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        leaves.append(jnp.asarray(z[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def apply_salun_mask(grads, mask):
    """Zero non-salient gradient entries (the mask consumer the reference
    never shipped)."""
    return jax.tree.map(lambda g, m: g * m.astype(g.dtype), grads, mask)
