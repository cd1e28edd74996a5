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
    """|Σ grads| over forget batches; grad_fn(trainable, batch) → grads.

    The reference sums the SIGNED per-batch gradients and takes the absolute
    value once at the end (generate_mask.py:41-49) — NOT Σ|g|; grads that
    cancel across batches rank low."""
    acc = None
    for batch in batches:
        g = jax.tree.map(lambda x: x.astype(jnp.float32), grad_fn(trainable, batch))
        acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
    return jax.tree.map(jnp.abs, acc)


def masks_for_thresholds(saliency, thresholds=THRESHOLDS) -> dict[float, dict]:
    """Per-tensor top-k binary masks, reference-exact (generate_mask.py:54-85):

    - magnitudes are ranked in FLOAT16 (the reference casts the accumulated
      |grad| to half before sorting, generate_mask.py:49);
    - the kept count is ``int(t * numel)`` — TRUNCATION, so small tensors at
      small thresholds can keep zero entries;
    - exactly that many entries are set (descending sort order), not
      everything ≥ the cutoff value — ties at the boundary don't inflate
      the mask.
    """
    def _rows_mask(flat16, t):
        """Top-int(t·n) per row of [R, n] (rank in fp16, stable descending)."""
        R, n = flat16.shape
        k = int(t * n)
        mask = jnp.zeros((R, n), jnp.float32)
        if k:
            order = jnp.argsort(-flat16.astype(jnp.float32), axis=1)
            mask = mask.at[jnp.arange(R)[:, None], order[:, :k]].set(1.0)
        return mask

    out = {}
    for t in thresholds:
        def mask_leaf(path, x):
            # the reference ranks PER model.parameters() TENSOR — on this
            # framework's stacked [L, ...] layer leaves that is per layer
            # along axis 0, like train/grad_proj.py's per-tensor coefficients
            if _is_stacked(path) and x.ndim >= 2:
                flat = x.reshape(x.shape[0], -1).astype(jnp.float16)
            else:
                flat = x.reshape(1, -1).astype(jnp.float16)
            return _rows_mask(flat, t).reshape(x.shape)

        out[t] = jax.tree_util.tree_map_with_path(mask_leaf, saliency)
    return out


def _is_stacked(path):
    """True for leaves under the stacked-layers subtree (leading dim = L)."""
    return any(getattr(k, "key", None) == "layers" for k in path)


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
