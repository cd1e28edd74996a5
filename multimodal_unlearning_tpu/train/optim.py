"""Optimizers: AdamW, SGD, and a quantized-state AdamW (bnb-8bit analog).

The reference trains with bitsandbytes 8-bit AdamW (``optim="adamw_bnb_8bit"``,
mm/forget.py:156, mm/finetune.py:68) and SGD for the gradient-projection
methods (nlp/forget.py:166).  TPU-native equivalents:

- ``adamw``    — optax AdamW with HF's hyperparameters and the HF default
                 linear-warmup → linear-decay schedule;
- ``adamw_q8`` — AdamW whose moments live in int8 with blockwise scales
                 (block 256), dequantized/requantized inside the update —
                 same 4× optimizer-memory saving as bnb, pure JAX/XLA so the
                 quantize/dequantize fuses into the update kernel;
- ``sgd``.

Optimizer state is sharded over the ``fsdp`` axis by the trainer
(parallel/sharding.py), the ZeRO-1/2 analog.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_QBLOCK = 256


def hf_linear_schedule(lr: float, warmup_steps: int, total_steps: int):
    """HF Trainer default (transformers get_linear_schedule_with_warmup):
    linear warmup then linear decay to 0, evaluated at the pre-increment step
    count — the first optimizer step runs at lr 0, exactly like torch's
    LambdaLR.  Computed in the default float width (f64 under ``enable_x64``)
    rather than optax.linear_schedule, whose int32-count path rounds the lr
    to f32 — enough to break roundoff-exact optimizer parity tests."""
    w = max(int(warmup_steps), 1)
    t = max(int(total_steps), w + 1)

    def sched(count):
        c = jnp.asarray(count).astype(jnp.result_type(float))
        return lr * jnp.clip(jnp.minimum(c / w, (t - c) / (t - w)), 0.0, None)

    return sched


_LN_COMPONENT = re.compile(r"ln\d*|ln_[a-z0-9]+|[a-z0-9]+_ln")


def _is_no_decay_component(name: str) -> bool:
    n = name.lower()
    return (
        n == "bias" or n.endswith("_bias")
        or n == "norm" or n.endswith("_norm")
        or "layernorm" in n or "rmsnorm" in n
        or bool(_LN_COMPONENT.fullmatch(n))
    )


def hf_decay_mask(params):
    """HF Trainer applies weight decay only to non-bias / non-norm parameters
    (transformers trainer.get_decay_parameter_names: LayerNorm instances plus
    the name patterns bias / layernorm / rmsnorm / *norm*); the reference
    trains with weight_decay 0.01 everywhere (config/mm/forget.yaml:52), so
    the mask is part of its effective update rule.  True = decay.  Matched
    against this tree's naming: ``*_bias``, ``input_layernorm``,
    ``post_attention_layernorm``, ``norm``, ``q_norm``/``k_norm``, and the
    ``ln1``/``ln2``/``pre_ln``/``post_ln``/``final_ln``/``ln_q`` LayerNorm
    dicts (whose scale+bias both sit under the ln component)."""

    def decay(path) -> bool:
        return not any(
            _is_no_decay_component(str(getattr(k, "key", k))) for k in path
        )

    return jax.tree_util.tree_map_with_path(lambda p, _: decay(p), params)


def decay_mask_tree(params, reachable=None):
    """Effective weight-decay factor per leaf: HF's decay-parameter naming
    rule (``hf_decay_mask``) ∧ structural reachability.  torch.optim.AdamW
    skips parameters whose ``.grad is None`` — parameters autograd never
    reaches (e.g. LLaVA vision layers above ``vision_feature_layer``, HF
    hidden_states[-2] selection) are never stepped NOR weight-decayed by the
    reference, while a functional optimizer sees exact-zero gradients and
    would still decay them.  ``reachable`` leaves are 1.0/0.0 scalars or
    per-layer [L,1,..] arrays for stacked-layer leaves (models/llava.py
    ``reachable_mask``)."""
    base = hf_decay_mask(params)
    if reachable is None:
        return base
    r = reachable(params) if callable(reachable) else reachable
    return jax.tree.map(lambda b, m: m if b else False, base, r)


def add_decayed_weights_masked(
    weight_decay: float, factor
) -> optax.GradientTransformation:
    """optax.add_decayed_weights with an elementwise (not just per-leaf)
    mask: ``factor`` is a params-shaped tree (or callable producing one) of
    bools / floats / broadcastable 0-1 arrays."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        f = factor(params) if callable(factor) else factor

        def leaf(u, p, m):
            if isinstance(m, bool) or m is None:
                if not m:
                    return u
                return u + weight_decay * p.astype(u.dtype)
            return u + weight_decay * (p * m).astype(u.dtype)

        return jax.tree.map(leaf, updates, params, f), state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics, as run by HF Trainer every
    step at the TrainingArguments default max_grad_norm=1.0 (the reference
    comments its override out, mm/forget.py:151): scale ALL grads by
    min(1, max_norm / (total_norm + 1e-6)) — torch's +1e-6 is observable
    (optax.clip_by_global_norm omits it), so it is reproduced here."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# int8 blockwise moment quantization
# ---------------------------------------------------------------------------


def _blocks(x):
    flat = x.reshape(-1)
    pad = (-flat.size) % _QBLOCK
    return jnp.pad(flat, (0, pad)).reshape(-1, _QBLOCK)


def _unblocks(blocks, shape):
    flat = blocks.reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


def _quantize(x, signed: bool):
    """signed: symmetric linear int8 (first moment).
    unsigned: quartic-root-domain uint8 (second moment) — linear int8 would
    flush small v entries in a block to 0 and the update m/(√v+ε) explodes;
    the root transform keeps ~4 decades of dynamic range representable."""
    blocks = _blocks(x)
    if signed:
        absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    else:
        absmax = jnp.max(blocks, axis=1, keepdims=True)
        scale = jnp.where(absmax > 0, absmax, 1.0)
        w = jnp.sqrt(jnp.sqrt(jnp.maximum(blocks, 0.0) / scale))
        q = jnp.clip(jnp.round(w * 255.0), 0, 255).astype(jnp.uint8)
    return q, scale.astype(jnp.float32)


def _dequantize(q, scale, shape):
    if q.dtype == jnp.uint8:
        w = q.astype(jnp.float32) / 255.0
        blocks = (w**4) * scale
    else:
        blocks = q.astype(jnp.float32) * scale
    return _unblocks(blocks, shape)


class _QMoment(NamedTuple):
    q: jnp.ndarray
    scale: jnp.ndarray


class AdamWQ8State(NamedTuple):
    count: jnp.ndarray
    m: dict
    v: dict


def adamw_q8(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask=None,
) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized first/second moments.

    ``mask``: like optax.adamw's — a params-shaped bool tree (or callable
    producing one) selecting which leaves receive weight decay; bnb's 8-bit
    AdamW gets the same decay groups from HF Trainer's create_optimizer."""

    def init_fn(params):
        def qinit(p):
            z = jnp.zeros(p.shape, jnp.float32)
            q, s = _quantize(z, signed=True)
            return _QMoment(q, s)

        return AdamWQ8State(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree.map(qinit, params),
            v=jax.tree.map(qinit, params),
        )

    class _Upd(NamedTuple):
        upd: jnp.ndarray
        m: _QMoment
        v: _QMoment

    def update_fn(grads, state, params):
        # lr at the PRE-increment count (HF LambdaLR: first step runs at 0);
        # bias corrections at the post-increment count (torch step counter)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        count = state.count + 1
        decay_tree = (
            None if mask is None
            else (mask(params) if callable(mask) else mask)
        )

        def leaf_update(g, mq, vq, p, wd_on):
            # wd_on: python bool, or a broadcastable 0-1 array for
            # elementwise decay masking (decay_mask_tree)
            g32 = g.astype(jnp.float32)
            m = _dequantize(mq.q, mq.scale, g.shape)
            v = _dequantize(vq.q, vq.scale, g.shape)
            m = b1 * m + (1 - b1) * g32
            v = b2 * v + (1 - b2) * g32 * g32
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            if isinstance(wd_on, bool):
                decay = weight_decay * p.astype(jnp.float32) if wd_on else 0.0
            else:
                decay = weight_decay * (p.astype(jnp.float32) * wd_on)
            upd = -lr * (mhat / (jnp.sqrt(vhat) + eps) + decay)
            return _Upd(upd.astype(p.dtype), _QMoment(*_quantize(m, True)), _QMoment(*_quantize(v, False)))

        wd_tree = (
            jax.tree.map(lambda _: True, grads) if decay_tree is None else decay_tree
        )
        out = jax.tree.map(
            leaf_update, grads, state.m, state.v, params, wd_tree,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        is_upd = lambda x: isinstance(x, _Upd)
        updates = jax.tree.map(lambda t: t.upd, out, is_leaf=is_upd)
        new_m = jax.tree.map(lambda t: t.m, out, is_leaf=is_upd)
        new_v = jax.tree.map(lambda t: t.v, out, is_leaf=is_upd)
        return updates, AdamWQ8State(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    name: str,
    lr: float,
    *,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    total_steps: int = 0,
    max_grad_norm: float | None = None,
    reachable_mask=None,
) -> optax.GradientTransformation:
    """``reachable_mask``: optional params-shaped tree (or callable) of
    1/0 reachability factors — see ``decay_mask_tree``."""
    sched = (
        hf_linear_schedule(lr, warmup_steps, total_steps) if total_steps else lr
    )
    mask = (
        (lambda p: decay_mask_tree(p, reachable_mask)) if weight_decay else None
    )
    if name in ("adamw", "adamw_bnb_8bit_f32", "adamw_torch"):
        # same composition as optax.adamw, with the elementwise-capable decay
        tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            add_decayed_weights_masked(weight_decay, mask)
            if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(sched),
        )
    elif name in ("adamw_q8", "adamw_bnb_8bit"):
        tx = adamw_q8(
            sched if callable(sched) else (lambda _: sched),
            weight_decay=weight_decay, mask=mask,
        )
    elif name == "sgd":
        tx = optax.sgd(sched)
    else:
        raise ValueError(f"Unknown optimizer {name}")
    if max_grad_norm:
        # HF TrainingArguments clips at max_grad_norm=1.0 by DEFAULT and the
        # reference keeps the default (mm/forget.py:151 commented out)
        tx = optax.chain(clip_by_global_norm_torch(max_grad_norm), tx)
    return tx
