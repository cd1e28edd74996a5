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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_QBLOCK = 256


def hf_linear_schedule(lr: float, warmup_steps: int, total_steps: int):
    """HF Trainer default: linear warmup then linear decay to 0."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [max(warmup_steps, 1)],
    )


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
) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized first/second moments."""

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
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def leaf_update(g, mq, vq, p):
            g32 = g.astype(jnp.float32)
            m = _dequantize(mq.q, mq.scale, g.shape)
            v = _dequantize(vq.q, vq.scale, g.shape)
            m = b1 * m + (1 - b1) * g32
            v = b2 * v + (1 - b2) * g32 * g32
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            upd = -lr * (mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p.astype(jnp.float32))
            return _Upd(upd.astype(p.dtype), _QMoment(*_quantize(m, True)), _QMoment(*_quantize(v, False)))

        out = jax.tree.map(
            leaf_update, grads, state.m, state.v, params,
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
) -> optax.GradientTransformation:
    sched = (
        hf_linear_schedule(lr, warmup_steps, total_steps) if total_steps else lr
    )
    if name in ("adamw", "adamw_bnb_8bit_f32", "adamw_torch"):
        tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    elif name in ("adamw_q8", "adamw_bnb_8bit"):
        tx = adamw_q8(
            sched if callable(sched) else (lambda _: sched),
            weight_decay=weight_decay,
        )
    elif name == "sgd":
        tx = optax.sgd(sched)
    else:
        raise ValueError(f"Unknown optimizer {name}")
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
