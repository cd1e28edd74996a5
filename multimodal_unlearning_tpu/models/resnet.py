"""ResNet-18 face-embedding backbone + AdMSoftmax head (cv stack).

Reference: torchvision resnet18 with ``fc → Flatten`` producing 512-d
embeddings (cv/pretrain.py:96-132) and an additive-margin softmax head
(cv/AdMSLoss.py:6-36).  Functional JAX with explicit BatchNorm state.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: tuple = (2, 2, 2, 2)      # ResNet-18
    widths: tuple = (64, 128, 256, 512)
    embedding_dim: int = 512
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    small_inputs: bool = False             # 3x3 stem, no maxpool (tiny test images)


def _conv_init(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
    )


def init_params(cfg: ResNetConfig, key):
    """Returns (params, bn_state)."""
    params, state = {}, {}
    keys = jax.random.split(key, 64)
    ki = iter(range(64))

    stem_k = 3 if cfg.small_inputs else 7
    params["stem"] = {"conv": _conv_init(keys[next(ki)], (stem_k, stem_k, 3, cfg.widths[0]))}
    params["stem"]["bn"], state["stem"] = _bn_init(cfg.widths[0])

    in_c = cfg.widths[0]
    for s, (n_blocks, width) in enumerate(zip(cfg.stage_sizes, cfg.widths)):
        for b in range(n_blocks):
            name = f"s{s}b{b}"
            stride = 2 if (b == 0 and s > 0) else 1
            blk = {
                "conv1": _conv_init(keys[next(ki)], (3, 3, in_c, width)),
                "conv2": _conv_init(keys[next(ki)], (3, 3, width, width)),
            }
            st = {}
            blk["bn1"], st["bn1"] = _bn_init(width)
            blk["bn2"], st["bn2"] = _bn_init(width)
            if stride != 1 or in_c != width:
                blk["down_conv"] = _conv_init(keys[next(ki)], (1, 1, in_c, width))
                blk["down_bn"], st["down_bn"] = _bn_init(width)
            params[name] = blk
            state[name] = st
            in_c = width
    return params, state


def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _bn(x, p, s, train: bool, momentum, eps):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_s = {
            "mean": momentum * s["mean"] + (1 - momentum) * mean,
            "var": momentum * s["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_s


def forward(params, state, cfg: ResNetConfig, x, train: bool = False):
    """x: [B, H, W, 3] → (embeddings [B, 512], new_bn_state)."""
    new_state = {}
    stride = 1 if cfg.small_inputs else 2
    h = _conv(x, params["stem"]["conv"], stride)
    h, new_state["stem"] = _bn(h, params["stem"]["bn"], state["stem"], train, cfg.bn_momentum, cfg.bn_eps)
    h = jax.nn.relu(h)
    if not cfg.small_inputs:
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
        )

    in_c = cfg.widths[0]
    for s, (n_blocks, width) in enumerate(zip(cfg.stage_sizes, cfg.widths)):
        for b in range(n_blocks):
            name = f"s{s}b{b}"
            blk, st = params[name], state[name]
            nst = {}
            stride = 2 if (b == 0 and s > 0) else 1
            y = _conv(h, blk["conv1"], stride)
            y, nst["bn1"] = _bn(y, blk["bn1"], st["bn1"], train, cfg.bn_momentum, cfg.bn_eps)
            y = jax.nn.relu(y)
            y = _conv(y, blk["conv2"], 1)
            y, nst["bn2"] = _bn(y, blk["bn2"], st["bn2"], train, cfg.bn_momentum, cfg.bn_eps)
            if "down_conv" in blk:
                sc = _conv(h, blk["down_conv"], stride)
                sc, nst["down_bn"] = _bn(sc, blk["down_bn"], st["down_bn"], train, cfg.bn_momentum, cfg.bn_eps)
            else:
                sc = h
            h = jax.nn.relu(y + sc)
            new_state[name] = nst
            in_c = width

    emb = jnp.mean(h, axis=(1, 2))  # global average pool → [B, 512]
    return emb, new_state


def adms_init(embedding_dim: int, num_classes: int, key):
    """AdMSoftmax weight (cv/AdMSLoss.py:12): normalized class prototypes."""
    w = jax.random.normal(key, (embedding_dim, num_classes)) * embedding_dim**-0.5
    return {"weight": w}


def adms_logits(head, emb, *, normalize_w: bool = False):
    """Margin-head logits: normalized features · prototypes.

    The reference does NOT normalize the weight matrix: its
    ``for W in self.fc.parameters(): W = F.normalize(W, dim=1)`` rebinds the
    loop variable and discards the result (cv/AdMSLoss.py:26-27), so ``wf``
    is x̂ @ Wᵀ with W unnormalized and free to grow during training.
    ``normalize_w=True`` is the textbook AM-softmax (true cosine logits) —
    a documented fix, off by default for reference parity."""
    w = head["weight"]
    if normalize_w:
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
    e = emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
    return e @ w


def adms_loss(head, emb, labels, s: float = 30.0, m: float = 0.4,
              *, normalize_w: bool = False):
    """Additive-margin softmax loss (cv/AdMSLoss.py:18-35)."""
    cos = adms_logits(head, emb, normalize_w=normalize_w)
    onehot = jax.nn.one_hot(labels, cos.shape[-1])
    margin_cos = cos - onehot * m
    logits = s * margin_cos
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))
