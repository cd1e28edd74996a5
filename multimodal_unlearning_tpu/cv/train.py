"""CV training: ResNet+AdMSoftmax pretrain/finetune (cv/pretrain.py,
cv/finetune.py) as jitted steps with SGD-momentum + warmup-cosine schedule
(cv/finetune.py:97-107)."""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_unlearning_tpu.models import resnet


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int):
    """LambdaLR analog: linear warmup then cosine to 0 (cv/finetune.py:97-107)."""

    def sched(step):
        w = jnp.maximum(warmup_steps, 1)
        warm = step / w
        prog = jnp.clip((step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * prog))
        return lr * jnp.where(step < warmup_steps, warm, cos)

    return sched


def sgd_momentum(lr_sched, weight_decay: float = 5e-5, momentum: float = 0.9):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr_sched, momentum=momentum),
    )


def make_classifier_step(cfg: resnet.ResNetConfig, optimizer, *, s=30.0, m=0.4, train_bn=True):
    """One AdMSoftmax training step over (params, head, bn_state)."""

    def loss_fn(trainable, bn_state, images, labels):
        params, head = trainable
        emb, new_state = resnet.forward(params, bn_state, cfg, images, train=train_bn)
        loss = resnet.adms_loss(head, emb, labels, s=s, m=m)
        return loss, new_state

    @jax.jit
    def step(trainable, opt_state, bn_state, images, labels):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, bn_state, images, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, new_bn, loss

    return step


def train_classifier(
    cfg: resnet.ResNetConfig,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    *,
    epochs: int = 2,
    batch_size: int = 64,
    lr: float = 0.1,
    weight_decay: float = 5e-5,
    seed: int = 0,
    init=None,
    log_every: int = 0,
):
    """Returns (params, head, bn_state, losses)."""
    rng = np.random.default_rng(seed)
    n = len(images)
    steps_per_epoch = max(1, n // batch_size)
    total = steps_per_epoch * epochs

    if init is None:
        params, bn_state = resnet.init_params(cfg, jax.random.PRNGKey(seed))
        head = resnet.adms_init(cfg.widths[-1], num_classes, jax.random.PRNGKey(seed + 1))
    else:
        params, head, bn_state = init
        params = jax.tree.map(jnp.copy, params)
        head = jax.tree.map(jnp.copy, head)

    tx = sgd_momentum(warmup_cosine(lr, steps_per_epoch, total), weight_decay)
    trainable = (params, head)
    opt_state = tx.init(trainable)
    step = make_classifier_step(cfg, tx)

    losses = []
    for ep in range(epochs):
        order = rng.permutation(n)
        for i in range(steps_per_epoch):
            sel = order[i * batch_size : (i + 1) * batch_size]
            trainable, opt_state, bn_state, loss = step(
                trainable, opt_state, bn_state,
                jnp.asarray(images[sel]), jnp.asarray(labels[sel]),
            )
            losses.append(float(loss))
            if log_every and len(losses) % log_every == 0:
                print(f"cv train step {len(losses)}/{total} loss {losses[-1]:.4f}", flush=True)
    params, head = trainable
    return params, head, bn_state, losses


def embed_all(cfg, params, bn_state, images: np.ndarray, batch_size: int = 256) -> np.ndarray:
    """Eval-mode embeddings for the whole corpus (attack/score hot loop)."""

    @jax.jit
    def fwd(imgs):
        emb, _ = resnet.forward(params, bn_state, cfg, imgs, train=False)
        return emb

    outs = []
    for i in range(0, len(images), batch_size):
        outs.append(np.asarray(fwd(jnp.asarray(images[i : i + batch_size]))))
    return np.concatenate(outs, axis=0)
