"""The 9 cv unlearning methods (reference: cv/unlearning/*.py), JAX-native.

Semantics pinned to the reference scripts:
- retrain        gold: re-finetune from the pretrained net on retain only
                 (cv/unlearning/retrain.py:76-120)
- finetune       retain-only finetune from the finetuned net
- neggrad        per epoch: GA (−AdMS) over forget, then CE over retain
                 (cv/unlearning/neggrad.py:21-49)
- sparsity       retain CE + α·L1(all params) (cv/unlearning/sparsity.py)
- scrub          CosineEmbeddingLoss against cached original embeddings:
                 forget target −1, retain target +1, forget repeated
                 ``balance``× in the loader (cv/unlearning/scrub.py)
- scrub_orig     −KL(student‖orig) on forget + KL + AdMS CE on retain; KL is
                 batchmean over *embedding* softmax (cv/unlearning/scrub_orig.py)
- twins          MSE to original embeddings of horizontally-flipped forget
                 inputs; retain to own (cv/unlearning/twins.py:99-120)
- rmu            MSE to C·U(−1,1) for forget, original embeddings for retain
                 (cv/unlearning/rmu.py:100-116)
- dpo            sigmoid preference on per-class log-prob ratios vs a frozen
                 reference, fc grafted from raw AdMSoftmax weights
                 (cv/unlearning/dpo.py:20-48,100-115)
- llmu           0.02·GA + retain-KL + 0.01·random-label CE
                 (cv/unlearning/llmu.py:21-49)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_unlearning_tpu.cv.train import embed_all, sgd_momentum, train_classifier, warmup_cosine
from multimodal_unlearning_tpu.models import resnet

METHODS = (
    "retrain", "finetune", "neggrad", "sparsity", "scrub",
    "scrub_orig", "twins", "rmu", "dpo", "llmu",
)


def _l1_all(params_tuple):
    leaves = [x.reshape(-1) for x in jax.tree.leaves(params_tuple)]
    return jnp.sum(jnp.abs(jnp.concatenate(leaves)))


def _kl_batchmean(student_logits, orig_logits):
    """nn.KLDivLoss(reduction='batchmean')(log_softmax(s), softmax(o))."""
    ls = jax.nn.log_softmax(student_logits, axis=1)
    po = jax.nn.softmax(orig_logits, axis=1)
    lo = jax.nn.log_softmax(orig_logits, axis=1)
    return jnp.sum(po * (lo - ls)) / student_logits.shape[0]


def _epoch_batches(rng, idx, bs, shuffle=True, drop_last=True):
    order = np.array(idx)
    if shuffle:
        rng.shuffle(order)
    end = len(order) - len(order) % bs if drop_last else len(order)
    for i in range(0, max(end, 0), bs):
        yield order[i : i + bs]


def unlearn(
    method: str,
    cfg: resnet.ResNetConfig,
    ckpt,  # (params, head, bn_state) from finetune
    pretrained,  # (params, head, bn_state) from pretrain (for retrain)
    images: np.ndarray,
    labels: np.ndarray,
    splits: dict,
    *,
    forget_size: int = 10,
    epochs: int = 2,
    batch_size: int = 64,
    lr: float = 0.01,
    weight_decay: float = 5e-5,
    beta: float = 1.0,
    alpha: float = 1e-4,
    rmu_c: float = 5.0,
    balance: int = 5,
    num_classes: int | None = None,
    seed: int = 0,
):
    """Returns (params, head, bn_state)."""
    if method not in METHODS:
        raise ValueError(f"Unknown cv unlearning method {method}; known: {METHODS}")
    num_classes = num_classes or int(labels.max()) + 1
    forget_idx = splits[f"forget_{forget_size:02d}"]
    retain_idx = splits[f"retain_{100 - forget_size}"]
    rng = np.random.default_rng(seed)

    params, head, bn_state = ckpt

    if method in ("retrain", "finetune"):
        init = pretrained if method == "retrain" else ckpt
        sel = np.array(retain_idx)
        p, h, s, _ = train_classifier(
            cfg, images[sel], labels[sel], num_classes,
            epochs=epochs, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay, seed=seed, init=init,
        )
        return p, h, s

    tx = sgd_momentum(
        warmup_cosine(lr, 1, max(1, epochs * len(retain_idx) // batch_size)),
        weight_decay,
    )
    orig_params = jax.tree.map(jnp.copy, params)
    orig_head = jax.tree.map(jnp.copy, head)
    orig_bn = jax.tree.map(jnp.copy, bn_state)

    def emb(p, s, imgs, train=True):
        return resnet.forward(p, s, cfg, imgs, train=train)

    def orig_emb(imgs):
        e, _ = resnet.forward(orig_params, orig_bn, cfg, imgs, train=False)
        return jax.lax.stop_gradient(e)

    # ----- per-method loss over one batch dict --------------------------
    if method == "neggrad":
        def loss_fn(tr, bn, batch):
            p, h = tr
            e, new_bn = emb(p, bn, batch["images"])
            sign = batch["sign"]  # +1 retain CE phase, -1 forget GA phase
            return sign * resnet.adms_loss(h, e, batch["labels"]), new_bn

    elif method == "sparsity":
        def loss_fn(tr, bn, batch):
            p, h = tr
            e, new_bn = emb(p, bn, batch["images"])
            return resnet.adms_loss(h, e, batch["labels"]) + alpha * _l1_all(tr), new_bn

    elif method == "scrub":
        def loss_fn(tr, bn, batch):
            p, h = tr
            e, new_bn = emb(p, bn, batch["images"])
            t, y = batch["targets"], batch["y"]
            cos = jnp.sum(e * t, axis=1) / (
                jnp.linalg.norm(e, axis=1) * jnp.linalg.norm(t, axis=1) + 1e-12
            )
            # CosineEmbeddingLoss, margin 0
            per = jnp.where(y > 0, 1.0 - cos, jnp.maximum(cos, 0.0))
            return jnp.mean(per), new_bn

    elif method in ("twins", "rmu"):
        def loss_fn(tr, bn, batch):
            p, h = tr
            e, new_bn = emb(p, bn, batch["images"])
            return jnp.mean((e - batch["targets"]) ** 2), new_bn

    elif method == "scrub_orig":
        def loss_fn(tr, bn, batch):
            p, h = tr
            ef, bn1 = emb(p, bn, batch["forget_images"])
            forget_loss = -_kl_batchmean(ef, orig_emb(batch["forget_images"]))
            er, new_bn = emb(p, bn1, batch["retain_images"])
            kl_loss = _kl_batchmean(er, orig_emb(batch["retain_images"]))
            ce_loss = resnet.adms_loss(h, er, batch["retain_labels"])
            return forget_loss + kl_loss + ce_loss, new_bn

    elif method == "llmu":
        def loss_fn(tr, bn, batch):
            p, h = tr
            ef, bn1 = emb(p, bn, batch["forget_images"])
            forget_loss = -resnet.adms_loss(h, ef, batch["forget_labels"])
            efr, bn2 = emb(p, bn1, batch["forget_images"])
            random_loss = resnet.adms_loss(h, efr, batch["random_labels"])
            er, new_bn = emb(p, bn2, batch["retain_images"])
            retain_loss = _kl_batchmean(er, orig_emb(batch["retain_images"]))
            return 0.02 * forget_loss + retain_loss + 0.01 * random_loss, new_bn

    elif method == "dpo":
        fc_w = orig_head["weight"]  # raw AdMS weights grafted (dpo.py:103-115)

        def class_logprob(p, bn, imgs, targets, train):
            e, new_bn = emb(p, bn, imgs, train=train)
            # β·log(p/p_orig) computed as a log-softmax difference — identical
            # to the reference's softmax ratio (cv/unlearning/dpo.py:20-36)
            # but stable when either prob underflows
            lp = jax.nn.log_softmax(e @ fc_w.astype(e.dtype), axis=1)
            orig_e = orig_emb(imgs)
            olp = jax.nn.log_softmax(orig_e @ fc_w.astype(e.dtype), axis=1)
            ratio = beta * (lp - olp)
            return ratio[jnp.arange(len(targets)), targets], new_bn

        def loss_fn(tr, bn, batch):
            p, h = tr
            fl, bn1 = class_logprob(p, bn, batch["forget_images"], batch["forget_labels"], True)
            rl, new_bn = class_logprob(p, bn1, batch["retain_images"], batch["retain_labels"], True)
            n = min(fl.shape[0], rl.shape[0])
            loss = -(1.0 / beta) * jnp.mean(jax.nn.log_sigmoid(rl[:n] - fl[:n]))
            return loss, new_bn

    trainable = (params, head)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state, bn_state, batch):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, bn_state, batch
        )
        updates, opt_state = optimizer_update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, new_bn, loss

    optimizer_update = tx.update

    # ----- batch construction per method --------------------------------
    cached_targets = None
    if method in ("scrub", "twins", "rmu"):
        orig_all = embed_all(cfg, orig_params, orig_bn, images)
        cached_targets = np.array(orig_all)
        if method == "twins":
            flipped = images[:, :, ::-1, :].copy()
            cached_targets[forget_idx] = embed_all(cfg, orig_params, orig_bn, flipped)[forget_idx]
        elif method == "rmu":
            for i in forget_idx:
                cached_targets[i] = rmu_c * rng.uniform(-1, 1, size=cached_targets.shape[1]).astype(np.float32)

    for ep in range(epochs):
        if method == "neggrad":
            for sel in _epoch_batches(rng, forget_idx, batch_size, drop_last=False):
                batch = {"images": jnp.asarray(images[sel]), "labels": jnp.asarray(labels[sel]), "sign": -1.0}
                trainable, opt_state, bn_state, _ = step(trainable, opt_state, bn_state, batch)
            for sel in _epoch_batches(rng, retain_idx, batch_size, drop_last=False):
                batch = {"images": jnp.asarray(images[sel]), "labels": jnp.asarray(labels[sel]), "sign": 1.0}
                trainable, opt_state, bn_state, _ = step(trainable, opt_state, bn_state, batch)

        elif method == "sparsity":
            for sel in _epoch_batches(rng, retain_idx, batch_size):
                batch = {"images": jnp.asarray(images[sel]), "labels": jnp.asarray(labels[sel])}
                trainable, opt_state, bn_state, _ = step(trainable, opt_state, bn_state, batch)

        elif method in ("scrub", "twins", "rmu"):
            pool = (balance * list(forget_idx) + list(retain_idx)) if method == "scrub" else (
                list(forget_idx) + list(retain_idx)
            )
            y_sign = np.ones(len(images), np.float32)
            y_sign[forget_idx] = -1.0
            for sel in _epoch_batches(rng, pool, batch_size):
                batch = {
                    "images": jnp.asarray(images[sel]),
                    "targets": jnp.asarray(cached_targets[sel]),
                    "y": jnp.asarray(y_sign[sel]),
                }
                trainable, opt_state, bn_state, _ = step(trainable, opt_state, bn_state, batch)

        else:  # paired retain/forget loaders (scrub_orig, llmu, dpo)
            f_batches = list(_epoch_batches(rng, forget_idx, min(batch_size, len(forget_idx))))
            r_batches = list(_epoch_batches(rng, retain_idx, batch_size, drop_last=False))
            for fb, rb in zip(f_batches * (len(r_batches) // max(len(f_batches), 1) + 1), r_batches):
                batch = {
                    "forget_images": jnp.asarray(images[fb]),
                    "forget_labels": jnp.asarray(labels[fb]),
                    "retain_images": jnp.asarray(images[rb]),
                    "retain_labels": jnp.asarray(labels[rb]),
                }
                if method == "llmu":
                    batch["random_labels"] = jnp.asarray(
                        rng.choice(num_classes, size=len(fb)).astype(np.int32)
                    )
                trainable, opt_state, bn_state, _ = step(trainable, opt_state, bn_state, batch)

    params, head = trainable
    return params, head, bn_state
