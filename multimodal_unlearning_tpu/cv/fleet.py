"""Vmapped shadow-model fleet: train/unlearn ALL shadow models at once.

The reference runs its 128-shadow U-LIRA pipeline as 128 sequential
single-GPU jobs (cv/run_finetune.py:10-20, cv/run_unlearn.py:32-35,
cv/prepare_vtofu_dataset.py:105-166).  On TPU the right shape is a *fleet*:
the per-shadow models are tiny, so all S shadows train simultaneously as one
``jax.vmap``-batched program — per-step work becomes an [S, ...] batch that
actually fills the MXU, and dispatch cost drops from S×steps to steps.

Per-shadow randomness (data order, RMU control vectors, LLMU random labels)
reproduces cv/train.py:train_classifier and cv/unlearn.py:unlearn exactly:
the same ``np.random.default_rng(seed + i)`` call sequence is replayed on
the host to precompute per-shadow batch-index tensors, and the vmapped step
applies the identical math — tests/test_cv.py asserts fleet == sequential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_unlearning_tpu.cv import unlearn as unlearn_mod
from multimodal_unlearning_tpu.cv.train import sgd_momentum, warmup_cosine
from multimodal_unlearning_tpu.models import resnet


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _broadcast_tree(tree, S):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), tree)


def train_classifier_fleet(
    cfg: resnet.ResNetConfig,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    train_sel: np.ndarray,  # [S, n] global indices, uniform size
    *,
    epochs: int = 2,
    batch_size: int = 64,
    lr: float = 0.1,
    weight_decay: float = 5e-5,
    seed: int = 0,
    init=None,
    init_stacked: bool = False,
):
    """Train S classifiers simultaneously; shadow i matches
    train_classifier(images[sel_i], ..., seed=seed+i) exactly.
    ``init``: single (params, head, bn) broadcast to the fleet, or — with
    ``init_stacked`` — already-stacked per-shadow trees.
    Returns stacked (params, head, bn_state, losses[S, total])."""
    S, n = train_sel.shape
    # a split smaller than batch_size trains full-batch (the sequential path's
    # order[b*bs:(b+1)*bs] slice just comes up short; here widths are static)
    batch_size = min(batch_size, n)
    steps_per_epoch = max(1, n // batch_size)
    total = steps_per_epoch * epochs

    # per-shadow batch schedule, replaying the sequential rng call order
    batch_idx = np.empty((total, S, batch_size), np.int32)
    for i in range(S):
        rng = np.random.default_rng(seed + i)
        t = 0
        for _ in range(epochs):
            order = rng.permutation(n)
            for b in range(steps_per_epoch):
                local = order[b * batch_size:(b + 1) * batch_size]
                batch_idx[t, i] = train_sel[i][local]
                t += 1

    if init is None:
        keys = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(S)])
        hkeys = jnp.stack([jax.random.PRNGKey(seed + i + 1) for i in range(S)])
        params, bn_state = jax.vmap(lambda k: resnet.init_params(cfg, k))(keys)
        head = jax.vmap(lambda k: resnet.adms_init(cfg.widths[-1], num_classes, k))(hkeys)
    elif init_stacked:
        params, head, bn_state = jax.tree.map(jnp.copy, init)
    else:
        p0, h0, b0 = init
        params = _broadcast_tree(p0, S)
        head = _broadcast_tree(h0, S)
        bn_state = _broadcast_tree(b0, S)

    tx = sgd_momentum(warmup_cosine(lr, steps_per_epoch, total), weight_decay)
    trainable = (params, head)
    opt_state = jax.vmap(tx.init)(trainable)
    images_d = jnp.asarray(images)
    labels_d = jnp.asarray(labels)

    def one(tr, os, bn, imgs, labs):
        def loss_fn(tr, bn):
            p, h = tr
            emb, new_bn = resnet.forward(p, bn, cfg, imgs, train=True)
            return resnet.adms_loss(h, emb, labs), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr, bn)
        updates, os = tx.update(grads, os, tr)
        return optax.apply_updates(tr, updates), os, new_bn, loss

    @jax.jit
    def run(trainable, opt_state, bn_state, batch_idx):
        def body(carry, bidx):
            tr, os, bn = carry
            tr, os, bn, loss = jax.vmap(one)(
                tr, os, bn, images_d[bidx], labels_d[bidx]
            )
            return (tr, os, bn), loss

        (tr, os, bn), losses = jax.lax.scan(body, (trainable, opt_state, bn_state), batch_idx)
        return tr, bn, losses

    (params, head), bn_state, losses = run(trainable, opt_state, bn_state, jnp.asarray(batch_idx))
    return params, head, bn_state, np.asarray(losses).T


def embed_all_fleet(cfg, params, bn_state, images: np.ndarray) -> np.ndarray:
    """[S, N, D] eval-mode embeddings for S stacked models."""

    @jax.jit
    def fwd(p, bn):
        def one(p, bn):
            e, _ = resnet.forward(p, bn, cfg, jnp.asarray(images), train=False)
            return e

        return jax.vmap(one)(p, bn)

    return np.asarray(fwd(params, bn_state))


def unlearn_fleet(
    method: str,
    cfg: resnet.ResNetConfig,
    ckpts,  # stacked (params[S], head[S], bn[S]) from the finetuned fleet
    pretrained,  # single (params, head, bn) or None (for retrain)
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
    pretrained_stacked: bool = False,
):
    """All S shadows of one method in vmapped steps; shadow i reproduces
    unlearn(..., seed=seed+i).  ``pretrained`` may be stacked per-shadow
    (``pretrained_stacked``) — e.g. when retrain should restart from each
    shadow's own checkpoint.  Returns stacked (params, head, bn_state)."""
    if method not in unlearn_mod.METHODS:
        raise ValueError(f"Unknown cv unlearning method {method}")
    num_classes = num_classes or int(labels.max()) + 1
    forget_idx = list(splits[f"forget_{forget_size:02d}"])
    retain_idx = list(splits[f"retain_{100 - forget_size}"])
    params, head, bn_state = ckpts
    S = jax.tree.leaves(params)[0].shape[0]
    rngs = [np.random.default_rng(seed + i) for i in range(S)]

    if method in ("retrain", "finetune"):
        sel = np.tile(np.asarray(retain_idx, np.int32)[None], (S, 1))
        if method == "retrain":
            p, h, bn, _ = train_classifier_fleet(
                cfg, images, labels, num_classes, sel,
                epochs=epochs, batch_size=batch_size, lr=lr,
                weight_decay=weight_decay, seed=seed,
                init=pretrained, init_stacked=pretrained_stacked,
            )
            return p, h, bn
        # finetune: continue from each shadow's own ckpt — same schedule, but
        # per-shadow init; reuse the fleet trainer with stacked init
        n = sel.shape[1]
        batch_size = min(batch_size, n)  # small splits train full-batch
        steps_per_epoch = max(1, n // batch_size)
        total = steps_per_epoch * epochs
        batch_idx = np.empty((total, S, batch_size), np.int32)
        for i in range(S):
            t = 0
            for _ in range(epochs):
                order = rngs[i].permutation(n)
                for b in range(steps_per_epoch):
                    batch_idx[t, i] = sel[i][order[b * batch_size:(b + 1) * batch_size]]
                    t += 1
        tx = sgd_momentum(warmup_cosine(lr, steps_per_epoch, total), weight_decay)
        trainable = (jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, head))
        opt_state = jax.vmap(tx.init)(trainable)
        images_d, labels_d = jnp.asarray(images), jnp.asarray(labels)

        def one(tr, os, bn, imgs, labs):
            def loss_fn(tr, bn):
                p, h = tr
                emb, new_bn = resnet.forward(p, bn, cfg, imgs, train=True)
                return resnet.adms_loss(h, emb, labs), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr, bn)
            updates, os = tx.update(grads, os, tr)
            return optax.apply_updates(tr, updates), os, new_bn, loss

        @jax.jit
        def run(trainable, opt_state, bn_state, batch_idx):
            def body(carry, bidx):
                tr, os, bn = carry
                tr, os, bn, _ = jax.vmap(one)(tr, os, bn, images_d[bidx], labels_d[bidx])
                return (tr, os, bn), None

            (tr, os, bn), _ = jax.lax.scan(body, (trainable, opt_state, bn_state), batch_idx)
            return tr, bn

        (p, h), bn = run(trainable, opt_state, bn_state, jnp.asarray(batch_idx))
        return p, h, bn

    # ---- gradient-based unlearning methods --------------------------------
    tx = sgd_momentum(
        warmup_cosine(lr, 1, max(1, epochs * len(retain_idx) // batch_size)),
        weight_decay,
    )
    orig_params = jax.tree.map(jnp.copy, params)
    orig_head = jax.tree.map(jnp.copy, head)
    orig_bn = jax.tree.map(jnp.copy, bn_state)
    images_d, labels_d = jnp.asarray(images), jnp.asarray(labels)

    def orig_emb_one(op, ob, imgs):
        e, _ = resnet.forward(op, ob, cfg, imgs, train=False)
        return jax.lax.stop_gradient(e)

    # per-shadow loss over one batch dict (same math as unlearn_mod loss_fns;
    # orig model is an explicit argument so the fleet can vmap it)
    def loss_fn(tr, bn, batch, orig):
        p, h = tr

        def emb(p, bn, imgs):
            return resnet.forward(p, bn, cfg, imgs, train=True)

        if method == "neggrad":
            e, new_bn = emb(p, bn, batch["images"])
            return batch["sign"] * resnet.adms_loss(h, e, batch["labels"]), new_bn
        if method == "sparsity":
            e, new_bn = emb(p, bn, batch["images"])
            return resnet.adms_loss(h, e, batch["labels"]) + alpha * unlearn_mod._l1_all(tr), new_bn
        if method == "scrub":
            e, new_bn = emb(p, bn, batch["images"])
            t, y = batch["targets"], batch["y"]
            cos = jnp.sum(e * t, axis=1) / (
                jnp.linalg.norm(e, axis=1) * jnp.linalg.norm(t, axis=1) + 1e-12
            )
            per = jnp.where(y > 0, 1.0 - cos, jnp.maximum(cos, 0.0))
            return jnp.mean(per), new_bn
        if method in ("twins", "rmu"):
            e, new_bn = emb(p, bn, batch["images"])
            return jnp.mean((e - batch["targets"]) ** 2), new_bn
        if method == "scrub_orig":
            ef, bn1 = emb(p, bn, batch["forget_images"])
            forget_loss = -unlearn_mod._kl_batchmean(
                ef, orig_emb_one(orig["p"], orig["bn"], batch["forget_images"])
            )
            er, new_bn = emb(p, bn1, batch["retain_images"])
            kl_loss = unlearn_mod._kl_batchmean(
                er, orig_emb_one(orig["p"], orig["bn"], batch["retain_images"])
            )
            ce_loss = resnet.adms_loss(h, er, batch["retain_labels"])
            return forget_loss + kl_loss + ce_loss, new_bn
        if method == "llmu":
            ef, bn1 = emb(p, bn, batch["forget_images"])
            forget_loss = -resnet.adms_loss(h, ef, batch["forget_labels"])
            efr, bn2 = emb(p, bn1, batch["forget_images"])
            random_loss = resnet.adms_loss(h, efr, batch["random_labels"])
            er, new_bn = emb(p, bn2, batch["retain_images"])
            retain_loss = unlearn_mod._kl_batchmean(
                er, orig_emb_one(orig["p"], orig["bn"], batch["retain_images"])
            )
            return 0.02 * forget_loss + retain_loss + 0.01 * random_loss, new_bn
        if method == "dpo":
            fc_w = orig["head_w"]

            def class_logprob(p, bn, imgs, targets):
                e, new_bn = emb(p, bn, imgs)
                lp = jax.nn.log_softmax(e @ fc_w.astype(e.dtype), axis=1)
                oe = orig_emb_one(orig["p"], orig["bn"], imgs)
                olp = jax.nn.log_softmax(oe @ fc_w.astype(e.dtype), axis=1)
                ratio = beta * (lp - olp)
                return ratio[jnp.arange(len(targets)), targets], new_bn

            fl, bn1 = class_logprob(p, bn, batch["forget_images"], batch["forget_labels"])
            rl, new_bn = class_logprob(p, bn1, batch["retain_images"], batch["retain_labels"])
            nmin = min(fl.shape[0], rl.shape[0])
            return -(1.0 / beta) * jnp.mean(jax.nn.log_sigmoid(rl[:nmin] - fl[:nmin])), new_bn
        raise AssertionError(method)

    trainable = (jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, head))
    opt_state = jax.vmap(tx.init)(trainable)
    orig = {"p": orig_params, "bn": orig_bn, "head_w": orig_head["weight"]}

    def one(tr, os, bn, batch, orig):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr, bn, batch, orig)
        updates, os = tx.update(grads, os, tr)
        return optax.apply_updates(tr, updates), os, new_bn, loss

    fleet_step = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0)))

    # ---- per-shadow cached targets (scrub/twins/rmu) ----------------------
    cached_targets = None
    if method in ("scrub", "twins", "rmu"):
        cached_targets = np.array(embed_all_fleet(cfg, orig_params, orig_bn, images))  # [S,N,D]
        if method == "twins":
            flipped = images[:, :, ::-1, :].copy()
            flip_emb = embed_all_fleet(cfg, orig_params, orig_bn, flipped)
            cached_targets[:, forget_idx] = flip_emb[:, forget_idx]
        elif method == "rmu":
            for i in range(S):
                for j in forget_idx:
                    cached_targets[i, j] = rmu_c * rngs[i].uniform(
                        -1, 1, size=cached_targets.shape[2]
                    ).astype(np.float32)

    # ---- per-step batch schedules (replays unlearn()'s rng order) ---------
    def batches_all(idx, bs, drop_last=True):
        """[steps][S, bs_t] — same _epoch_batches per shadow, aligned steps."""
        per = [list(unlearn_mod._epoch_batches(rngs[i], idx, bs, drop_last=drop_last)) for i in range(S)]
        return [np.stack([per[i][t] for i in range(S)]) for t in range(len(per[0]))]

    y_sign = np.ones(len(images), np.float32)
    y_sign[forget_idx] = -1.0

    for _ in range(epochs):
        step_batches = []
        if method == "neggrad":
            for sel in batches_all(forget_idx, batch_size, drop_last=False):
                step_batches.append({
                    "images": images_d[jnp.asarray(sel)],
                    "labels": labels_d[jnp.asarray(sel)],
                    "sign": jnp.full((S,), -1.0),
                })
            for sel in batches_all(retain_idx, batch_size, drop_last=False):
                step_batches.append({
                    "images": images_d[jnp.asarray(sel)],
                    "labels": labels_d[jnp.asarray(sel)],
                    "sign": jnp.full((S,), 1.0),
                })
        elif method == "sparsity":
            for sel in batches_all(retain_idx, batch_size):
                step_batches.append({
                    "images": images_d[jnp.asarray(sel)],
                    "labels": labels_d[jnp.asarray(sel)],
                })
        elif method in ("scrub", "twins", "rmu"):
            pool = (balance * forget_idx + retain_idx) if method == "scrub" else (forget_idx + retain_idx)
            for sel in batches_all(pool, batch_size):
                step_batches.append({
                    "images": images_d[jnp.asarray(sel)],
                    # per-shadow targets: [S, N, D] gathered at [S, bs] indices
                    "targets": jnp.take_along_axis(
                        jnp.asarray(cached_targets), jnp.asarray(sel)[..., None], axis=1
                    ),
                    "y": jnp.asarray(y_sign[sel]),
                })
        else:  # scrub_orig, llmu, dpo: paired loaders
            f_all = batches_all(forget_idx, min(batch_size, len(forget_idx)))
            r_all = batches_all(retain_idx, batch_size, drop_last=False)
            nf = len(f_all)
            for t, rb in enumerate(r_all):
                fb = f_all[t % max(nf, 1)]
                b = {
                    "forget_images": images_d[jnp.asarray(fb)],
                    "forget_labels": labels_d[jnp.asarray(fb)],
                    "retain_images": images_d[jnp.asarray(rb)],
                    "retain_labels": labels_d[jnp.asarray(rb)],
                }
                if method == "llmu":
                    b["random_labels"] = jnp.asarray(np.stack([
                        rngs[i].choice(num_classes, size=fb.shape[1]).astype(np.int32)
                        for i in range(S)
                    ]))
                step_batches.append(b)

        for batch in step_batches:
            trainable, opt_state, bn_state, _ = fleet_step(trainable, opt_state, bn_state, batch, orig)

    p, h = trainable
    return p, h, bn_state
