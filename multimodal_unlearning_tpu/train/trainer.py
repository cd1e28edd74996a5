"""The jit-compiled unlearning train step + host-side loop.

Replaces HF Trainer + DeepSpeed + accelerate (reference: mm/trainer.py,
mm/forget.py:139-190) with one compiled function:

  train_step(state, frozen, teacher_params, batch) → (state, metrics)

- loss_type is static → one trace per loss, no Python in the hot loop;
- gradient accumulation is a ``lax.scan`` over the leading microbatch axis
  (HF semantics: mean of per-micro means);
- the trainable/frozen split (LoRA, frozen vision tower) comes from pytree
  partitioning, so ``jax.grad`` never materializes frozen-param grads;
- sharding: batch over ('data','fsdp'), optimizer state over 'fsdp'
  (ZeRO-1/2), teacher params over 'fsdp' (ZeRO-3 analog) — all annotated,
  XLA inserts reduce-scatter/all-gather over ICI;
- L1/L0 regularization and the RMU control vector live in TrainState.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multimodal_unlearning_tpu.parallel.sharding import fsdp_sharding, replicated
from multimodal_unlearning_tpu.train import losses as L
from multimodal_unlearning_tpu.utils.pytree import merge_trees


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Any
    opt_state: Any
    control_vec: Any = None
    init_trainable: Any = None  # for l_norm_from == "init"


def create_train_state(
    trainable,
    optimizer,
    *,
    control_vec=None,
    keep_init: bool = False,
):
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        control_vec=control_vec,
        init_trainable=jax.tree.map(jnp.copy, trainable) if keep_init else None,
    )


def make_train_step(
    apply_fn: Callable,
    optimizer,
    *,
    loss_type: str,
    beta: float = 1.0,
    l1_lambda: float = 0.0,
    l0_lambda: float = 0.0,
    l_norm_from: str = "zero",
    loss_args: dict | None = None,
    dpo_fix: bool = False,
    grad_accum: int = 1,
    donate: bool = True,
    combine=None,
    skip_nonfinite: bool = True,
):
    """Build the compiled step.

    apply_fn(params, batch_part, capture_layer=None) -> {"logits","captured"}
    where ``params`` is combine(trainable, frozen) — by default the merged
    trainable+frozen tree; pass ``combine`` when the trees differ structurally
    (e.g. LoRA: combine = lambda tr, fr: (fr, tr)).  Frozen params MUST flow
    through the ``frozen`` argument, never a Python closure — closures are
    lowered as giant jit constants (GBs of HBM + slow compiles).
    """

    def loss_fn(trainable, frozen, teacher_params, micro, control_vec, init_trainable):
        if combine is not None:
            params = combine(trainable, frozen)
        else:
            params = trainable if frozen is None else merge_trees(trainable, frozen)

        def student(part, **kw):
            return apply_fn(params, part, **kw)

        teacher = None
        if teacher_params is not None:
            def teacher(part, **kw):
                out = apply_fn(teacher_params, part, **kw)
                return jax.tree.map(
                    lambda x: None if x is None else jax.lax.stop_gradient(x),
                    out, is_leaf=lambda x: x is None,
                )

        loss, metrics = L.compute_forget_loss(
            loss_type, micro,
            student=student, teacher=teacher,
            beta=beta, loss_args=loss_args,
            control_vec=control_vec, dpo_fix=dpo_fix,
        )
        if l1_lambda or l0_lambda:
            init = init_trainable if l_norm_from == "init" else None
            loss = loss + L.l_regularization(
                trainable, init, l1_lambda=l1_lambda, l0_lambda=l0_lambda
            )
            metrics["loss"] = loss
        return loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, frozen, teacher_params, batch):
        if grad_accum == 1:
            (loss, metrics), grads = grad_fn(
                state.trainable, frozen, teacher_params, batch,
                state.control_vec, state.init_trainable,
            )
        else:
            def accum(carry, micro):
                g_sum, m_sum = carry
                (_, m), g = grad_fn(
                    state.trainable, frozen, teacher_params, micro,
                    state.control_vec, state.init_trainable,
                )
                return (
                    jax.tree.map(jnp.add, g_sum, g),
                    jax.tree.map(jnp.add, m_sum, m),
                ), None

            g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable)
            probe = jax.eval_shape(
                lambda: loss_fn(
                    state.trainable, frozen, teacher_params,
                    jax.tree.map(lambda x: x[0], batch),
                    state.control_vec, state.init_trainable,
                )[1]
            )
            m0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), probe)
            (g_sum, m_sum), _ = jax.lax.scan(accum, (g0, m0), batch)
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            metrics = jax.tree.map(lambda m: m / grad_accum, m_sum)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        if skip_nonfinite:
            # NaN/Inf filtering: drop the whole update if loss or grads blew up
            ok = jnp.isfinite(metrics["loss"]) & jnp.isfinite(metrics["grad_norm"])
            new_trainable = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_trainable, state.trainable
            )
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old) if hasattr(new, "shape") else new,
                new_opt, state.opt_state,
            )
            metrics["skipped_nonfinite"] = (~ok).astype(jnp.int32)
        new_state = state.replace(
            step=state.step + 1, trainable=new_trainable, opt_state=new_opt
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def shard_train_state(state: TrainState, frozen, teacher_params, mesh):
    """Place everything: opt state + teacher FSDP-sharded, params replicated.

    ZeRO mapping: optimizer moments are the big sharded buffers (stage 1/2);
    the frozen teacher's params are sharded like ZeRO-3 — XLA all-gathers
    layers on demand during the teacher forward.
    """
    rep = replicated(mesh)
    put = lambda tree, sh: jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    state = TrainState(
        step=jax.device_put(state.step, rep),
        trainable=put(state.trainable, rep),
        opt_state=jax.tree.map(
            lambda x, s: jax.device_put(x, s),
            state.opt_state,
            fsdp_sharding(state.opt_state, mesh),
        ),
        control_vec=None if state.control_vec is None else jax.device_put(state.control_vec, rep),
        init_trainable=None if state.init_trainable is None else put(state.init_trainable, rep),
    )
    frozen = put(frozen, rep)
    if teacher_params is not None:
        teacher_params = jax.tree.map(
            lambda x, s: jax.device_put(x, s),
            teacher_params,
            fsdp_sharding(teacher_params, mesh),
        )
    return state, frozen, teacher_params
