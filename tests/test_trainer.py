"""Train-engine tests: compiled step, grad accumulation, optimizers,
ZeRO-style sharded execution on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama, lora
from multimodal_unlearning_tpu.parallel import MeshSpec, batch_sharding, make_mesh
from multimodal_unlearning_tpu.train import losses, optim, trainer



def setup_decoder():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def apply_fn_for(cfg):
    def apply_fn(params, part, capture_layer=None):
        out = llama.forward(
            params, cfg, part["input_ids"],
            attention_mask=part.get("attention_mask"),
            capture_layer=capture_layer,
            compute_dtype=jnp.float32,
        )
        return {"logits": out["logits"], "captured": out["captured"]}

    return apply_fn


def make_batch(cfg, rng, bsz=4, seq=16, splits=("forget", "retain")):
    batch = {}
    for s in splits:
        ids = rng.integers(1, cfg.vocab_size, (bsz, seq))
        labels = ids.copy()
        labels[:, :4] = -100
        batch[s] = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((bsz, seq), jnp.int32),
            "labels": jnp.asarray(labels),
        }
    return batch


def test_retain_ft_loss_decreases():
    cfg, params = setup_decoder()
    rng = np.random.default_rng(0)
    batch = make_batch(cfg, rng)
    tx = optim.make_optimizer("adamw", 1e-2)
    step = trainer.make_train_step(
        apply_fn_for(cfg), tx, loss_type="retain_ft", donate=False
    )
    state = trainer.create_train_state(params, tx)
    first = None
    for i in range(5):
        state, metrics = step(state, None, None, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_grad_ascent_increases_forget_ce():
    cfg, params = setup_decoder()
    rng = np.random.default_rng(1)
    batch = make_batch(cfg, rng)
    tx = optim.make_optimizer("adamw", 1e-2)
    step = trainer.make_train_step(
        apply_fn_for(cfg), tx, loss_type="grad_ascent", donate=False
    )
    state = trainer.create_train_state(params, tx)
    ce0 = None
    for i in range(4):
        state, metrics = step(state, None, None, batch)
        if ce0 is None:
            ce0 = -float(metrics["loss"])
    merged = state.trainable
    out = llama.forward(merged, cfg, batch["forget"]["input_ids"], compute_dtype=jnp.float32)
    ce_now = float(losses.ce_loss(out["logits"], batch["forget"]["labels"]))
    assert ce_now > ce0


def test_teacher_loss_runs_and_teacher_unchanged():
    cfg, params = setup_decoder()
    teacher = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(2)
    batch = make_batch(cfg, rng)
    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(
        apply_fn_for(cfg), tx, loss_type="kl", beta=1.0, donate=False
    )
    state = trainer.create_train_state(params, tx)
    state, metrics = step(state, None, teacher, batch)
    assert np.isfinite(float(metrics["loss"]))
    # at step 0 student == teacher → retain KL term must be ~0
    assert float(metrics["retain_loss"]) == pytest.approx(0.0, abs=1e-5)


def test_rmu_step_with_control_vec():
    cfg, params = setup_decoder()
    teacher = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(3)
    batch = make_batch(cfg, rng)
    cv = losses.make_control_vec(jax.random.PRNGKey(0), 4, cfg.hidden_size)
    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(
        apply_fn_for(cfg), tx, loss_type="rmu", beta=2.0, donate=False
    )
    state = trainer.create_train_state(params, tx, control_vec=cv)
    state, metrics = step(state, None, teacher, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["retain_loss"]) == pytest.approx(0.0, abs=1e-6)
    assert float(metrics["forget_loss"]) > 0


def test_grad_accum_matches_big_batch():
    cfg, params = setup_decoder()
    rng = np.random.default_rng(4)
    big = make_batch(cfg, rng, bsz=8)
    micro = jax.tree.map(lambda x: x.reshape(2, 4, *x.shape[1:]), big)

    tx = optim.make_optimizer("sgd", 1e-2)
    step1 = trainer.make_train_step(apply_fn_for(cfg), tx, loss_type="grad_diff_forget_ce_retain_ce", donate=False)
    stepA = trainer.make_train_step(apply_fn_for(cfg), tx, loss_type="grad_diff_forget_ce_retain_ce", grad_accum=2, donate=False)

    s1 = trainer.create_train_state(params, tx)
    sA = trainer.create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, m1 = step1(s1, None, None, big)
    sA, mA = stepA(sA, None, None, micro)
    # same data → same mean loss and same resulting params
    assert float(m1["loss"]) == pytest.approx(float(mA["loss"]), rel=1e-4)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.trainable, sA.trainable)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_lora_only_training_keeps_base_frozen():
    cfg, params = setup_decoder()
    adapters = lora.init_lora(params["layers"], r=4, key=jax.random.PRNGKey(1))
    scale = lora.lora_scale(4, 32)
    rng = np.random.default_rng(5)
    batch = make_batch(cfg, rng)

    def apply_fn(lora_tree, part, capture_layer=None):
        out = llama.forward(
            params, cfg, part["input_ids"], lora=lora_tree, lora_scale=scale,
            capture_layer=capture_layer, compute_dtype=jnp.float32,
        )
        return {"logits": out["logits"], "captured": out["captured"]}

    tx = optim.make_optimizer("adamw", 1e-2)
    step = trainer.make_train_step(
        lambda tr, part, **kw: apply_fn(tr, part, **kw), tx,
        loss_type="retain_ft", donate=False,
    )
    state = trainer.create_train_state(adapters, tx)
    base_before = jax.tree.map(jnp.copy, params)
    l0 = None
    for _ in range(4):
        state, metrics = step(state, None, None, batch)
        l0 = l0 or float(metrics["loss"])
    assert float(metrics["loss"]) < l0
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, base_before)
    assert max(jax.tree.leaves(d)) == 0.0


def test_l1_reg_from_init():
    cfg, params = setup_decoder()
    rng = np.random.default_rng(6)
    batch = make_batch(cfg, rng)
    tx = optim.make_optimizer("sgd", 1e-2)
    step = trainer.make_train_step(
        apply_fn_for(cfg), tx, loss_type="retain_ft",
        l1_lambda=0.1, l_norm_from="init", donate=False,
    )
    state = trainer.create_train_state(params, tx, keep_init=True)
    state, m0 = step(state, None, None, batch)
    # at init, delta == 0 → reg contributes nothing at step 1
    state2, m1 = step(state, None, None, batch)
    assert float(m1["loss"]) > 0


def test_adamw_q8_trains():
    cfg, params = setup_decoder()
    rng = np.random.default_rng(7)
    batch = make_batch(cfg, rng)
    tx = optim.make_optimizer("adamw_bnb_8bit", 1e-2)
    step = trainer.make_train_step(apply_fn_for(cfg), tx, loss_type="retain_ft", donate=False)
    state = trainer.create_train_state(params, tx)
    first = None
    for _ in range(5):
        state, metrics = step(state, None, None, batch)
        first = first or float(metrics["loss"])
    assert float(metrics["loss"]) < first
    # moments really are int8
    leaves = jax.tree.leaves(state.opt_state.m)
    assert any(x.dtype == jnp.int8 for x in leaves if hasattr(x, "dtype"))


def test_sharded_train_step_on_mesh():
    """DP over data×fsdp with ZeRO-sharded opt state on 8 virtual devices."""
    cfg, params = setup_decoder()
    teacher = jax.tree.map(jnp.copy, params)
    mesh = make_mesh(MeshSpec(data=2, fsdp=4, tensor=1))
    rng = np.random.default_rng(8)
    batch = make_batch(cfg, rng, bsz=8)

    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(apply_fn_for(cfg), tx, loss_type="scrub", donate=False)
    state = trainer.create_train_state(params, tx)
    state, frozen, teacher = trainer.shard_train_state(state, None, teacher, mesh)
    bsh = batch_sharding(mesh)
    batch = jax.tree.map(lambda x: jax.device_put(x, bsh), batch)

    state, metrics = step(state, frozen, teacher, batch)
    assert np.isfinite(float(metrics["loss"]))

    # compare against unsharded single-device step
    state_ref = trainer.create_train_state(jax.tree.map(jnp.copy, params), tx)
    batch_host = jax.tree.map(lambda x: np.asarray(x), batch)
    batch_host = jax.tree.map(jnp.asarray, batch_host)
    state_ref, metrics_ref = step(state_ref, None, jax.tree.map(jnp.copy, params), batch_host)
    assert float(metrics["loss"]) == pytest.approx(float(metrics_ref["loss"]), rel=1e-4)


def test_nonfinite_loss_skips_update():
    """NaN/Inf filtering (nlp/grad_proj.py:421-429 analog): a blown-up batch
    must leave params and optimizer state untouched."""
    cfg, params = setup_decoder()
    rng = np.random.default_rng(9)
    batch = make_batch(cfg, rng)
    # inf labels path: poison by scaling embeddings to produce inf logits
    poisoned = jax.tree.map(jnp.copy, params)
    poisoned["embed_tokens"] = poisoned["embed_tokens"] * jnp.inf

    tx = optim.make_optimizer("adamw", 1e-2)
    step = trainer.make_train_step(apply_fn_for(cfg), tx, loss_type="retain_ft", donate=False)
    state = trainer.create_train_state(poisoned, tx)
    before = jax.tree.map(jnp.copy, state.trainable)
    state, metrics = step(state, None, None, batch)
    assert int(metrics["skipped_nonfinite"]) == 1
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(jnp.nan_to_num(a - b)))), state.trainable, before
    )
    assert max(jax.tree.leaves(d)) == 0.0
