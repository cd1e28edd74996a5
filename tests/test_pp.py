"""Pipeline parallelism (parallel/pp.py): GPipe microbatch pipeline over the
'pipe' mesh axis must be numerics-transparent — identical forward logits and
parameter gradients to the plain single-device layer scan.

Beyond-reference feature (the reference's largest topology is ZeRO-2 DDP,
mm/forget.py:23-31); validated here at the system level on the 8-virtual-
device CPU mesh: pipe alone, pipe × data/fsdp, LoRA adapters riding the
stage-sharded layer stack, padded batches, and a full forget train step with
a co-resident teacher.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.parallel import (
    MeshSpec,
    make_mesh,
    pp_shard_decoder,
)
from multimodal_unlearning_tpu.parallel.pp import resolve_microbatches


def tiny_cfg(L=4):
    return llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=L, num_heads=4, num_kv_heads=2,
    )


def make_batch(rng, B=8, S=16, pad_tail=True):
    ids = rng.integers(1, 60, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    if pad_tail:  # right-padding exercises the kv mask travelling with its mb
        mask[0, -3:] = 0
        mask[3, -1:] = 0
    labels = rng.integers(1, 60, (B, S)).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)


def ce_loss(params, cfg, ids, mask, labels, mesh=None, mb=None, lora=None, scale=0.0):
    out = llama.forward(
        params, cfg, ids, attention_mask=mask,
        compute_dtype=jnp.float32, attn_impl="xla",
        mesh=mesh, pp_microbatches=mb, lora=lora, lora_scale=scale,
    )
    lp = jax.nn.log_softmax(out["logits"], -1)
    nll = -jnp.take_along_axis(lp, labels[..., None], -1)[..., 0]
    return jnp.sum(nll * mask) / jnp.sum(mask)


def max_leaf_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_pp_forward_and_grads_match_plain_scan():
    cfg = tiny_cfg(L=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(MeshSpec(data=2, pipe=4))
    rng = np.random.default_rng(0)
    ids, mask, labels = make_batch(rng)

    ref_l, ref_g = jax.value_and_grad(ce_loss)(params, cfg, ids, mask, labels)
    pp_params = pp_shard_decoder(params, mesh)
    pp_l, pp_g = jax.jit(
        jax.value_and_grad(lambda p: ce_loss(p, cfg, ids, mask, labels, mesh, 2))
    )(pp_params)

    assert abs(float(ref_l) - float(pp_l)) < 1e-5
    assert max_leaf_diff(ref_g, pp_g) < 1e-4
    # stage-resident placement: each device holds L/pipe layers
    q = pp_params["layers"]["q_proj"]
    assert {s.data.shape for s in q.addressable_shards} == {(1, 32, 32)}


def test_pp_composes_with_fsdp_and_default_microbatches():
    cfg = tiny_cfg(L=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, pipe=2))
    rng = np.random.default_rng(1)
    ids, mask, labels = make_batch(rng, B=8)

    ref_l = ce_loss(params, cfg, ids, mask, labels)
    pp_l = jax.jit(
        lambda p: ce_loss(p, cfg, ids, mask, labels, mesh, None)
    )(pp_shard_decoder(params, mesh))
    assert abs(float(ref_l) - float(pp_l)) < 1e-5


def test_pp_with_lora_adapters():
    """Stacked LoRA rides the pipeline as per-stage layer inputs."""
    from multimodal_unlearning_tpu.models import lora as lora_mod

    cfg = tiny_cfg(L=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    adapters = lora_mod.init_lora(params["layers"], 4, jax.random.PRNGKey(3))
    # make the delta nonzero so the test actually sees the adapters
    adapters = jax.tree.map(
        lambda x: x + 0.01 * jnp.ones_like(x) if x.size else x, adapters
    )
    scale = lora_mod.lora_scale(4, 8)
    mesh = make_mesh(MeshSpec(data=2, pipe=4))
    rng = np.random.default_rng(2)
    ids, mask, labels = make_batch(rng)

    def loss(ad, params, mesh=None, mb=None):
        return ce_loss(params, cfg, ids, mask, labels, mesh, mb, lora=ad, scale=scale)

    ref_l, ref_g = jax.value_and_grad(loss)(adapters, params)
    pp_l, pp_g = jax.jit(jax.value_and_grad(
        lambda ad, p: loss(ad, p, mesh, 2)
    ))(adapters, pp_shard_decoder(params, mesh))
    assert abs(float(ref_l) - float(pp_l)) < 1e-5
    assert max_leaf_diff(ref_g, pp_g) < 1e-4


def test_pp_full_train_step_with_teacher():
    """mm_forget path: NPO with a co-resident teacher, grad accum, pipe×dp."""
    from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
    from multimodal_unlearning_tpu.data.loader import stack_microbatches
    from multimodal_unlearning_tpu.train import optim, trainer

    cfg = tiny_cfg(L=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    teacher = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(4)

    def split(B=8, S=16):
        ids = rng.integers(1, 60, (B, S)).astype(np.int32)
        labels = ids.copy()
        labels[:, :4] = -100
        return {
            "input_ids": ids,
            "attention_mask": np.ones((B, S), np.int32),
            "labels": labels,
        }

    batch = stack_microbatches({"forget": split(), "retain": split()}, 2)

    def run(mesh, mb):
        apply_fn = make_apply_fn(
            "llama", cfg, compute_dtype=jnp.float32, attn_impl="xla",
            mesh=mesh, pp_microbatches=mb,
        )
        tx = optim.make_optimizer("adamw", 1e-3)
        step = trainer.make_train_step(
            apply_fn, tx, loss_type="npo", beta=1.0, grad_accum=2, donate=False
        )
        state = trainer.create_train_state(jax.tree.map(jnp.copy, params), tx)
        t = jax.tree.map(jnp.copy, teacher)
        if mesh is not None:
            state, _, t = trainer.shard_train_state(state, None, t, mesh)
            state = state.replace(trainable=pp_shard_decoder(state.trainable, mesh))
            t = pp_shard_decoder(t, mesh)
        state, metrics = step(state, None, t, batch)
        return float(metrics["loss"]), jax.tree.map(np.asarray, state.trainable)

    ref_loss, ref_params = run(None, None)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, pipe=2))
    pp_loss, pp_params = run(mesh, 1)
    # fp32 reduction-order noise across shards: ~1e-5 on this loss
    assert abs(ref_loss - pp_loss) < 5e-5
    assert np.isclose(ref_loss, 2 * np.log(2), atol=1e-3)  # NPO at student==teacher
    assert max_leaf_diff(ref_params, pp_params) < 2e-4


def test_pp_rejects_cache_and_validates_degrees():
    cfg = tiny_cfg(L=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    mesh = make_mesh(MeshSpec(data=2, pipe=4))
    ids = jnp.ones((8, 8), jnp.int32)

    cache = llama.init_kv_cache(cfg, 8, 16, dtype=jnp.float32)
    with pytest.raises(NotImplementedError):
        llama.forward(params, cfg, ids, kv_cache=cache, mesh=mesh,
                      compute_dtype=jnp.float32)

    with pytest.raises(ValueError):  # microbatches must divide the local batch
        llama.forward(params, cfg, ids, mesh=mesh, pp_microbatches=3,
                      compute_dtype=jnp.float32)

    cfg3 = tiny_cfg(L=3)  # layers not divisible by pipe
    params3 = llama.init_params(cfg3, jax.random.PRNGKey(6), dtype=jnp.float32)
    with pytest.raises(ValueError):
        llama.forward(params3, cfg3, ids, mesh=mesh, compute_dtype=jnp.float32)


def test_resolve_microbatches():
    assert resolve_microbatches(8, 4) == 8        # largest divisor ≤ 2·pipe
    assert resolve_microbatches(12, 2) == 4       # ≤ 2·pipe bound binds
    assert resolve_microbatches(7, 4) == 7
    assert resolve_microbatches(8, 4, requested=2) == 2
    with pytest.raises(ValueError):
        resolve_microbatches(8, 4, requested=3)


def test_pp_vlm_llava_forward():
    """LLaVA under pipe>1: vision tower replicated, decoder pipelined."""
    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import llava

    model_cfg = get_model_identifiers("tiny-llava-test")
    mcfg = build_model_config(model_cfg)
    params = llava.init_params(mcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    B = 8
    n_img = mcfg.num_image_tokens
    S = n_img + 8
    img = mcfg.vision.image_size
    ids = rng.integers(10, 200, (B, S)).astype(np.int32)
    ids[:, :n_img] = mcfg.image_token_id
    pix = rng.normal(size=(B, img, img, 3)).astype(np.float32)
    mask = jnp.ones((B, S), jnp.int32)

    def fwd(p, mesh=None, mb=None):
        return llava.forward(
            p, mcfg, jnp.asarray(ids), pixel_values=jnp.asarray(pix),
            attention_mask=mask, compute_dtype=jnp.float32, attn_impl="xla",
            mesh=mesh, pp_microbatches=mb,
        )["logits"]

    ref = fwd(params)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, pipe=2))
    pp = jax.jit(lambda p: fwd(p, mesh, 2))(params)
    assert float(jnp.max(jnp.abs(ref - pp))) < 2e-4


def test_pp_gpt_decoder_families():
    """phi (parallel residual, partial rotary) under pipe>1 matches the
    plain scan — the gpt_decoder.py pipeline path."""
    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import gpt_decoder

    model_cfg = get_model_identifiers("tiny-phi-test")
    gcfg = build_model_config(model_cfg)
    params = gpt_decoder.init_params(gcfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    rng = np.random.default_rng(8)
    ids, mask, _ = make_batch(rng, B=8, S=16)

    def fwd(p, mesh=None, mb=None):
        return gpt_decoder.forward(
            p, gcfg, ids, attention_mask=mask,
            compute_dtype=jnp.float32, attn_impl="xla",
            mesh=mesh, pp_microbatches=mb,
        )["logits"]

    ref = fwd(params)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, pipe=2))
    pp = jax.jit(lambda p: fwd(p, mesh, 2))(pp_shard_decoder(params, mesh))
    assert float(jnp.max(jnp.abs(ref - pp))) < 2e-4
