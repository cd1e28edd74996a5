"""Int8 frozen-weight quantization: accuracy, memory, QLoRA training, teacher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.models import llama, lora
from multimodal_unlearning_tpu.train import optim, trainer
from multimodal_unlearning_tpu.utils.quantize import (
    dequantize_leaf,
    quantize_leaf,
    quantize_tree,
    tree_nbytes,
)


def big_decoder():
    # big enough that matmul weights pass the >=256 quantization gate
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(512, 256)), jnp.float32)
    qt = quantize_leaf(w)
    assert qt["q"].dtype == jnp.int8 and qt["s"].shape == (1, 256)
    back = dequantize_leaf(qt, jnp.float32)
    # per-channel int8: max error bounded by scale/2 per channel
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(qt["s"][0]) * 0.51
    assert (err <= bound[None, :]).all()


def test_quantize_tree_selective():
    cfg, params = big_decoder()
    qp = quantize_tree(params)
    # norms untouched, matmul weights quantized, memory roughly halved
    assert not isinstance(qp["norm"], dict)
    assert not isinstance(qp["layers"]["input_layernorm"], dict)
    assert isinstance(qp["layers"]["q_proj"], dict)
    assert isinstance(qp["embed_tokens"], dict)
    assert tree_nbytes(qp) < 0.45 * tree_nbytes(params)


def test_quantized_forward_close():
    cfg, params = big_decoder()
    qp = quantize_tree(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 16)))
    full = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    quant = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    # logits agree in ranking most of the time and are numerically close
    denom = np.abs(np.asarray(full)).max()
    rel = np.abs(np.asarray(full - quant)).max() / denom
    assert rel < 0.15
    agree = (np.asarray(full.argmax(-1)) == np.asarray(quant.argmax(-1))).mean()
    assert agree > 0.8


def test_qlora_training_with_quantized_base_and_teacher():
    """NPO with int8 frozen base + int8 teacher + bf16 LoRA adapters."""
    cfg, params = big_decoder()
    qbase = quantize_tree(params)
    qteacher = quantize_tree(jax.tree.map(lambda x: x, params))
    adapters = lora.init_lora(
        {k: v for k, v in params["layers"].items()}, r=4, key=jax.random.PRNGKey(2)
    )
    scale = lora.lora_scale(4, 32)

    def apply_fn(p, part, capture_layer=None):
        if isinstance(p, tuple):
            base, tr = p
            kw = dict(lora=tr, lora_scale=scale)
        else:
            base, kw = p, {}
        out = llama.forward(
            base, cfg, jnp.asarray(part["input_ids"]),
            capture_layer=capture_layer, compute_dtype=jnp.float32, **kw,
        )
        return {"logits": out["logits"], "captured": out["captured"]}

    rng = np.random.default_rng(3)
    ids = rng.integers(1, cfg.vocab_size, (2, 16))
    batch = {
        s: {"input_ids": ids, "labels": ids, "attention_mask": np.ones_like(ids)}
        for s in ("forget", "retain")
    }
    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(
        apply_fn, tx, loss_type="npo", beta=1.0, donate=False,
        combine=lambda tr, fr: (fr, tr),
    )
    state = trainer.create_train_state(adapters, tx)
    state, metrics = step(state, qbase, qteacher, batch)
    # student == teacher at init → NPO starts at exactly (2/beta)·log 2
    assert float(metrics["loss"]) == pytest.approx(2 * np.log(2), rel=1e-4)
    state, metrics = step(state, qbase, qteacher, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_int8_compute_path():
    """W8A8 opt-in: close to the dequant path, straight-through grads flow."""
    from multimodal_unlearning_tpu.models.llama import enable_int8_compute

    cfg, params = big_decoder()
    qp = quantize_tree(params)
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (2, 16)))
    base = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    try:
        enable_int8_compute(True)
        w8a8 = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
        # LoRA grads still flow through int8 matmuls (STE backward)
        adapters = lora.init_lora(params["layers"], r=4, key=jax.random.PRNGKey(5))
        adapters["layers"]["q_proj"]["b"] = adapters["layers"]["q_proj"]["b"] + 0.01

        def loss(ad):
            out = llama.forward(qp, cfg, ids, lora=ad, lora_scale=1.0, compute_dtype=jnp.float32)
            return jnp.sum(out["logits"] ** 2)

        g = jax.grad(loss)(adapters)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
        assert max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g)) > 0
    finally:
        enable_int8_compute(False)
    denom = np.abs(np.asarray(base)).max()
    assert np.abs(np.asarray(base - w8a8)).max() / denom < 0.25
