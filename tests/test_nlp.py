"""NLP-stack tests: eos-padding label semantics, dataset policies,
grad-projection math."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import get_model_identifiers
from multimodal_unlearning_tpu.data import ByteTokenizer
from multimodal_unlearning_tpu.data.nlp import (
    TextDatasetQA,
    TextForgetDatasetDPOQA,
    TextForgetDatasetQA,
    convert_raw_to_model_format,
    text_collator,
)
from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.train import grad_proj, optim

TAGS = {"question_start_tag": "[INST] ", "question_end_tag": " [/INST]", "answer_tag": ""}


def test_convert_raw_eos_padding_semantics():
    tok = ByteTokenizer()
    ids, labels, attn = convert_raw_to_model_format(tok, 48, "Q?", "A!", TAGS)
    assert ids.shape == labels.shape == attn.shape == (48,)
    n_real = int(attn.sum())
    # padding filled with EOS ids, attention 0
    assert (ids[n_real:] == tok.eos_token_id).all()
    # labels: exactly one supervised EOS after the answer, then -100
    assert labels[n_real] == tok.eos_token_id
    assert (labels[n_real + 1:] == -100).all()
    # question tokens masked
    n_q = len(tok.encode("[INST] Q? [/INST]", add_special_tokens=True))
    assert (labels[:n_q] == -100).all()
    assert (labels[n_q:n_real] != -100).all()


def test_convert_raw_truncation():
    tok = ByteTokenizer()
    ids, labels, attn = convert_raw_to_model_format(tok, 8, "a long question", "a long answer", TAGS)
    assert ids.shape == (8,)
    assert attn.sum() == 8
    assert (labels == -100).all()  # question longer than max_length → all masked


def test_forget_dataset_pairs_and_idk():
    tok = ByteTokenizer()
    ds = TextForgetDatasetQA("synthetic", tok, TAGS, max_length=48, split="forget10", loss_type="grad_ascent")
    item = ds[0]
    assert set(item.keys()) == {"forget", "retain"}
    ds_idk = TextForgetDatasetQA("synthetic", tok, TAGS, max_length=48, split="forget10", loss_type="idk")
    item = ds_idk[0]
    assert set(item.keys()) == {"idk", "retain"}
    ds_dpo = TextForgetDatasetDPOQA("synthetic", tok, TAGS, max_length=48, split="forget10")
    assert set(ds_dpo[0].keys()) == {"idk", "forget", "retain"}
    batch = text_collator([ds_dpo[0], ds_dpo[1]])
    assert batch["forget"]["input_ids"].shape == (2, 48)


def test_eval_dataset_multi_answer():
    tok = ByteTokenizer()
    ds = TextDatasetQA("synthetic", tok, TAGS, max_length=48, split="forget10_perturbed",
                       answer_key="perturbed_answer")
    item = ds[0]
    assert item["input_ids"].ndim == 2 and item["input_ids"].shape[0] == 3


def tiny_setup():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))

    def apply_fn(p, part, capture_layer=None):
        out = llama.forward(p, cfg, jnp.asarray(part["input_ids"]),
                            attention_mask=jnp.asarray(part["attention_mask"]),
                            compute_dtype=jnp.float32)
        return {"logits": out["logits"]}

    rng = np.random.default_rng(0)
    def mk(seed):
        ids = rng.integers(3, cfg.vocab_size, (2, 16))
        labels = ids.copy(); labels[:, :4] = -100
        return {"input_ids": ids, "labels": labels, "attention_mask": np.ones_like(ids)}
    batch = {"forget": mk(0), "retain": mk(1)}
    return cfg, params, apply_fn, batch


def test_grad_proj_moves_losses_right_way():
    cfg, params, apply_fn, batch = tiny_setup()
    tx = optim.make_optimizer("sgd", 5e-2)
    step = grad_proj.make_grad_proj_step(apply_fn, tx, method="grad_proj")
    opt_state = tx.init(params)
    tr = params
    neg0 = pos0 = None
    for i in range(4):
        tr, opt_state, metrics = step(tr, opt_state, None, batch)
        if neg0 is None:
            neg0, pos0 = float(metrics["neg_loss"]), float(metrics["pos_loss"])
    # forget CE ascends (neg = -CE decreases), retain CE descends
    assert float(metrics["neg_loss"]) < neg0
    assert float(metrics["pos_loss"]) < pos0


def test_grad_proj_projection_formula():
    """When ⟨g_neg, g_pos⟩ ≥ 0 the update must be exactly g_neg (coef clamp)."""
    cfg, params, apply_fn, batch = tiny_setup()
    # identical forget/retain → g_neg = -g_pos → inner < 0 → projection active
    batch_same = {"forget": batch["forget"], "retain": batch["forget"]}
    tx = optim.make_optimizer("sgd", 1e-2)
    step = grad_proj.make_grad_proj_step(apply_fn, tx, method="grad_proj")
    opt_state = tx.init(params)
    tr, opt_state, metrics = step(params, opt_state, None, batch_same)
    assert float(metrics["inner_product"]) < 0
    # g_neg - (⟨g_neg,g_pos⟩/‖g_pos‖²)g_pos with g_neg=-g_pos → exactly 0 update
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), tr, params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_grad_proj_l2_runs():
    cfg, params, apply_fn, batch = tiny_setup()
    tx = optim.make_optimizer("sgd", 1e-2)
    step = grad_proj.make_grad_proj_step(apply_fn, tx, method="grad_proj_l2", gamma=0.1)
    opt_state = tx.init(params)
    tr, opt_state, metrics = step(params, opt_state, None, batch)
    assert np.isfinite(float(metrics["pos_loss"]))


def test_grad_proj_l2_ref_behavior_is_pos_sgd():
    """With ref_behavior the step must reproduce the reference's ACTUAL
    grad_proj_l2 numerics (nlp/grad_proj.py:493-506 + the param.grad aliasing
    at :713-716): a plain SGD step on the positive (retain) gradient — the
    γ-term differentiates detached constants and contributes nothing."""
    cfg, params, apply_fn, batch = tiny_setup()
    tx = optim.make_optimizer("sgd", 1e-2)
    step = grad_proj.make_grad_proj_step(
        apply_fn, tx, method="grad_proj_l2", gamma=0.7, ref_behavior=True
    )
    opt_state = tx.init(params)
    tr, _, _ = step(params, opt_state, None, batch)

    def pos_loss(p):
        out = apply_fn(p, batch["retain"])
        return grad_proj.per_seq_mean_ce(out["logits"], jnp.asarray(batch["retain"]["labels"]))

    g_pos = jax.grad(pos_loss)(params)
    expect = jax.tree.map(lambda p, g: p - 1e-2 * g, params, g_pos)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), tr, expect)
    assert max(jax.tree.leaves(d)) < 1e-6
