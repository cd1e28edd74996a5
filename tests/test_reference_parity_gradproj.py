"""Differential parity for gradient-projection unlearning vs the INSTALLED
torch reference (nlp/grad_proj.py).

The reference ``GradProjectionsTrainer`` is driven IN-PROCESS: a real HF
Trainer instance (CPU, SGD — the reference's own optimizer for projection
methods, nlp/forget.py:166) whose ``training_step`` executes the actual
dual-backward accumulation (nlp/grad_proj.py:629-722) — including the
``param.grad`` aliasing that defines grad_proj_l2's real numerics — followed
by the optimizer-boundary projection block mirrored statement-for-statement
from nlp/grad_proj.py:476-509 (it is inline in the vendored training loop and
cannot be invoked in isolation).  The result is compared against this
framework's ``make_grad_proj_step`` on hf_bridge-shared weights: final
parameters after two SGD steps must agree.

Key parity fact checked here: the reference projects PER PARAMETER TENSOR —
a separate ``coef = ⟨g_neg, g_pos⟩ / ‖g_pos‖²`` for every ``model.parameters()``
entry (nlp/grad_proj.py:483-491) — which maps to a per-layer coefficient on
this framework's stacked ``[L, ...]`` leaves.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.ref_parity_common import load_ref_module

LR = 0.05
GAMMA = 0.3
B, S = 2, 16
N_LAYERS = 2


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    """(torch HF llama, bridged jax params, our cfg) sharing one weight set."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import hf_bridge, llama

    arch = get_model_identifiers("tiny-llama-test").arch
    hf_cfg = LlamaConfig(
        vocab_size=arch["vocab_size"], hidden_size=arch["hidden_size"],
        intermediate_size=arch["intermediate_size"],
        num_hidden_layers=arch["num_layers"],
        num_attention_heads=arch["num_heads"],
        num_key_value_heads=arch["num_kv_heads"],
        rms_norm_eps=arch["rms_norm_eps"], rope_theta=arch["rope_theta"],
        max_position_embeddings=arch["max_position_embeddings"],
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg)
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    params = hf_bridge.llama_from_hf(sd, arch["num_layers"])
    cfg = llama.LlamaConfig.from_registry(arch)
    return hf, params, cfg


def _batches():
    rng = np.random.default_rng(7)

    def mk():
        ids = rng.integers(3, 250, (B, S))
        labels = ids.copy()
        labels[:, :4] = -100
        return {"input_ids": ids, "labels": labels,
                "attention_mask": np.ones((B, S), np.int64)}

    # two optimizer steps, forget/retain differ → per-param inner products
    # of mixed sign (the min(coef, 0) clamp is exercised both ways)
    return [{"forget": mk(), "retain": mk()} for _ in range(2)]


def _make_ref_trainer(hf, method, tmp_path):
    """A REAL GradProjectionsTrainer on CPU with the reference's SGD."""
    from transformers import TrainingArguments

    gp = load_ref_module("nlp.grad_proj")
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=B,
        learning_rate=LR, weight_decay=0.0, optim="sgd",
        report_to=[], use_cpu=True, save_strategy="no",
    )
    tr = gp.GradProjectionsTrainer(
        model=hf, args=args, forget_loss=method, l2_grad_gamma=GAMMA,
    )
    tr.create_optimizer()
    return tr


def _ref_inputs(torch, batch):
    def tup(split):
        return (torch.tensor(split["input_ids"]), torch.tensor(split["labels"]),
                torch.tensor(split["attention_mask"]))

    # compute_loss order: (positive_inputs, negative_inputs) = (retain, forget)
    # (nlp/grad_proj.py:46; AscentPlusDescentDataCollator:737-743)
    return (tup(batch["retain"]), tup(batch["forget"]))


def _ref_boundary(torch, tr, model, grads, nc, pc, method):
    """The optimizer-boundary projection block, mirrored from
    nlp/grad_proj.py:476-509 (inline in the vendored _inner_training_loop)."""
    for idx in grads["neg"]:
        grads["neg"][idx] /= nc
    for idx in grads["pos"]:
        grads["pos"][idx] /= pc
    if method == "grad_proj":
        for idx, param in enumerate(model.parameters()):
            if param.grad is not None and param.requires_grad:
                pos_grad, neg_grad = grads["pos"][idx], grads["neg"][idx]
                inner = torch.dot(torch.flatten(neg_grad), torch.flatten(pos_grad))
                coef = inner / torch.norm(pos_grad) ** 2
                param.grad.data = neg_grad - min(coef, 0) * pos_grad
    else:  # grad_proj_l2 (nlp/grad_proj.py:493-506): the γ-term is built from
        # the live param.grad aliases — detached constants, so backward()
        # contributes NO parameter gradient (out-of-place sum here; the
        # reference's += runs on a non-leaf CUDA copy, same autograd content)
        new_loss = torch.tensor(0.0, requires_grad=True)
        for idx, param in enumerate(model.parameters()):
            if param.grad is not None and param.requires_grad:
                grad_diff = ((grads["neg"][idx] - grads["pos"][idx]) ** 2).sum()
                new_loss = new_loss + GAMMA * grad_diff
        new_loss.backward(retain_graph=True)
    tr.optimizer.step()
    model.zero_grad()


def _run_reference(hf, method, tmp_path):
    import copy

    import torch

    model = copy.deepcopy(hf)
    model.train()
    tr = _make_ref_trainer(model, method, tmp_path)
    n_clamped = 0
    for batch in _batches():
        grads = {"neg": {}, "pos": {}}
        nc = pc = 0
        _, grads, nc, pc = tr.training_step(
            model, _ref_inputs(torch, batch), grads, pc, nc)
        if method == "grad_proj":
            for idx, param in enumerate(model.parameters()):
                if param.grad is None or not param.requires_grad:
                    continue
                inner = torch.dot(torch.flatten(grads["neg"][idx]),
                                  torch.flatten(grads["pos"][idx]))
                n_clamped += int(inner.item() < 0)
        _ref_boundary(torch, tr, model, grads, nc, pc, method)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return sd, n_clamped


def _run_ours(params, cfg, method, *, ref_behavior=False):
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_unlearning_tpu.train import grad_proj

    def apply_fn(p, part, capture_layer=None):
        from multimodal_unlearning_tpu.models import llama

        out = llama.forward(p, cfg, jnp.asarray(part["input_ids"]),
                            attention_mask=jnp.asarray(part["attention_mask"]),
                            compute_dtype=jnp.float32)
        return {"logits": out["logits"]}

    tx = optax.sgd(LR)
    step = grad_proj.make_grad_proj_step(
        apply_fn, tx, method=method, gamma=GAMMA, ref_behavior=ref_behavior)
    tr = jax.tree.map(jnp.asarray, params)
    opt_state = tx.init(tr)
    for batch in _batches():
        tr, opt_state, _ = step(tr, opt_state, None, batch)
    return tr


def _assert_params_match(ref_sd, ours, num_layers):
    from multimodal_unlearning_tpu.models import hf_bridge

    bridged = hf_bridge.llama_from_hf(ref_sd, num_layers)
    import jax

    for (kp, r) in jax.tree_util.tree_leaves_with_path(bridged):
        o = None
        node = ours
        for k in kp:
            node = node[k.key]
        o = np.asarray(node, np.float32)
        r = np.asarray(r, np.float32)
        scale = max(float(np.max(np.abs(r))), 1e-8)
        err = float(np.max(np.abs(r - o))) / scale
        assert err < 3e-5, f"{jax.tree_util.keystr(kp)}: rel err {err:.2e}"


def test_grad_proj_matches_reference(tiny_pair, tmp_path):
    """Final params after 2 reference grad_proj SGD steps == ours."""
    hf, params, cfg = tiny_pair
    ref_sd, n_clamped = _run_reference(hf, "grad_proj", tmp_path)
    # non-vacuous: the min(coef,0) clamp must have engaged on some tensors
    # (inner < 0) and passed others through — otherwise any g_neg-only
    # implementation would pass
    assert n_clamped > 0
    ours = _run_ours(params, cfg, "grad_proj")
    _assert_params_match(ref_sd, ours, N_LAYERS)


def test_grad_proj_l2_ref_behavior_matches_reference(tiny_pair, tmp_path):
    """grad_proj_l2 with ref_behavior=True reproduces what the reference
    ACTUALLY computes (SGD on the retain gradient alone — the γ-term
    differentiates detached grads); the intended-objective default does not."""
    hf, params, cfg = tiny_pair
    ref_sd, _ = _run_reference(hf, "grad_proj_l2", tmp_path)
    ours_ref = _run_ours(params, cfg, "grad_proj_l2", ref_behavior=True)
    _assert_params_match(ref_sd, ours_ref, N_LAYERS)

    # the intended second-order objective diverges from the reference's
    # numerics — the ref_behavior switch is load-bearing
    import jax

    ours_intended = _run_ours(params, cfg, "grad_proj_l2", ref_behavior=False)
    from multimodal_unlearning_tpu.models import hf_bridge

    bridged = hf_bridge.llama_from_hf(ref_sd, N_LAYERS)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        bridged, jax.tree.map(np.asarray, ours_intended))
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6
