"""Differential parity for the NLP forgetting trainer vs the INSTALLED torch
reference (nlp/dataloader.py:94-487).

The reference keeps TWO separate trainer implementations — ``mm/trainer.py``
(covered by tests/test_reference_parity.py) and ``nlp/dataloader.py``'s
``CustomTrainerForgetting`` — which agree on the kl_div argument orders but
differ in genuinely NLP-specific ways this file pins:

- **RMU**: a single (1,1,H) steering vector and mse over the RAW [B,S,H]
  activations (nlp/dataloader.py:333-358) — the MM trainer uses a per-sample
  (B,1,H) vector against seq-meaned activations (mm/trainer.py:313-321).
  Ours switches on ``loss_args={"rmu_nlp": True}``.
- **idk**: ONE concatenated forward (nlp/dataloader.py:403-410) whose
  token-mean denominator spans the idk+retain union — NOT the MM trainer's
  sum of two per-split means (mm/trainer.py:355-358).
- **L1/L0**: branchless semantics (nlp/dataloader.py:461-485) — raw adapters
  under LoRA, delta-from-oracle otherwise; there is no ``l_norm_from`` knob.
- Losses are evaluated on RIGHT-PADDED batches (the reference's eos-pad
  convention, nlp/data_module.py): the KL/entropy reductions run over every
  position INCLUDING pads (logits2probs's view(-1, V) + batchmean), so pad
  logits are load-bearing and both engines must agree on them.

Each loss is executed by the reference ``compute_loss`` in-process on a tiny
HF llama (8 layers so the hard-coded RMU index 7 resolves), backward()-ed,
and compared against this framework's ``compute_forget_loss`` value and
parameter gradients on hf_bridge-shared weights.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.ref_parity_common import load_ref_module

B, S = 2, 24
Q_LEN = 5
N_LAYERS = 8  # nlp/dataloader.py:337 pins model.model.layers[7]
HIDDEN = 64
VOCAB = 256

REL_TOL = 3e-4  # f32 fwd+bwd across two frameworks, 8 layers


# ---------------------------------------------------------------------------
# shared tiny model pair
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pair():
    """(student HF llama, oracle HF llama, bridged jax params ×2, our cfg)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from multimodal_unlearning_tpu.models import hf_bridge, llama

    def build(seed):
        cfg = LlamaConfig(
            vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
            num_hidden_layers=N_LAYERS, num_attention_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-5, rope_theta=10000.0,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(seed)
        return LlamaForCausalLM(cfg)

    student, oracle = build(0), build(1)
    oracle.eval()
    for p in oracle.parameters():
        p.requires_grad_(False)

    def bridge(hf):
        sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
        return hf_bridge.llama_from_hf(sd, N_LAYERS)

    cfg = llama.LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
        num_layers=N_LAYERS, num_heads=4, num_kv_heads=2,
    )
    return student, oracle, bridge(student), bridge(oracle), cfg


def _batch(rng, *, b=B, s=S, pad=(0, 6)):
    """Right-padded rows (eos-pad convention): labels -100 on the question
    span AND pads, attention_mask 0 on pads.  Per-row pad widths differ so
    the token-mean denominators are non-uniform."""
    ids = rng.integers(3, VOCAB - 6, (b, s))
    labels = ids.copy()
    labels[:, :Q_LEN] = -100
    mask = np.ones((b, s), np.int64)
    for r, p in enumerate(pad[:b]):
        if p:
            ids[r, s - p:] = 2  # eos-pad
            labels[r, s - p:] = -100
            mask[r, s - p:] = 0
    return {"input_ids": ids, "labels": labels, "attention_mask": mask}


def _splits(seed=11):
    rng = np.random.default_rng(seed)
    return {
        "forget": _batch(rng, pad=(0, 6)),
        "retain": _batch(rng, pad=(3, 0)),
        "idk": _batch(rng, pad=(2, 5)),
    }


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------


def _ref_trainer(loss_type, oracle, *, beta=1.0, l1=0.0, l0=0.0):
    dl = load_ref_module("nlp.dataloader")
    tr = object.__new__(dl.CustomTrainerForgetting)
    tr.loss_type = loss_type  # RAW spelling: dispatch is case-sensitive
    tr.oracle_model = oracle
    tr.loss_beta = beta
    tr.l1_lambda = l1
    tr.l0_lambda = l0
    tr.is_deepspeed_enabled = False
    return tr


def _tup(torch, split):
    return (torch.tensor(split["input_ids"]), torch.tensor(split["labels"]),
            torch.tensor(split["attention_mask"]))


def _run_reference(student, oracle, loss_type, batch, *, beta=1.0, l1=0.0,
                   l0=0.0, with_idk=False, seed=None):
    import torch

    from multimodal_unlearning_tpu.models import hf_bridge

    tr = _ref_trainer(loss_type, oracle, beta=beta, l1=l1, l0=l0)
    inputs = (_tup(torch, batch["forget"]), _tup(torch, batch["retain"]))
    if with_idk:
        inputs = inputs + (_tup(torch, batch["idk"]),)
    student.zero_grad(set_to_none=True)
    if seed is not None:
        torch.manual_seed(seed)  # RMU's inline torch.rand
    loss = tr.compute_loss(student, inputs)
    loss.backward()
    gsd = {}
    for k, p in student.named_parameters():
        g = p.grad
        gsd[k] = (torch.zeros_like(p) if g is None else g).detach().cpu().numpy()
    return float(loss.detach()), hf_bridge.llama_from_hf(gsd, N_LAYERS)


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------


def _make_fns(cfg, teacher_params):
    import jax
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.models import llama

    def fwd(p, split, capture_layer=None):
        out = llama.forward(
            p, cfg, jnp.asarray(split["input_ids"]),
            attention_mask=jnp.asarray(split["attention_mask"]),
            capture_layer=capture_layer, compute_dtype=jnp.float32,
        )
        return {"logits": out["logits"], "captured": out.get("captured")}

    def student_of(p):
        return lambda split, **kw: fwd(p, split, **kw)

    def teacher(split, **kw):
        return jax.tree.map(
            lambda x: None if x is None else jax.lax.stop_gradient(x),
            fwd(teacher_params, split, **kw),
            is_leaf=lambda x: x is None,
        )

    return student_of, teacher


def _run_ours(params, cfg, teacher_params, loss_type, batch, *, beta=1.0,
              loss_args=None, control_vec=None, l1=0.0, l0=0.0,
              init_params=None):
    import jax

    from multimodal_unlearning_tpu.train import losses as L

    student_of, teacher = _make_fns(cfg, teacher_params)

    def loss_fn(p):
        loss, _ = L.compute_forget_loss(
            loss_type, batch, student=student_of(p), teacher=teacher,
            beta=beta, loss_args=loss_args, control_vec=control_vec,
        )
        if l1 or l0:
            loss = loss + L.l_regularization(
                p, init_params, l1_lambda=l1, l0_lambda=l0)
        return loss

    # jit the whole value_and_grad: one pjit-path compile per loss instead of
    # hundreds of eager per-primitive compiles under direct_linearize — the
    # eager path segfaulted XLA:CPU twice deep into full-suite runs (always
    # this file, always while compiling the layer scan's linearization);
    # every jitted test in the suite uses the pjit path without issue
    val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return float(val), grads


def _assert_close(ref_val, ref_grads, our_val, our_grads):
    import jax

    denom = max(abs(ref_val), 1e-6)
    assert abs(ref_val - our_val) / denom < REL_TOL, \
        f"loss: ref {ref_val:.6g} ours {our_val:.6g}"
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_grads)
    for kp, r in ref_leaves:
        node = our_grads
        for k in kp:
            node = node[k.key]
        r = np.asarray(r, np.float32)
        o = np.asarray(node, np.float32)
        scale = max(float(np.max(np.abs(r))), 1e-7)
        err = float(np.max(np.abs(r - o))) / scale
        assert err < 1e-3, f"grad {jax.tree_util.keystr(kp)}: rel err {err:.2e}"


# ---------------------------------------------------------------------------
# the taxonomy (RAW reference spellings — nlp dispatch is case-sensitive:
# "KL"/"LLMU"/"RMU" uppercase, nlp/dataloader.py:20-21,271,294,330)
# ---------------------------------------------------------------------------

TAXONOMY = [
    ("retain_ft", 1.0, False),
    ("grad_ascent", 1.0, False),
    ("grad_diff_forget_ce_retain_ce", 1.0, False),
    ("grad_diff_forget_ce_retain_KL", 2.0, False),
    ("grad_diff_forget_entropy_retain_ce", 1.0, False),
    ("grad_diff_forget_entropy_retain_KL", 0.7, False),
    ("grad_diff_forget_KL_retain_ce", 1.0, False),
    ("grad_diff_forget_KL_retain_KL", 0.5, False),
    ("scrub", 0.5, False),
    ("KL", 1.0, False),
    ("LLMU", 1.0, True),
    ("eco_ft", 0.7, False),
    ("dpo", 1.0, True),
]


@pytest.mark.parametrize("loss_type,beta,with_idk", TAXONOMY,
                         ids=[t[0] for t in TAXONOMY])
def test_nlp_loss_matches_reference(pair, loss_type, beta, with_idk):
    student, oracle, params, teacher_params, cfg = pair
    batch = _splits()
    ref_val, ref_grads = _run_reference(
        student, oracle, loss_type, batch, beta=beta, with_idk=with_idk)
    our_val, our_grads = _run_ours(
        params, cfg, teacher_params, loss_type, batch, beta=beta)
    _assert_close(ref_val, ref_grads, our_val, our_grads)


def test_nlp_rmu_matches_reference(pair):
    """NLP RMU: (1,1,H) control vec, mse over raw [B,S,H] activations.
    The vec is torch.rand drawn inline (nlp/dataloader.py:336-343); we seed,
    re-draw the identical vec, and inject it on our side."""
    import torch

    import jax.numpy as jnp

    student, oracle, params, teacher_params, cfg = pair
    batch = _splits()
    ref_val, ref_grads = _run_reference(
        student, oracle, "RMU", batch, beta=0.5, seed=123)
    torch.manual_seed(123)
    rand_vec = torch.rand(1, 1, HIDDEN)
    cv = (rand_vec / torch.norm(rand_vec) * 300).numpy()
    our_val, our_grads = _run_ours(
        params, cfg, teacher_params, "RMU", batch, beta=0.5,
        loss_args={"rmu_nlp": True}, control_vec=jnp.asarray(cv))
    _assert_close(ref_val, ref_grads, our_val, our_grads)

    # non-vacuous: the rmu_nlp flag is load-bearing.  At the reference's
    # norm-300 vec the mse is vec-dominated and both forms nearly coincide,
    # so discriminate at a unit-norm vec where the activations matter:
    # seq-meaned (MM form) vs raw activations give different losses
    cv1 = jnp.asarray(cv / 300.0)
    nlp_val, _ = _run_ours(
        params, cfg, teacher_params, "RMU", batch, beta=0.5,
        loss_args={"rmu_nlp": True}, control_vec=cv1)
    mm_val, _ = _run_ours(
        params, cfg, teacher_params, "RMU", batch, beta=0.5,
        control_vec=jnp.broadcast_to(cv1, (B, 1, HIDDEN)))
    assert abs(mm_val - nlp_val) / max(abs(nlp_val), 1e-6) > 1e-3


def test_nlp_npo_matches_reference(pair):
    """NLP NPO applies the power to the LOG prob-ratio with no epsilon
    (nlp/dataloader.py:383-400) — not the MM trainer's ratio**beta form.
    The log form is only finite near the reference point (log-ratios > −1 and
    beta integer), so the oracle is a small perturbation of the student —
    exactly the real operating point, where forgetting starts FROM the
    oracle checkpoint."""
    import copy

    import torch

    from multimodal_unlearning_tpu.models import hf_bridge

    student, _, params, _, cfg = pair
    near = copy.deepcopy(student)
    near.eval()
    torch.manual_seed(7)
    with torch.no_grad():
        for p in near.parameters():
            p.add_(0.01 * torch.randn_like(p))
            p.requires_grad_(False)
    sd = {k: v.detach().cpu().numpy() for k, v in near.state_dict().items()}
    near_params = hf_bridge.llama_from_hf(sd, N_LAYERS)

    batch = _splits()
    ref_val, ref_grads = _run_reference(student, near, "npo", batch, beta=1.0)
    assert np.isfinite(ref_val)
    our_val, our_grads = _run_ours(
        params, cfg, near_params, "npo", batch, beta=1.0,
        loss_args={"npo_nlp": True})
    _assert_close(ref_val, ref_grads, our_val, our_grads)

    # non-vacuous: the MM form (ratio**beta + epsilon) computes a different
    # loss on the same inputs
    mm_val, _ = _run_ours(params, cfg, near_params, "npo", batch, beta=1.0)
    assert abs(mm_val - ref_val) / max(abs(ref_val), 1e-6) > 1e-3


def test_nlp_idk_concat_matches_reference(pair):
    """idk = ONE concatenated forward: the token-mean denominator spans the
    idk+retain union (nlp/dataloader.py:403-410).  The idk rows ride the
    forget slot (the reference's dataset substitution)."""
    student, oracle, params, teacher_params, cfg = pair
    batch = _splits()
    batch["forget"] = batch.pop("idk")  # idk answers in the forget slot
    ref_val, ref_grads = _run_reference(student, oracle, "idk", batch)

    concat = {k: np.concatenate([batch["forget"][k], batch["retain"][k]])
              for k in batch["forget"]}
    our_val, our_grads = _run_ours(
        params, cfg, teacher_params, "retain_ft", {"retain": concat})
    _assert_close(ref_val, ref_grads, our_val, our_grads)

    # non-vacuous: the MM-style sum of two per-split means differs (the
    # splits have different valid-token counts by construction)
    mm_val, _ = _run_ours(params, cfg, teacher_params, "idk",
                          {"idk": batch["forget"], "retain": batch["retain"]})
    assert abs(mm_val - ref_val) / abs(ref_val) > 1e-3


@pytest.mark.parametrize("l1,l0,check_grads", [
    (0.3, 0.0, True),
    # L0 (count of non-zeros) is flat a.e. — torch's norm(p=0) backward
    # contributes zero gradient, ours likewise: value-level check only
    (0.0, 0.2, False),
    (0.3, 0.2, False),
], ids=["l1", "l0", "l1+l0"])
def test_nlp_l_regularization_matches_reference(pair, l1, l0, check_grads):
    """Non-LoRA L1/L0: delta-from-oracle, branchless in the reference
    (nlp/dataloader.py:461-485) == our l_norm_from='init' with init=oracle."""
    student, oracle, params, teacher_params, cfg = pair
    batch = _splits()
    ref_val, ref_grads = _run_reference(
        student, oracle, "grad_ascent", batch, l1=l1, l0=l0)
    our_val, our_grads = _run_ours(
        params, cfg, teacher_params, "grad_ascent", batch,
        l1=l1, l0=l0, init_params=teacher_params)
    if check_grads:
        _assert_close(ref_val, ref_grads, our_val, our_grads)
    else:
        assert abs(ref_val - our_val) / max(abs(ref_val), 1e-6) < REL_TOL
