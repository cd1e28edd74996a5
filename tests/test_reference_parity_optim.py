"""Differential parity for the UPDATE RULE vs the installed torch reference:
torch.optim.AdamW + HF's linear-warmup scheduler + global-norm clipping +
HF Trainer's decay-parameter masking, and the full
``MMTrainerForgetting.train()`` trajectory on the shared tiny bridged LLaVA.

What this pins (none of it covered by the loss/grad parity tests, which stop
at ``compute_loss``):

- AdamW semantics (bias correction, decoupled decay scaled by lr, eps
  placement) — torch.optim.AdamW vs optax.adamw;
- the HF default LINEAR warmup→decay schedule with warmup_steps =
  max(1, steps_per_epoch) (mm/forget.py:147), including the lr=0 first step
  (LambdaLR evaluates the lambda at step 0);
- GLOBAL-NORM CLIPPING at the HF TrainingArguments default max_grad_norm=1.0
  — the reference comments the override out (mm/forget.py:151,
  config/mm/forget.yaml:39) so the default APPLIES; torch's
  clip_grad_norm_ uses coef = max_norm / (total_norm + 1e-6);
- HF's decay-parameter mask: weight decay (0.01 in every reference config)
  skips bias / LayerNorm / RMSNorm / *norm* parameters
  (transformers trainer.get_decay_parameter_names);
- gradient-accumulation scaling: the reference env (transformers==4.45.1,
  req.txt:250) divides each microbatch loss by gradient_accumulation_steps
  unconditionally in Trainer.training_step; the INSTALLED 4.57 skips that
  division when the model forward accepts **kwargs, so the trajectory test
  forces ``model_accepts_loss_kwargs = False`` to reproduce the reference
  era's semantics.

Float64 on both sides so the comparison is fp-noise-free.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_parity_common import (
    bridge_params,
    build_hf_llava,
    make_split,
    ours_config,
    to_torch_inputs,
)

LR = 1e-3
WD = 0.01
WARMUP = 2
STEPS = 6


# ---------------------------------------------------------------------------
# pure update-rule parity on a synthetic tree
# ---------------------------------------------------------------------------


def test_adamw_schedule_clip_mask_matches_torch():
    torch = pytest.importorskip("torch")
    from transformers import get_linear_schedule_with_warmup

    from multimodal_unlearning_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(11)
    # names chosen to exercise the decay mask: weights decay, bias /
    # *layernorm* / "norm" / ln-scale do not
    init = {
        "proj": {"kernel": rng.normal(size=(8, 8)), "bias": rng.normal(size=(8,))},
        "input_layernorm": rng.normal(size=(8,)),
        "norm": rng.normal(size=(8,)),
        "ln1": {"scale": rng.normal(size=(8,)), "bias": rng.normal(size=(8,))},
    }
    grads_seq = [
        jax.tree.map(lambda a: rng.normal(size=np.shape(a)) * 3.0, init)
        for _ in range(STEPS)
    ]  # norm > 1 so clipping engages on every step

    # --- torch oracle -------------------------------------------------------
    tleaves = {}

    def torchify(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                torchify(v, prefix + k + ".")
            else:
                tleaves[prefix + k] = torch.tensor(v, dtype=torch.float64, requires_grad=True)

    torchify(init)
    no_decay = [
        n for n in tleaves
        if "bias" in n or "layernorm" in n or n.split(".")[-1] in ("norm", "scale")
        or "ln1" in n
    ]
    opt = torch.optim.AdamW(
        [
            {"params": [tleaves[n] for n in tleaves if n not in no_decay], "weight_decay": WD},
            {"params": [tleaves[n] for n in no_decay], "weight_decay": 0.0},
        ],
        lr=LR, betas=(0.9, 0.999), eps=1e-8,
    )
    sched = get_linear_schedule_with_warmup(opt, WARMUP, STEPS)
    for g in grads_seq:
        flat = {}

        def flatten(tree, prefix=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    flatten(v, prefix + k + ".")
                else:
                    flat[prefix + k] = v

        flatten(g)
        for n, t in tleaves.items():
            t.grad = torch.tensor(flat[n], dtype=torch.float64)
        torch.nn.utils.clip_grad_norm_(list(tleaves.values()), 1.0)
        opt.step()
        sched.step()
        opt.zero_grad()

    # --- ours ---------------------------------------------------------------
    with jax.enable_x64(True):
        params = jax.tree.map(jnp.asarray, init)
        tx = make_optimizer(
            "adamw", LR, weight_decay=WD, warmup_steps=WARMUP,
            total_steps=STEPS, max_grad_norm=1.0,
        )
        state = tx.init(params)
        for g in grads_seq:
            g = jax.tree.map(jnp.asarray, g)
            upd, state = tx.update(g, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)

    flat_ours = {}

    def flatten_ours(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten_ours(v, prefix + k + ".")
            else:
                flat_ours[prefix + k] = np.asarray(v)

    flatten_ours(params)
    for n, t in tleaves.items():
        np.testing.assert_allclose(
            flat_ours[n], t.detach().numpy(), rtol=1e-12, atol=1e-14,
            err_msg=n,
        )


# ---------------------------------------------------------------------------
# full HF Trainer.train() trajectory on the tiny bridged LLaVA
# ---------------------------------------------------------------------------

LOSS_TYPE = "grad_diff_forget_ce_retain_ce"


def _f64_causal_lm_loss(
    logits, labels, vocab_size, num_items_in_batch=None, ignore_index=-100,
    shift_labels=None, **kwargs,
):
    """ForCausalLMLoss minus its unconditional ``logits.float()`` downcast
    (transformers loss/loss_utils.py) — on the f64 parity model the cast
    would quantize loss AND gradients to f32, which Adam's sign-like early
    updates amplify to ~1e-3 parameter divergence; skipping it makes the
    trajectory comparison roundoff-exact.  Identical math otherwise."""
    import torch
    from torch import nn
    from transformers.loss.loss_utils import fixed_cross_entropy

    if shift_labels is None:
        labels = nn.functional.pad(labels, (0, 1), value=ignore_index)
        shift_labels = labels[..., 1:].contiguous()
    logits = logits.view(-1, vocab_size)
    shift_labels = shift_labels.view(-1).to(logits.device)
    return fixed_cross_entropy(
        logits, shift_labels, num_items_in_batch, ignore_index, **kwargs
    )


def _settable_device_llava(seed):
    """LLaVA subclass whose read-only ``device`` property tolerates the
    reference's ``model.device = ...`` at mm/trainer.py:169."""
    import torch
    from transformers import LlavaForConditionalGeneration

    class _SettableDeviceLlava(LlavaForConditionalGeneration):
        @property
        def device(self):
            return next(self.parameters()).device

        @device.setter
        def device(self, value):
            pass

    base = build_hf_llava(seed=seed)
    m = _SettableDeviceLlava(base.config)
    m.load_state_dict(base.state_dict())
    m.loss_function = _f64_causal_lm_loss

    # HF's rotary forces f32 (autocast-disabled block) even on f64 models —
    # the other f32 quantizer Adam would amplify.  Run it in f64; ours picks
    # f64 tables from compute_dtype (ops/rope.py rope_table).
    import types

    def _f64_rotary(self, x, position_ids):
        inv = (
            self.inv_freq[None, :, None]
            .to(torch.float64)
            .expand(position_ids.shape[0], -1, 1)
        )
        pos = position_ids[:, None, :].to(torch.float64)
        freqs = (inv @ pos).transpose(1, 2)
        emb = torch.cat((freqs, freqs), dim=-1)
        scale = self.attention_scaling
        return (emb.cos() * scale).to(x.dtype), (emb.sin() * scale).to(x.dtype)

    rot = m.model.language_model.rotary_emb
    rot.forward = types.MethodType(_f64_rotary, rot)

    # LlamaRMSNorm forces .to(torch.float32) — same f32 quantizer story
    from transformers.models.llama.modeling_llama import LlamaRMSNorm

    def _f64_rmsnorm(self, hidden_states):
        variance = hidden_states.pow(2).mean(-1, keepdim=True)
        hidden_states = hidden_states * torch.rsqrt(variance + self.variance_epsilon)
        return self.weight * hidden_states

    for mod in m.modules():
        if isinstance(mod, LlamaRMSNorm):
            mod.forward = types.MethodType(_f64_rmsnorm, mod)
    return m.double().train()


def _rows_and_batch(cfg, n_rows=4):
    rng = np.random.default_rng(5)
    batch = {
        s: make_split(rng, cfg, with_image=True, B=n_rows)
        for s in ("forget", "retain")
    }
    rows = [
        {s: {k: v[i] for k, v in batch[s].items()} for s in batch}
        for i in range(n_rows)
    ]
    return rows, batch


def _make_collator(t_batch):
    """The dataset rows are indices; the collator slices the fixed torch
    batch — the {forget, retain} dict shape the reference collator produces
    (mm/dataset.py custom_data_collator_forget).  Slicing by the (possibly
    shuffled) row indices keeps each row's forget/retain pairing intact."""
    import torch

    def collate(idx_rows):
        idx = torch.tensor([int(i) for i in idx_rows])
        return {
            s: {k: v[idx] for k, v in split.items()}
            for s, split in t_batch.items()
        }

    return collate


def _run_reference_train(tmp_path, model, t_batch, n_rows, *, bs, accum, epochs):
    import transformers

    from tests.ref_parity_common import load_reference_trainer_cls

    cls = load_reference_trainer_cls()

    args = transformers.TrainingArguments(
        output_dir=str(tmp_path / "ref_out"),
        per_device_train_batch_size=bs,
        gradient_accumulation_steps=accum,
        num_train_epochs=epochs,
        learning_rate=LR,
        weight_decay=WD,
        warmup_steps=WARMUP,          # mm/forget.py:147 max(1, steps_per_epoch)
        optim="adamw_torch",          # the env has no bitsandbytes; fp32-state
        lr_scheduler_type="linear",
        logging_steps=1,
        save_strategy="no",
        report_to=[],
        remove_unused_columns=False,
        use_cpu=True,
        seed=0,
        dataloader_num_workers=0,
    )
    tr = cls(
        model=model,
        args=args,
        train_dataset=list(range(n_rows)),
        data_collator=_make_collator(t_batch),
        forget_loss=LOSS_TYPE,
        teacher_model=None,
        loss_beta=1.0,
        l1_lambda=0,
        l0_lambda=0,
        l_norm_from="zero",
        loss_args={},
    )
    # reference era (transformers==4.45.1) divides every microbatch loss by
    # gradient_accumulation_steps unconditionally; 4.57 would skip it because
    # Llava.forward accepts **kwargs
    if hasattr(tr, "model_accepts_loss_kwargs"):
        tr.model_accepts_loss_kwargs = False
    tr.train()
    losses = [h["loss"] for h in tr.state.log_history if "loss" in h]
    return model, losses


def _run_ours_train(hf_init, batch, *, n_rows, bs, accum, epochs):
    from multimodal_unlearning_tpu.models import llava
    from multimodal_unlearning_tpu.train import losses as L
    from multimodal_unlearning_tpu.train.optim import make_optimizer

    cfg = ours_config()
    steps = epochs * max(1, n_rows // (bs * accum))
    with jax.enable_x64(True):
        params = bridge_params(hf_init, dtype=np.float64)
        tx = make_optimizer(
            "adamw", LR, weight_decay=WD, warmup_steps=WARMUP,
            total_steps=steps, max_grad_norm=1.0,
            reachable_mask=lambda p: llava.reachable_mask(p, cfg),
        )
        state = tx.init(params)

        def fwd_of(p):
            def fwd(split, **kw):
                out = llava.forward(
                    p, cfg, jnp.asarray(split["input_ids"]),
                    attention_mask=jnp.asarray(split["attention_mask"]),
                    pixel_values=jnp.asarray(split["pixel_values"], jnp.float64),
                    compute_dtype=jnp.float64,
                )
                return {"logits": out["logits"]}
            return fwd

        def micro(rows_slice):
            return {s: {k: v[rows_slice] for k, v in batch[s].items()} for s in batch}

        def step_loss(p):
            # mean over the accum microbatches == reference's sum of
            # loss/accum (transformers 4.45.1 training_step)
            total = 0.0
            for m in range(accum):
                mb = micro(slice(m * bs, (m + 1) * bs))
                loss, _ = L.compute_forget_loss(
                    LOSS_TYPE, mb, student=fwd_of(p), teacher=None,
                    beta=1.0, loss_args={},
                )
                total = total + loss
            return total / accum

        losses = []
        grad_fn = jax.jit(jax.value_and_grad(step_loss))
        for _ in range(steps):
            val, grads = grad_fn(params)
            upd, state = tx.update(grads, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)
            losses.append(float(val))
    return params, losses


def _max_rel_err(ref_model, ours_params):
    """Worst per-leaf max-abs diff, normalized by the leaf's own scale with a
    floor of 1e-3 × the global param scale: leaves with *structurally* zero
    gradients (CLIP k_proj bias — attention scores are softmax-shift-invariant
    in it, so both frameworks accumulate only fp noise through Adam) sit at
    ~1e-14 absolute and would otherwise divide by their own noise."""
    ref_params = bridge_params(ref_model, dtype=np.float64)
    ref_leaves = {
        jax.tree_util.keystr(k): np.asarray(v, np.float64)
        for k, v in jax.tree_util.tree_leaves_with_path(ref_params)
    }
    global_scale = max(float(np.max(np.abs(r))) for r in ref_leaves.values())
    worst = 0.0
    for k, v in jax.tree_util.tree_leaves_with_path(ours_params):
        r = ref_leaves[jax.tree_util.keystr(k)]
        o = np.asarray(v, np.float64)
        scale = max(np.max(np.abs(r)), 1e-3 * global_scale)
        worst = max(worst, float(np.max(np.abs(r - o)) / scale))
    return worst


@pytest.mark.parametrize(
    "bs,accum,epochs",
    [(4, 1, 6), (2, 2, 3)],
    ids=["bs4_noaccum", "bs2_accum2"],
)
def test_trainer_train_trajectory_matches_reference(tmp_path, bs, accum, epochs):
    torch = pytest.importorskip("torch")
    cfg = ours_config()
    n_rows = 4
    _, batch = _rows_and_batch(cfg, n_rows)
    t_batch = {
        s: {
            k: (t.double() if torch.is_floating_point(t) else t)
            for k, t in split.items()
        }
        for s, split in to_torch_inputs(batch).items()
    }
    # the reference trains the model in place — it IS the shared init
    # (seed-deterministic, identical to _run_ours_train's bridge source)
    ref_model = _settable_device_llava(seed=0)
    hf_init = _settable_device_llava(seed=0)

    _, ref_losses = _run_reference_train(
        tmp_path, ref_model, t_batch, n_rows, bs=bs, accum=accum, epochs=epochs
    )
    ours_params, ours_losses = _run_ours_train(
        hf_init, batch, n_rows=n_rows, bs=bs, accum=accum, epochs=epochs
    )

    assert len(ref_losses) == len(ours_losses)
    # HF rounds logged losses to 4 decimals (Trainer._maybe_log_save_evaluate)
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=1e-3, atol=1e-4)
    err = _max_rel_err(ref_model, ours_params)
    assert err < 1e-6, f"max param rel err after {len(ours_losses)} steps: {err:.3e}"
