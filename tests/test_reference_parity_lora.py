"""Differential parity for the LoRA path vs the installed peft + reference.

The reference's *actual* training mode is LoRA: finetune wraps the model with
``peft.get_peft_model(LoraConfig(r, alpha, target_modules=
find_all_linear_names(model), bias="none"))`` (mm/finetune.py:91-101,
utils.py:10-19) and forget does the same behind its gating rule
(mm/forget.py:128-136).  The loss/grad and full-trajectory parity tests all
run full-parameter training; nothing yet pins

- the ADAPTER APPLY SITE: y = base(x) + (x @ A^T) @ B^T · alpha/r on every
  linear except lm_head — including the multi-modal projector — vs our
  inside-the-matmul application (models/llama.py:dense,
  models/llava.py:project);
- the TRAINABLE SET under LoRA finetune: peft freezes the base, the
  reference then freezes the whole vision module (mm/finetune.py:104-105),
  so vision-tower adapters exist but stay at their B=0 no-op init — the
  stepped set is exactly {decoder adapters, projector adapters};
- the LoRA TRAJECTORY through HF Trainer (decay mask hits lora_A/lora_B —
  neither is a bias/norm name — clipping over the adapter-only grad set,
  warmup schedule);
- MERGE: ``merge_and_unload`` (mm/finetune.py:129-133) vs our
  ``lora.merge_model``.

Float64 on both sides (same monkeypatched-f32-quirk setup as
tests/test_reference_parity_optim.py) so agreement is fp-noise-free.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_parity_common import (
    DEC_LAYERS,
    VIT_LAYERS,
    _flat_name,
    bridge_params,
    load_ref_module,
    make_split,
    ours_config,
    to_torch_inputs,
)
from tests.test_reference_parity_optim import (
    LR,
    WARMUP,
    WD,
    _make_collator,
    _rows_and_batch,
    _run_reference_train,
    _settable_device_llava,
)

R, ALPHA = 8, 32  # config/mm/finetune.yaml LoRA block
SCALE = ALPHA / R
LOSS_TYPE = "grad_diff_forget_ce_retain_ce"


def _peft_wrap(model):
    """Exactly the reference's wrap: LoraConfig over find_all_linear_names
    (every nn.Linear except lm_head, INCLUDING vision + projector), bias
    'none', then freeze the vision module (mm/finetune.py:91-105).  dropout
    pinned to 0 for determinism (config default is 0.05; dropout is a Bernoulli
    mask, not an update-rule difference).  ``.double()`` afterwards because
    peft creates adapters in f32 regardless of the f64 base."""
    peft = pytest.importorskip("peft")
    utils_mod = load_ref_module("utils")

    targets = utils_mod.find_all_linear_names(model)
    assert not any(t.endswith("lm_head") for t in targets)
    cfg = peft.LoraConfig(
        r=R, lora_alpha=ALPHA, target_modules=targets, lora_dropout=0.0,
        bias="none", task_type="CAUSAL_LM",
    )
    pm = peft.get_peft_model(model, cfg)
    for name, p in pm.named_parameters():
        if "vision_tower" in name:
            p.requires_grad = False
    return pm.double()


def _bridge_base(pm, dtype=np.float64):
    """bridge_params for a peft-injected model: the wrapped linears' weights
    live under ``<site>.base_layer.weight`` and the lora tensors must be
    dropped before the HF-layout bridge sees the state dict."""
    from multimodal_unlearning_tpu.models import hf_bridge

    sd = {}
    for k, v in pm.get_base_model().state_dict().items():
        if ".lora_" in k:
            continue
        sd[_flat_name(k.replace(".base_layer.", "."))] = v.detach().cpu().numpy()
    return jax.tree.map(
        jnp.asarray, hf_bridge.llava_from_hf(sd, DEC_LAYERS, VIT_LAYERS, dtype=dtype)
    )


def _peft_adapters(pm):
    """Collect {flat_site: (A [r,in], B [out,r])} from a peft model."""
    out = {}
    for name, p in pm.named_parameters():
        if ".lora_A." in name or ".lora_B." in name:
            site, kind = name.split(".lora_")
            out.setdefault(site, {})[kind[0]] = p.detach().cpu().numpy()
    return out


# site-name fragments -> (our subtree, our leaf name)
_DEC_SITES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")
_PROJ_SITES = {"linear_1": "fc1", "linear_2": "fc2"}


def _bridge_adapters(pm, n_layers: int) -> dict:
    """peft state -> our adapter tree ({language_model: {layers: {site:
    {a [L,in,r], b [L,r,out]}}}, projector: {fc1/fc2: {a,b}}}); A/B transpose
    because torch Linear stores [out, in].  Vision-tower adapters are asserted
    to be frozen at the B=0 no-op and dropped."""
    sites = _peft_adapters(pm)
    dec = {
        s: {"a": [None] * n_layers, "b": [None] * n_layers} for s in _DEC_SITES
    }
    proj = {}
    for site, ab in sites.items():
        if "vision_tower" in site:
            assert not np.any(ab["B"]), "vision adapters must stay at B=0"
            continue
        leaf = site.rsplit(".", 1)[-1]
        if "multi_modal_projector" in site:
            proj[_PROJ_SITES[leaf]] = {"a": ab["A"].T, "b": ab["B"].T}
            continue
        li = int([t for t in site.split(".") if t.isdigit()][0])
        dec[leaf]["a"][li] = ab["A"].T
        dec[leaf]["b"][li] = ab["B"].T
    # numpy leaves (not jnp.asarray): outside ``jax.enable_x64`` jnp would
    # silently round the f64 torch adapters to f32
    layers = {
        s: {"a": np.stack(v["a"]), "b": np.stack(v["b"])} for s, v in dec.items()
    }
    return {"language_model": {"layers": layers}, "projector": proj}


def _ours_logits(params, cfg, adapters, split, dtype=jnp.float64):
    from multimodal_unlearning_tpu.models import llava

    out = llava.forward(
        params, cfg, jnp.asarray(split["input_ids"]),
        attention_mask=jnp.asarray(split["attention_mask"]),
        pixel_values=jnp.asarray(split["pixel_values"], dtype),
        lora=adapters, lora_scale=SCALE, compute_dtype=dtype,
    )
    return out["logits"]


def test_peft_lora_forward_matches():
    """Apply-site parity with NONZERO B (randomized, so adapter output is
    live on every wrapped linear incl. the projector)."""
    torch = pytest.importorskip("torch")
    cfg = ours_config()
    rng = np.random.default_rng(3)
    split = make_split(rng, cfg, with_image=True, B=2)

    pm = _peft_wrap(_settable_device_llava(seed=0))
    with torch.no_grad():
        g = torch.Generator().manual_seed(7)
        for name, p in pm.named_parameters():
            if ".lora_B." in name and "vision_tower" not in name:
                p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float64) * 0.05)

    t_in = to_torch_inputs({"x": split})["x"]
    with torch.no_grad():
        ref_logits = pm(
            input_ids=t_in["input_ids"], attention_mask=t_in["attention_mask"],
            pixel_values=t_in["pixel_values"].double(),
        ).logits.numpy()

    with jax.enable_x64(True):
        params = _bridge_base(pm)
        adapters = _bridge_adapters(pm, cfg.decoder.num_layers)
        ours = np.asarray(_ours_logits(params, cfg, adapters, split))

    np.testing.assert_allclose(ours, ref_logits, rtol=1e-9, atol=1e-10)


def _run_ours_lora_train(pm, batch, *, n_rows, bs, accum, epochs):
    from multimodal_unlearning_tpu.models import llava
    from multimodal_unlearning_tpu.train import losses as L
    from multimodal_unlearning_tpu.train.optim import make_optimizer

    cfg = ours_config()
    steps = epochs * max(1, n_rows // (bs * accum))
    with jax.enable_x64(True):
        params = _bridge_base(pm)
        adapters = _bridge_adapters(pm, cfg.decoder.num_layers)
        tx = make_optimizer(
            "adamw", LR, weight_decay=WD, warmup_steps=WARMUP,
            total_steps=steps, max_grad_norm=1.0,
        )
        state = tx.init(adapters)

        def fwd_of(ad):
            def fwd(split, **kw):
                return {"logits": _ours_logits(params, cfg, ad, split)}
            return fwd

        def micro(rows_slice):
            return {s: {k: v[rows_slice] for k, v in batch[s].items()} for s in batch}

        def step_loss(ad):
            total = 0.0
            for m in range(accum):
                mb = micro(slice(m * bs, (m + 1) * bs))
                loss, _ = L.compute_forget_loss(
                    LOSS_TYPE, mb, student=fwd_of(ad), teacher=None,
                    beta=1.0, loss_args={},
                )
                total = total + loss
            return total / accum

        losses = []
        grad_fn = jax.jit(jax.value_and_grad(step_loss))
        for _ in range(steps):
            val, grads = grad_fn(adapters)
            upd, state = tx.update(grads, state, adapters)
            adapters = jax.tree.map(lambda p, u: p + u, adapters, upd)
            losses.append(float(val))
    return params, adapters, losses


def test_lora_trajectory_and_merge_match_reference(tmp_path):
    """Full HF-Trainer LoRA trajectory (MMTrainerForgetting over a peft
    model, the mm/forget.py LoRA mode) + merge_and_unload parity."""
    torch = pytest.importorskip("torch")
    cfg = ours_config()
    n_rows, bs, accum, epochs = 4, 2, 2, 4
    _, batch = _rows_and_batch(cfg, n_rows)
    t_batch = {
        s: {k: (t.double() if torch.is_floating_point(t) else t) for k, t in split.items()}
        for s, split in to_torch_inputs(batch).items()
    }

    pm = _peft_wrap(_settable_device_llava(seed=0))
    pm_init = _peft_wrap(_settable_device_llava(seed=0))
    # same torch.manual_seed path in both wraps -> identical A inits; make sure
    for (n1, p1), (n2, p2) in zip(pm.named_parameters(), pm_init.named_parameters()):
        assert n1 == n2 and torch.equal(p1, p2)

    _, ref_losses = _run_reference_train(
        tmp_path, pm, t_batch, n_rows, bs=bs, accum=accum, epochs=epochs
    )
    base_params, adapters, ours_losses = _run_ours_lora_train(
        pm_init, batch, n_rows=n_rows, bs=bs, accum=accum, epochs=epochs
    )

    assert len(ref_losses) == len(ours_losses)
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=1e-3, atol=1e-4)

    # trained adapters agree leaf-for-leaf (B starts at 0 and is pure signal;
    # scale-relative with a floor for the near-zero early-B leaves)
    ref_ad = _bridge_adapters(pm, cfg.decoder.num_layers)
    for k, ours_leaf in jax.tree_util.tree_leaves_with_path(adapters):
        name = jax.tree_util.keystr(k)
        ref_leaf = np.asarray(
            {jax.tree_util.keystr(kk): vv for kk, vv in
             jax.tree_util.tree_leaves_with_path(ref_ad)}[name], np.float64
        )
        scale = max(float(np.max(np.abs(ref_leaf))), 1e-6)
        err = float(np.max(np.abs(np.asarray(ours_leaf, np.float64) - ref_leaf))) / scale
        # 5e-6 (not 1e-6): the jitted grad step's fusion reorders give ~1e-12
        # abs diffs even at f64, which Adam's 1/sqrt(v) amplifies on the
        # near-zero early-B leaves whose scale sits at the 1e-6 floor
        assert err < 5e-6, f"{name}: rel err {err:.3e}"

    # the base never moved under LoRA training
    np.testing.assert_array_equal(
        np.asarray(base_params["language_model"]["lm_head"]),
        np.asarray(_bridge_base(pm)["language_model"]["lm_head"]),
    )

    # merge parity: merge_and_unload (mm/finetune.py:129-133) vs lora.merge_model
    from multimodal_unlearning_tpu.models import lora as lora_mod

    with jax.enable_x64(True):  # outside x64, bridge_params would round to f32
        merged_ref = bridge_params(pm.merge_and_unload(), dtype=np.float64)
        # strict: fold the SAME (reference-trained) adapters on both sides —
        # any difference is pure merge math (scale, transpose, apply site)
        merged_same = lora_mod.merge_model(base_params, ref_ad, SCALE)
        # end-to-end: our trained adapters, bounded by the trajectory tolerance
        merged_ours = lora_mod.merge_model(base_params, adapters, SCALE)
    ref_flat = {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(merged_ref)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(merged_same):
        name = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v, np.float64), ref_flat[name].astype(np.float64),
            rtol=1e-10, atol=1e-13, err_msg=name,
        )
    for k, v in jax.tree_util.tree_leaves_with_path(merged_ours):
        name = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v, np.float64), ref_flat[name].astype(np.float64),
            rtol=1e-6, atol=1e-9, err_msg=name,
        )
