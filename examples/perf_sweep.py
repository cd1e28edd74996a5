"""Perf sweep for the bench operating point (llava-7b forget step, one chip).

Sweeps precision mode x remat policy (x loss) and prints steps/s for each
variant so bench.py can pin the fastest configuration.  Variants:

  precision: bf16 | int8 (QLoRA storage, bf16 compute) | w8a8 (int8 MXU)
             | w8a8b (w8a8 + int8 dx backward)
  remat:     full | save_attn | save_attn_ffn | none (if it fits)
  loss:      optional third field (default grad_diff_forget_ce_retain_ce);
             teacher-resident losses (npo / KL / scrub) get a co-resident
             7B teacher at the SAME precision — the expensive half of the
             reference sweep (run_exps.py:92-103), 1-2 extra 7B forwards.

Usage: python examples/perf_sweep.py [family] [variant ...]
  variant = "<precision>:<remat>[:<loss>][:s<seqlen>]", default sweep list
  below.  The optional trailing "s<seqlen>" field (e.g. ":s2048") moves the
  op point off the default S=768 — config/mm/forget.yaml's max_length cap
  is 2048, so ":s2048" is the literal config-cap operating point.
  An optional leading family name (no ":") swaps the model — e.g.
  "qwen-vl-3b" benches the true Qwen2.5-VL arch's forget step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(precision, remat_policy, loss="grad_diff_forget_ce_retain_ce", seq=768,
          family="llava"):
    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import lora as lora_mod, vlm_module
    from multimodal_unlearning_tpu.models.llama import enable_int8_compute
    from multimodal_unlearning_tpu.train import losses as L, optim, trainer
    from multimodal_unlearning_tpu.utils.quantize import quantize_leaf

    model_cfg = get_model_identifiers(family)
    kind = model_cfg["arch"]["kind"]
    mcfg = build_model_config(model_cfg)
    dtype = jnp.bfloat16
    B, S = 2, seq
    n_img = mcfg.num_image_tokens
    img_size = mcfg.vision.image_size

    params = vlm_module(kind).init_params(mcfg, jax.random.PRNGKey(0), dtype=dtype)
    adapters = {"language_model": lora_mod.init_lora(
        params["language_model"]["layers"], 8, jax.random.PRNGKey(1), dtype=dtype)}

    if precision in ("int8", "w8a8", "w8a8b"):
        qfn = jax.jit(quantize_leaf)

        def quantize_inplace(d):
            for key in list(d.keys()):
                v = d[key]
                if isinstance(v, dict):
                    quantize_inplace(v)
                elif v.ndim >= 2 and v.shape[-1] >= 256 and v.shape[-2] >= 256:
                    q = qfn(v)
                    jax.block_until_ready(q)
                    v.delete()
                    d[key] = q

        quantize_inplace(params["language_model"])
    enable_int8_compute(precision in ("w8a8", "w8a8b"))
    from multimodal_unlearning_tpu.utils.quantize import enable_int8_bwd

    enable_int8_bwd(precision == "w8a8b")

    scale = lora_mod.lora_scale(8, 32)
    rng = np.random.default_rng(0)

    def split_batch():
        ids = rng.integers(10, mcfg.decoder.vocab_size - 70, (B, S))
        if kind == "qwen2_vl":
            g = img_size // mcfg.vision.patch_size
            ids[:, 0] = mcfg.vision_start_token_id
            ids[:, 1:1 + n_img] = mcfg.image_token_id
            ids[:, 1 + n_img] = mcfg.vision_end_token_id
            pix = jnp.asarray(
                rng.normal(size=(B, g * g, mcfg.vision.patch_dim)), dtype)
        else:
            ids[:, :n_img] = mcfg.image_token_id
            pix = jnp.asarray(rng.normal(size=(B, img_size, img_size, 3)), dtype)
        labels = ids.copy()
        labels[:, : n_img + 64] = -100
        return {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "attention_mask": jnp.ones((B, S), jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "pixel_values": pix,
        }

    batch = {"forget": split_batch(), "retain": split_batch()}

    remat = remat_policy != "none"
    apply_fn = make_apply_fn(
        kind, mcfg, lora_cfg=scale, compute_dtype=dtype,
        remat=remat, remat_policy=None if remat_policy in ("none", "full") else remat_policy,
        logits_dtype=dtype,
    )
    tx = optim.make_optimizer("adamw", 1e-5, weight_decay=0.01)
    step = trainer.make_train_step(
        apply_fn, tx, loss_type=loss, donate=False,
        combine=lambda tr, fr: (fr, tr),
    )
    state = trainer.create_train_state(adapters, tx)
    # teacher-resident losses: co-resident 7B teacher at the same precision,
    # sharing the frozen base arrays (forget runs start FROM the finetuned
    # checkpoint, so teacher == frozen base — no extra HBM, 1-2 extra fwd)
    teacher = params if L.loss_needs_teacher(loss) else None

    # nominal FLOPs/step (same formula as bench.py's A100 estimate): 2 splits
    # × (fwd+bwd=3) × 2·P·tokens for the student + 1× fwd per teacher split
    from multimodal_unlearning_tpu.utils.pytree import count_params

    p_act = count_params(params["language_model"]) + (
        count_params(params["projector"]) if "projector" in params else 0
    )
    p_vis = count_params(params["vision_tower"])
    n_teacher_fwd = {"npo": 1, "kl": 1, "scrub": 2, "llmu": 1}.get(loss.lower(), 0)
    if loss.lower().startswith("grad_diff"):
        n_teacher_fwd = int("forget_kl" in loss.lower()) + int("retain_kl" in loss.lower())
    # vision FLOP tokens: pre-merge patches for qwen towers, patch grid for CLIP
    vis_per_img = n_img * mcfg.vision.spatial_merge_size**2 if kind == "qwen2_vl" else n_img + 1
    tokens, vis_tokens = 2 * B * S, 2 * B * vis_per_img
    flops = 3 * 2 * p_act * tokens + 3 * 2 * p_vis * vis_tokens
    flops += n_teacher_fwd * 2 * p_act * B * S + n_teacher_fwd * 2 * p_vis * B * (vis_per_img)
    return step, state, params, teacher, batch, flops


def run_variant(name, family="llava"):
    parts = name.split(":")
    precision, remat_policy = parts[0], parts[1]
    seq = 768
    rest = parts[2:]
    if rest and rest[-1].startswith("s") and rest[-1][1:].isdigit():
        seq = int(rest.pop()[1:])
    loss = rest[0] if rest else "grad_diff_forget_ce_retain_ce"
    try:
        step, state, params, teacher, batch, flops = build(
            precision, remat_policy, loss, seq, family=family)
        t_c0 = time.perf_counter()
        state, metrics = step(state, params, teacher, batch)
        loss0 = float(metrics["loss"])
        compile_s = time.perf_counter() - t_c0
        n_steps = 8
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, params, teacher, batch)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        sps = n_steps / dt
        # measured MFU on the NOMINAL step FLOPs (remat recompute not counted
        # as useful work) against the v5e bf16 peak 197 TFLOP/s
        mfu = sps * flops / 197e12
        print(
            f"{name:30s} {sps:6.3f} steps/s   MFU={mfu:5.1%}   "
            f"loss0={loss0:.4f}  compile={compile_s:.0f}s", flush=True,
        )
        return sps
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    finally:
        # free device memory between variants
        for buf in jax.live_arrays():
            buf.delete()


DEFAULT = [
    "bf16:full",
    "bf16:save_attn",
    "int8:full",
    "int8:save_attn",
    "w8a8:full",
    "w8a8:save_attn",
    "w8a8:save_attn_ffn",
    "w8a8b:full",
]

if __name__ == "__main__":
    args = sys.argv[1:]
    family = args.pop(0) if args and ":" not in args[0] else "llava"
    variants = args or DEFAULT
    for v in variants:
        run_variant(v, family=family)
