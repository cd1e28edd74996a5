"""Benchmark: the MM forget loop on LLaVA-1.5-7B (the BASELINE.json
north-star: "LLaVA-7B forget steps/sec/chip").

Operating point: the paper model (llava family), per-device batch 2,
W8A8 (int8-quantized frozen decoder, int8 MXU for activations fwd AND the
dx backward) + bf16 LoRA r=8 adapters, grad_diff_forget_ce_retain_ce
(2 student forwards + backward per step), vision tower frozen, per-layer
remat, seq 768 — the realistic CLEAR sample shape (576 image tokens +
caption text; config/mm/forget.yaml's 2048 is a truncation cap, real
samples are ~700 tokens).  int8 storage is what fits 7B (+ a 7B teacher
for KL/NPO/SCRUB losses) on one 16GB v5e chip, and the int8 MXU path runs
the frozen matmuls at ~2× the bf16 rate.  W8A8 is quality-gated: every
int8 variant sits within the bf16 seed-noise floor on Forget Quality and
the full per-sample eval-statistic vector (examples/w8a8_quality_gate.py,
gate PASS recorded in BASELINE.md).  The bf16 operating point is recorded
in BASELINE.md.

vs_baseline compares against an analytic A100-80GB estimate for the same
workload (the reference publishes no numbers — BASELINE.md): FLOPs per step
≈ 2 splits × 3 (fwd+bwd) × 2·P_active·tokens at A100 bf16 peak 312 TFLOP/s
and a generous 45% MFU (bnb QLoRA on A100 dequantizes to bf16 compute, so
the bf16 roofline is the right comparison).  vs_baseline > 1 beats it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _warn_if_chip_claim_stuck(timeout_s: int = 180):
    """The axon pool's single chip can stay leased to a DEAD client (e.g. a
    killed bench), in which case every jax.devices() call blocks until the
    lease frees.  Probe it on a side thread and leave a diagnostic on stderr
    if the probe doesn't return — the bench then keeps waiting (the claim
    usually frees eventually) instead of dying silently."""
    import sys
    import threading

    ready = threading.Event()
    threading.Thread(target=lambda: (jax.devices(), ready.set()), daemon=True).start()
    if not ready.wait(timeout_s):
        print(
            f"bench.py: jax.devices() has not returned after {timeout_s}s — "
            "the TPU pool's chip claim is likely still held by a dead client; "
            "waiting for the lease to free...",
            file=sys.stderr, flush=True,
        )
        ready.wait()


def main():
    _warn_if_chip_claim_stuck()
    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import llava, lora as lora_mod
    from multimodal_unlearning_tpu.train import optim, trainer
    from multimodal_unlearning_tpu.utils.pytree import count_params

    model_cfg = get_model_identifiers("llava")
    mcfg = build_model_config(model_cfg)
    dtype = jnp.bfloat16

    B, S = 2, 768
    n_img = mcfg.num_image_tokens
    img_size = mcfg.vision.image_size

    from multimodal_unlearning_tpu.utils.quantize import quantize_tree_inplace

    params = llava.init_params(mcfg, jax.random.PRNGKey(0), dtype=dtype)
    adapters = lora_mod.init_lora(
        params["language_model"]["layers"], 8, jax.random.PRNGKey(1), dtype=dtype
    )
    adapters = {"language_model": adapters}

    # int8-quantize the frozen decoder leaf-by-leaf, freeing bf16 buffers
    quantize_tree_inplace(params["language_model"])
    scale = lora_mod.lora_scale(8, 32)

    # W8A8 + int8 dx backward (quality-gated; see module docstring)
    from multimodal_unlearning_tpu.models.llama import enable_int8_compute
    from multimodal_unlearning_tpu.utils.quantize import enable_int8_bwd

    enable_int8_compute(True)
    enable_int8_bwd(True)

    rng = np.random.default_rng(0)

    def split_batch():
        ids = rng.integers(10, mcfg.decoder.vocab_size - 70, (B, S))
        ids[:, :n_img] = mcfg.image_token_id
        labels = ids.copy()
        labels[:, : n_img + 64] = -100
        return {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "attention_mask": jnp.ones((B, S), jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "pixel_values": jnp.asarray(
                rng.normal(size=(B, img_size, img_size, 3)), dtype
            ),
        }

    batch = {"forget": split_batch(), "retain": split_batch()}

    # remat policy from the round-4 W8A8 sweep (examples/perf_sweep.py):
    # full 1.659, save_attn 1.698, save_attn_ffn 1.695 steps/s; none OOMs
    # even at int8 — save_attn skips recomputing attention inside each
    # rematted layer at an activation cost that still fits
    apply_fn = make_apply_fn(
        "llava", mcfg, lora_cfg=scale, compute_dtype=dtype, remat=True,
        remat_policy="save_attn", logits_dtype=dtype)

    tx = optim.make_optimizer("adamw", 1e-5, weight_decay=0.01)
    step = trainer.make_train_step(
        apply_fn, tx, loss_type="grad_diff_forget_ce_retain_ce", donate=False,
        combine=lambda tr, fr: (fr, tr),
    )
    state = trainer.create_train_state(adapters, tx)

    # warmup/compile.  Synchronize by fetching a VALUE: through the axon
    # remote-execution proxy, block_until_ready can return before the device
    # work drains; a device->host read of the final step's loss cannot.
    state, metrics = step(state, params, None, batch)
    float(metrics["loss"])

    n_steps = 8
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, params, None, batch)
    float(metrics["loss"])  # sync point: depends on the whole step chain
    dt = time.perf_counter() - t0
    steps_per_sec = n_steps / dt

    # analytic A100 estimate for the same workload
    p_active = count_params(params["language_model"]) + count_params(params["projector"])
    p_vision = count_params(params["vision_tower"])
    tokens = 2 * B * S                       # forget + retain splits
    vis_tokens = 2 * B * (n_img + 1)
    flops_per_step = 3 * 2 * p_active * tokens + 3 * 2 * p_vision * vis_tokens
    a100_flops = 312e12 * 0.45
    a100_steps_per_sec = a100_flops / flops_per_step

    print(
        json.dumps(
            {
                "metric": "mm_forget_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s (llava-1.5-7b, bs2, seq768, W8A8 int8 base fwd+bwd [quality-gated] + bf16 LoRA r8, grad_diff, remat, one v5e chip)",
                "vs_baseline": round(steps_per_sec / a100_steps_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
