"""NLP finetune entry point (reference: nlp/finetune.py): plain-CE TOFU
finetune, LoRA r=8, HF-layout save with merge.  The unsloth fast-finetune
variant (nlp/unsloth_ft.py) is subsumed: the jitted step IS the fast path.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.config import main as config_main, save_config
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
from multimodal_unlearning_tpu.data.loader import DataLoader
from multimodal_unlearning_tpu.data.nlp import TextDatasetQA
from multimodal_unlearning_tpu.models import lora as lora_mod
from multimodal_unlearning_tpu.train import optim, trainer
from multimodal_unlearning_tpu.train.loop import compute_steps, train_loop
from multimodal_unlearning_tpu.utils.pytree import print_trainable_parameters

import numpy as np


def run(cfg):
    common.maybe_init_distributed()
    model_cfg = get_model_identifiers(cfg.model_family)
    mesh = common.build_mesh(cfg)
    dtype = common.dtype_of(cfg)
    save_dir = Path(cfg.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, save_dir / "config.yaml")

    processor = common.build_processor(model_cfg, cfg)
    tags = {
        "question_start_tag": model_cfg.get("question_start_tag", ""),
        "question_end_tag": model_cfg.get("question_end_tag", ""),
        "answer_tag": model_cfg.get("answer_tag", ""),
    }
    dataset = TextDatasetQA(
        cfg.data_path, processor.tokenizer, tags,
        max_length=cfg.get("max_length", 500), split=cfg.split,
    )

    def collate(samples):
        return {"retain": {
            "input_ids": np.stack([s["input_ids"] for s in samples]),
            "labels": np.stack([s["labels"] for s in samples]),
            "attention_mask": np.stack([s["attention_mask"] for s in samples]),
        }}

    loader = DataLoader(
        dataset,
        cfg.batch_size * common.num_data_devices(mesh) * cfg.gradient_accumulation_steps,
        collate, shuffle=True, seed=cfg.seed,
    )
    from multimodal_unlearning_tpu.data.prefetch import PrefetchLoader
    loader = PrefetchLoader(loader, depth=2)
    steps_per_epoch, max_steps = compute_steps(
        len(dataset), cfg.batch_size, cfg.gradient_accumulation_steps,
        common.num_data_devices(mesh), cfg.num_epochs,
    )
    max_steps = max(max_steps, 1)
    print(f"max_steps: {max_steps}")

    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.seed, dtype=dtype
    )
    tx = optim.make_optimizer(
        cfg.get("optimizer", "adamw"), float(cfg.lr),
        weight_decay=float(cfg.get("weight_decay", 0.0)),
        warmup_steps=max(1, steps_per_epoch), total_steps=max_steps,
        max_grad_norm=common.max_grad_norm_of(cfg),
    )
    use_lora = cfg.LoRA.r != 0
    scale = lora_mod.lora_scale(cfg.LoRA.r, cfg.LoRA.alpha) if use_lora else 0.0
    combine = None
    if use_lora:
        trainable = lora_mod.init_lora(params["layers"], cfg.LoRA.r, jax.random.PRNGKey(cfg.seed))
        frozen = params
        combine = lambda tr, fr: (fr, tr)
        print_trainable_parameters(trainable, params)
    else:
        trainable, frozen = params, None
        print_trainable_parameters(trainable, {})
    apply_fn = make_apply_fn(
        kind, mcfg, lora_cfg=scale if use_lora else None,
        compute_dtype=dtype, logits_dtype=dtype if dtype == jnp.bfloat16 else jnp.float32,
        attn_impl="auto" if str(model_cfg.get("flash_attention2", "true")) == "true" else "xla",
        mesh=mesh, pp_microbatches=cfg.get("pp_microbatches"),
    )

    step_fn = trainer.make_train_step(
        apply_fn, tx, loss_type="retain_ft",
        grad_accum=cfg.gradient_accumulation_steps, combine=combine,
    )
    state = trainer.create_train_state(trainable, tx)
    state, frozen, _ = trainer.shard_train_state(state, frozen, None, mesh)
    if mesh.shape["tensor"] > 1:
        if not use_lora:
            state = state.replace(
                trainable=common.apply_tensor_parallel(mesh, mcfg, kind, state.trainable)
            )
        frozen = common.apply_tensor_parallel(mesh, mcfg, kind, frozen)
    if mesh.shape["expert"] > 1:
        if not use_lora:
            state = state.replace(
                trainable=common.apply_expert_parallel(mesh, mcfg, kind, state.trainable)
            )
        frozen = common.apply_expert_parallel(mesh, mcfg, kind, frozen)
    if mesh.shape["pipe"] > 1:
        if not use_lora:
            state = state.replace(
                trainable=common.apply_pipeline_parallel(mesh, mcfg, kind, state.trainable)
            )
        frozen = common.apply_pipeline_parallel(mesh, mcfg, kind, frozen)
    state, _ = train_loop(
        train_step=step_fn, state=state, frozen=frozen, teacher_params=None,
        dataloader=loader, mesh=mesh, grad_accum=cfg.gradient_accumulation_steps,
        max_steps=max_steps, logging_steps=max(1, max_steps // 20),
        # preemption-safe resume (see cli/mm_forget.py)
        save_steps=max(1, steps_per_epoch),
        state_ckpt_dir=str(save_dir / "train_state"),
        ckpt_async=bool(cfg.get("ckpt_async", True)),
        ckpt_keep=int(cfg.get("ckpt_keep", 0) or 0) or None,
        resume=bool(cfg.get("resume_from_checkpoint")),
    )

    final = (lora_mod.merge(params, state.trainable, scale, consume=True,
                            out_dtype=common.parse_dtype(cfg.get("merge_dtype")))
             if use_lora else state.trainable)
    common.save_model(save_dir, model_cfg, final)
    if use_lora and cfg.get("save_adapters"):
        from multimodal_unlearning_tpu.train.checkpoints import save_adapter

        save_adapter(save_dir / "adapter", state.trainable, scale)
        print(f"Saved raw LoRA adapter to {save_dir / 'adapter'}")
    print(f"Saved model to {save_dir}")


main = config_main(config_dir() / "nlp", "finetune")(run)

if __name__ == "__main__":
    main()
