"""NLP unlearning entry point (reference: nlp/forget.py).

Differences from the mm path, preserved from the reference:
- TextForgetDatasetQA / TextForgetDatasetDPOQA by loss (nlp/forget.py:63-79);
- ``idk`` runs as ONE concatenated forward (nlp/dataloader.py:403-410) —
  the collator merges idk+retain rows into a single 'retain' split so the
  loss is one global token-mean;
- projection methods use SGD + the dual-backward GradProjections step
  (nlp/forget.py:166,181; nlp/grad_proj.py) — note the reference script
  crashes as-is (PROJECTION_METHODS never imported, SURVEY.md §2.4); here
  they work.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import main as config_main, save_config
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.cli.mm_forget import SKU_LOSS_ARGS, make_apply_fn
from multimodal_unlearning_tpu.data.loader import DataLoader
from multimodal_unlearning_tpu.data.nlp import (
    TextForgetDatasetDPOQA,
    TextForgetDatasetQA,
    text_collator,
)
from multimodal_unlearning_tpu.models import lora as lora_mod
from multimodal_unlearning_tpu.train import grad_proj, losses as L, optim, trainer
from multimodal_unlearning_tpu.train.loop import compute_steps, train_loop
from multimodal_unlearning_tpu.utils.pytree import print_trainable_parameters


def run(cfg):
    common.maybe_init_distributed()
    model_cfg = get_model_identifiers(cfg.model_family)
    mesh = common.build_mesh(cfg)
    dtype = common.dtype_of(cfg)
    save_dir = Path(cfg.save_dir)
    if save_dir.exists() and not cfg.get("overwrite_dir", True):
        print("Directory already exists")
        return
    save_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, save_dir / "config.yaml")

    processor = common.build_processor(model_cfg, cfg)
    tok = processor.tokenizer
    tags = {
        "question_start_tag": model_cfg.get("question_start_tag", ""),
        "question_end_tag": model_cfg.get("question_end_tag", ""),
        "answer_tag": model_cfg.get("answer_tag", ""),
    }
    loss_name = cfg.forget_loss
    ds_cls = TextForgetDatasetDPOQA if loss_name.lower() in ("dpo", "llmu") else TextForgetDatasetQA
    kw = dict(tokenizer=tok, tags=tags, max_length=cfg.max_length, split=cfg.split, seed=cfg.seed)
    if ds_cls is TextForgetDatasetQA:
        kw["loss_type"] = loss_name
        kw["eco_prompts_path"] = cfg.get("eco_prompts_path")
    dataset = ds_cls(cfg.data_path, **kw)

    is_projection = loss_name in grad_proj.PROJECTION_METHODS
    idk_concat = loss_name.lower() == "idk"

    def collate(samples):
        batch = text_collator(samples)
        if is_projection:
            return {"forget": batch["forget"], "retain": batch["retain"]}
        if idk_concat:
            # single concatenated forward (nlp/dataloader.py:403-410)
            merged = {
                k: np.concatenate([batch["idk"][k], batch["retain"][k]])
                for k in batch["idk"]
            }
            return {"retain": merged}
        return batch

    loader = DataLoader(
        dataset,
        cfg.batch_size * common.num_data_devices(mesh) * cfg.gradient_accumulation_steps,
        collate, shuffle=True, seed=cfg.seed,
    )
    steps_per_epoch, max_steps = compute_steps(
        len(dataset), cfg.batch_size, cfg.gradient_accumulation_steps,
        common.num_data_devices(mesh), cfg.num_epochs,
    )
    max_steps = max(max_steps, 1)
    print(f"max_steps: {max_steps}")

    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.seed, dtype=dtype
    )
    needs_teacher = (
        L.loss_needs_teacher(loss_name)
        or cfg.get("l1_lambda", 0) != 0 or cfg.get("l0_lambda", 0) != 0
    ) and not is_projection
    use_lora = cfg.LoRA.r != 0 and not is_projection
    # under LoRA the base is frozen, so the teacher (≡ initial model) IS the
    # base tree — alias instead of copying (halves 7B weight residency);
    # full-finetune runs still need a real copy because the student drifts
    teacher_params = (
        (params if use_lora else jax.tree.map(jnp.copy, params))
        if needs_teacher else None)
    remat = str(model_cfg.get("gradient_checkpointing", "false")) == "true"
    if cfg.get("remat") is not None:  # cfg override of the registry flag
        # (the reference inherits llava's gradient_checkpointing=false from
        # 80GB-GPU ZeRO runs; a 16GB v5e needs remat at 7B)
        remat = bool(cfg.remat)
    attn_impl = "auto" if str(model_cfg.get("flash_attention2", "true")) == "true" else "xla"

    opt_name = "sgd" if is_projection else cfg.get("optimizer", "adamw")
    tx = optim.make_optimizer(
        opt_name, float(cfg.lr), weight_decay=float(cfg.get("weight_decay", 0.0)),
        warmup_steps=max(1, steps_per_epoch), total_steps=max_steps,
        max_grad_norm=common.max_grad_norm_of(cfg, cfg.forget_loss),
    )

    scale = lora_mod.lora_scale(cfg.LoRA.r, cfg.LoRA.alpha) if use_lora else 0.0
    combine = None
    if use_lora:
        adapters = lora_mod.init_lora(params["layers"], cfg.LoRA.r, jax.random.PRNGKey(cfg.seed))
        trainable, frozen = adapters, params
        combine = lambda tr, fr: (fr, tr)
        print_trainable_parameters(trainable, params)
    else:
        trainable, frozen = params, None
        print_trainable_parameters(trainable, {})
    if mesh.shape["seq"] > 1:
        attn_impl = "ring"  # sequence/context parallelism over the seq axis
    apply_fn = make_apply_fn(kind, mcfg, lora_cfg=scale if use_lora else None,
                             remat=remat, attn_impl=attn_impl, compute_dtype=dtype,
                             logits_dtype=dtype if dtype == jnp.bfloat16 else jnp.float32,
                             mesh=mesh, pp_microbatches=cfg.get("pp_microbatches"))

    effective_loss = "retain_ft" if idk_concat else loss_name

    if is_projection:
        step_fn = grad_proj.make_grad_proj_step(
            apply_fn, tx, method=loss_name, gamma=float(cfg.get("l2_grad_gamma", 1.0)),
            # grad_proj_l2_ref=true reproduces the reference's actual
            # (degenerate, retain-gradient-only) numerics — see grad_proj.py
            ref_behavior=bool(cfg.get("grad_proj_l2_ref", False)),
        )
        opt_state = tx.init(trainable)
        step_i = 0
        while step_i < max_steps:
            for batch in loader:
                if step_i >= max_steps:
                    break
                trainable, opt_state, metrics = step_fn(trainable, opt_state, frozen, batch)
                step_i += 1
                if step_i % max(1, max_steps // 20) == 0 or step_i == 1:
                    print(f"step {step_i}/{max_steps}  neg {float(metrics['neg_loss']):.4f}  pos {float(metrics['pos_loss']):.4f}", flush=True)
        final_trainable = trainable
    else:
        control_vec = None
        if loss_name.lower() == "rmu":
            # NLP-trainer RMU: a single (1,1,H) steering vector shared across
            # the batch (nlp/dataloader.py:336-343) — unlike the MM trainer's
            # per-sample (B,1,H) vector
            control_vec = L.make_control_vec(jax.random.PRNGKey(cfg.seed), 1, mcfg.hidden_size)
        # The NLP reference's L1/L0 block has no l_norm_from switch
        # (nlp/dataloader.py:461-485): with LoRA it regularizes the raw
        # adapter params ("zero"), without LoRA the delta from the oracle
        # ("init" — the forget run starts FROM the oracle ckpt, so init ==
        # oracle).  "auto" (the default) applies exactly that rule; an
        # explicit zero/init override is honored.
        l_norm_from = str(cfg.get("l_norm_from", "auto"))
        if l_norm_from == "auto":
            l_norm_from = "zero" if use_lora else "init"
        step_fn = trainer.make_train_step(
            apply_fn, tx, loss_type=effective_loss,
            beta=float(cfg.get("loss_beta", 1.0)),
            l1_lambda=float(cfg.get("l1_lambda", 0.0)),
            l0_lambda=float(cfg.get("l0_lambda", 0.0)),
            l_norm_from=l_norm_from,
            # rmu_nlp / npo_nlp: the NLP trainer's own RMU and NPO numerics
            # (nlp/dataloader.py:333-358,383-400) — see train/losses.py
            loss_args={**SKU_LOSS_ARGS, "rmu_nlp": True, "npo_nlp": True},
            dpo_fix=bool(cfg.get("dpo_fix", False)),
            grad_accum=cfg.gradient_accumulation_steps,
            combine=combine,
        )
        keep_init = (cfg.get("l1_lambda", 0) != 0 or cfg.get("l0_lambda", 0) != 0) and l_norm_from == "init"
        state = trainer.create_train_state(trainable, tx, control_vec=control_vec, keep_init=keep_init)
        state, frozen, teacher_params = trainer.shard_train_state(state, frozen, teacher_params, mesh)
        if mesh.shape["tensor"] > 1:
            if not use_lora:
                state = state.replace(
                    trainable=common.apply_tensor_parallel(mesh, mcfg, kind, state.trainable)
                )
            frozen, teacher_params = common.apply_tensor_parallel(
                mesh, mcfg, kind, frozen, teacher_params
            )
        if mesh.shape["expert"] > 1:
            if not use_lora:
                state = state.replace(
                    trainable=common.apply_expert_parallel(mesh, mcfg, kind, state.trainable)
                )
            frozen, teacher_params = common.apply_expert_parallel(
                mesh, mcfg, kind, frozen, teacher_params
            )
        if mesh.shape["pipe"] > 1:
            if not use_lora:
                state = state.replace(
                    trainable=common.apply_pipeline_parallel(mesh, mcfg, kind, state.trainable)
                )
            frozen, teacher_params = common.apply_pipeline_parallel(
                mesh, mcfg, kind, frozen, teacher_params
            )
        state, _ = train_loop(
            train_step=step_fn, state=state, frozen=frozen, teacher_params=teacher_params,
            dataloader=loader, mesh=mesh, grad_accum=cfg.gradient_accumulation_steps,
            max_steps=max_steps, logging_steps=max(1, max_steps // 20),
            # preemption-safe resume (see cli/mm_forget.py)
            save_steps=max(1, steps_per_epoch),
            state_ckpt_dir=str(save_dir / "train_state"),
            ckpt_async=bool(cfg.get("ckpt_async", True)),
            ckpt_keep=int(cfg.get("ckpt_keep", 0) or 0) or None,
            resume=bool(cfg.get("resume_from_checkpoint")),
        )
        final_trainable = state.trainable

    if cfg.get("save_model", True):
        if use_lora:
            final = lora_mod.merge(
                params, final_trainable, scale, consume=True,
                out_dtype=common.parse_dtype(cfg.get("merge_dtype")))
        else:
            final = final_trainable
        common.save_model(save_dir, model_cfg, final)
        print(f"Saved model to {save_dir}")
    if use_lora and cfg.get("save_adapters"):
        # raw adapters for multi-LoRA serving (see cli/mm_forget.py)
        from multimodal_unlearning_tpu.train.checkpoints import save_adapter

        save_adapter(save_dir / "adapter", final_trainable, scale,
                     meta={"forget_loss": str(cfg.forget_loss)})
        print(f"Saved raw LoRA adapter to {save_dir / 'adapter'}")


main = config_main(config_dir() / "nlp", "forget")(run)

if __name__ == "__main__":
    main()
