"""MM unlearning entry point (reference: mm/forget.py).

Usage: python -m multimodal_unlearning_tpu.cli.mm_forget forget_loss=npo ...
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.config import main as config_main, save_config
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.data import DataLoader, MMMixedForgetDataset
from multimodal_unlearning_tpu.models import lora as lora_mod
from multimodal_unlearning_tpu.train import losses as L, optim, trainer
from multimodal_unlearning_tpu.train.loop import compute_steps, train_loop
from multimodal_unlearning_tpu.utils.pytree import (
    partition_tree,
    path_predicate,
    print_trainable_parameters,
)

# SKU loss weights (mm/forget.py:186)
SKU_LOSS_ARGS = {"bad_weight": 2.5, "random_weight": 1.0, "normal_weight": 0.5}


def make_apply_fn(kind, mcfg, *, lora_cfg=None, remat=False, remat_policy=None, attn_impl="auto", compute_dtype=jnp.bfloat16, logits_dtype=None, mesh=None, pp_microbatches=None):
    """apply_fn(params_or_(params,lora), batch_part, capture_layer) → outputs.

    ``logits_dtype`` defaults to ``compute_dtype``: a fp32 [B,S,V] logits
    buffer is pure HBM waste on a bandwidth-tight chip — every loss does its
    softmax/lse math in fp32 regardless (train/losses.py:_token_nll), so
    bf16 logits lose nothing but the buffer traffic."""
    if logits_dtype is None:
        logits_dtype = compute_dtype
    from multimodal_unlearning_tpu.models import VLM_KINDS, decoder_module, vlm_module

    vlm = kind in VLM_KINDS
    fwd = vlm_module(kind).forward if vlm else decoder_module(mcfg).forward

    def apply_fn(params, part, capture_layer=None):
        kw = dict(
            attention_mask=jnp.asarray(part["attention_mask"]),
            capture_layer=capture_layer,
            remat=remat,
            remat_policy=remat_policy,
            attn_impl=attn_impl,
            compute_dtype=compute_dtype,
            logits_dtype=logits_dtype,
        )
        if isinstance(params, tuple):  # (base, adapters) LoRA mode
            base, adapters = params
            kw.update(lora=adapters, lora_scale=lora_cfg)
        else:
            base = params
        if vlm:
            kw["pixel_values"] = jnp.asarray(part["pixel_values"])
        elif attn_impl == "ring":
            kw["mesh"] = mesh  # sequence-parallel ring attention (llama path)
        from multimodal_unlearning_tpu.parallel.pp import pp_degree

        if pp_degree(mesh) > 1:  # GPipe pipeline over the 'pipe' mesh axis
            kw["mesh"] = mesh
            kw["pp_microbatches"] = pp_microbatches
        out = fwd(base, mcfg, jnp.asarray(part["input_ids"]), **kw)
        return {"logits": out["logits"], "captured": out["captured"]}

    return apply_fn


def run(cfg):
    try:
        return _run(cfg)
    finally:
        # int8 flags are module-global trace-time switches: never leak them
        # into a subsequent in-process run (tests, orchestrator workers)
        from multimodal_unlearning_tpu.models.llama import enable_int8_compute
        from multimodal_unlearning_tpu.utils.quantize import enable_int8_bwd

        enable_int8_compute(False)
        enable_int8_bwd(False)


def _run(cfg):
    common.maybe_init_distributed()
    model_cfg = get_model_identifiers(cfg.model_family)
    mesh = common.build_mesh(cfg)
    dtype = common.dtype_of(cfg)
    print(f"num_devices: {common.num_data_devices(mesh)}  mesh: {dict(mesh.shape)}")

    save_dir = Path(cfg.save_dir)
    if save_dir.exists() and not cfg.get("overwrite_dir", True):
        print("Directory already exists")
        return
    save_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, save_dir / "config.yaml")

    processor = common.build_processor(model_cfg, cfg)
    dataset = MMMixedForgetDataset(
        forget_data_path=cfg.forget_data_path,
        retain_data_path=cfg.retain_data_path,
        retain_split=cfg.retain_split,
        forget_split=cfg.forget_split,
        forget_loss=cfg.forget_loss,
        seed=cfg.seed,
        idk_fix=bool(cfg.get("idk_fix", False)),
    )
    collate = partial(processor.collate_forget, max_length=cfg.max_length)
    loader = DataLoader(dataset, cfg.batch_size * common.num_data_devices(mesh) * cfg.gradient_accumulation_steps,
                        collate, shuffle=True, seed=cfg.seed)
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
    needs_teacher = (
        L.loss_needs_teacher(cfg.forget_loss)
        or cfg.get("l1_lambda", 0) != 0
        or cfg.get("l0_lambda", 0) != 0
    )
    # LoRA gating rule (mm/forget.py:126)
    use_lora = cfg.LoRA.r != 0 and (cfg.get("l_norm_from") != "zero" or cfg.get("l1_lambda", 0) == 0)

    # int8 QLoRA mode (beyond-reference): frozen decoder base and/or teacher
    # stored int8 with per-channel scales — halves HBM and runs matmuls at
    # the int8 MXU rate.  Under LoRA the base is FROZEN, so when base and
    # teacher want the same precision the teacher IS the quantized base:
    # alias it instead of copying (this is what fits a 7B student + 7B
    # teacher on one 16 GB v5e — a bf16 copy alone is 13.5 GB, and even a
    # quantized copy doubles the 6.7 GB int8 residency for identical bytes).
    _qspec = lambda v: "int4" if str(v).strip().lower() == "int4" else "int8"
    share_teacher = bool(
        needs_teacher and use_lora
        and cfg.get("quantize_base") and cfg.get("quantize_teacher")
        and _qspec(cfg.quantize_base) == _qspec(cfg.quantize_teacher)
    )
    teacher_params = None
    if needs_teacher and not share_teacher:
        teacher_params = jax.tree.map(jnp.copy, params)
        if cfg.get("quantize_teacher"):
            teacher_params = common.quantize_base_params(
                teacher_params, kind, cfg.quantize_teacher)
    freeze_vision = str(cfg.get("freeze_vision_module", "true")).lower() == "true" and common.is_vlm(kind)

    remat = str(model_cfg.get("gradient_checkpointing", "false")) == "true"
    if cfg.get("remat") is not None:  # cfg override of the registry flag
        # (the reference inherits llava's gradient_checkpointing=false from
        # 80GB-GPU ZeRO runs; a 16GB v5e needs remat at 7B)
        remat = bool(cfg.remat)
    # save_attn_ffn measured fastest at the bf16 7B point (BASELINE.md)
    remat_policy = cfg.get("remat_policy") or None
    attn_impl = "auto" if str(model_cfg.get("flash_attention2", "true")) == "true" else "xla"
    compute_dtype = dtype

    dec_cfg = mcfg.decoder if common.is_vlm(kind) else mcfg
    warmup = max(1, steps_per_epoch)
    # LLaVA taps hidden_states[vision_feature_layer]: layers above it get no
    # grads; torch AdamW skips grad=None params, so the reference never
    # weight-decays them either (models/llava.py:reachable_mask)
    from multimodal_unlearning_tpu.models import vlm_module

    reach = (
        (lambda p: vlm_module(kind).reachable_mask(p, mcfg))
        if kind == "llava" else None
    )
    tx = optim.make_optimizer(
        cfg.get("optimizer", "adamw"), float(cfg.lr),
        weight_decay=float(cfg.get("weight_decay", 0.0)),
        warmup_steps=warmup, total_steps=max_steps,
        max_grad_norm=common.max_grad_norm_of(cfg),
        reachable_mask=reach,
    )

    scale = lora_mod.lora_scale(cfg.LoRA.r, cfg.LoRA.alpha) if use_lora else 0.0
    combine = None
    if use_lora:
        # projector adapters default ON (utils.py:10-19 adapts every linear
        # except lm_head); LoRA.projector=false opts out
        adapters = lora_mod.init_model_lora(
            params, cfg.LoRA.r, jax.random.PRNGKey(cfg.seed),
            projector=bool(cfg.LoRA.get("projector", True)),
        )
        trainable = adapters
        print_trainable_parameters(trainable, params)
        if cfg.get("quantize_base"):
            params = common.quantize_base_params(params, kind, cfg.quantize_base)
            if cfg.get("int8_compute"):
                from multimodal_unlearning_tpu.models.llama import enable_int8_compute

                enable_int8_compute(True)  # W8A8 on the frozen matmuls
            if cfg.get("int8_bwd"):
                from multimodal_unlearning_tpu.utils.quantize import enable_int8_bwd

                enable_int8_bwd(True)  # dx backward on the int8 MXU too
        apply_fn = make_apply_fn(kind, mcfg, lora_cfg=scale, remat=remat, remat_policy=remat_policy, attn_impl=attn_impl, compute_dtype=compute_dtype, mesh=mesh, pp_microbatches=cfg.get("pp_microbatches"))
        combine = lambda tr, fr: (fr, tr)
        merged_frozen = params  # flows through the frozen arg, not a closure
        if share_teacher:
            # teacher ≡ initial model ≡ the (now quantized) frozen base —
            # identical bytes to the copy-then-quantize path, zero extra HBM
            teacher_params = params
    else:
        vision_pred = path_predicate(str(model_cfg.get("vision_module", "vision_tower")))
        if freeze_vision:
            frozen, trainable = partition_tree(params, vision_pred)
        else:
            trainable, frozen = params, None
        print_trainable_parameters(trainable, frozen or {})
        apply_fn = make_apply_fn(kind, mcfg, remat=remat, remat_policy=remat_policy, attn_impl=attn_impl, compute_dtype=compute_dtype, mesh=mesh, pp_microbatches=cfg.get("pp_microbatches"))
        merged_frozen = frozen

    control_vec = None
    if cfg.forget_loss.lower() == "rmu":
        control_vec = L.make_control_vec(
            jax.random.PRNGKey(cfg.seed), cfg.batch_size, dec_cfg.hidden_size
        )

    step_fn = trainer.make_train_step(
        apply_fn, tx,
        loss_type=cfg.forget_loss,
        beta=float(cfg.get("loss_beta", 1.0)),
        l1_lambda=float(cfg.get("l1_lambda", 0.0)),
        l0_lambda=float(cfg.get("l0_lambda", 0.0)),
        l_norm_from=str(cfg.get("l_norm_from", "zero")),
        loss_args=SKU_LOSS_ARGS,
        dpo_fix=bool(cfg.get("dpo_fix", False)),
        grad_accum=cfg.gradient_accumulation_steps,
        combine=combine,
    )
    keep_init = (cfg.get("l1_lambda", 0) != 0 or cfg.get("l0_lambda", 0) != 0) and cfg.get("l_norm_from") == "init"
    state = trainer.create_train_state(trainable, tx, control_vec=control_vec, keep_init=keep_init)
    state, merged_frozen, teacher_params = trainer.shard_train_state(
        state, merged_frozen, teacher_params, mesh
    )
    if mesh.shape["tensor"] > 1:
        # Megatron-style TP over the 'tensor' axis (beyond-reference)
        if not use_lora:
            state = state.replace(
                trainable=common.apply_tensor_parallel(mesh, dec_cfg, kind, state.trainable)
            )
        merged_frozen, teacher_params = common.apply_tensor_parallel(
            mesh, dec_cfg, kind, merged_frozen, teacher_params
        )
    if mesh.shape["expert"] > 1:
        # MoE expert parallelism over the 'expert' axis (beyond-reference)
        if not use_lora:
            state = state.replace(
                trainable=common.apply_expert_parallel(mesh, dec_cfg, kind, state.trainable)
            )
        merged_frozen, teacher_params = common.apply_expert_parallel(
            mesh, dec_cfg, kind, merged_frozen, teacher_params
        )
    if mesh.shape["pipe"] > 1:
        # GPipe pipeline over the 'pipe' axis (beyond-reference): stage-
        # resident layer placement for every decoder copy
        if not use_lora:
            state = state.replace(
                trainable=common.apply_pipeline_parallel(mesh, dec_cfg, kind, state.trainable)
            )
        merged_frozen, teacher_params = common.apply_pipeline_parallel(
            mesh, dec_cfg, kind, merged_frozen, teacher_params
        )

    def on_save(state_snapshot, step_i):
        # per-epoch model-only checkpoints (save_steps = steps/epoch,
        # save_only_model=True: mm/forget.py:158-160)
        if use_lora:
            snap = lora_mod.merge_model(params, state_snapshot.trainable, scale)
        else:
            from multimodal_unlearning_tpu.utils.pytree import merge_trees
            snap = state_snapshot.trainable if merged_frozen is None else merge_trees(state_snapshot.trainable, merged_frozen)
        common.save_model(save_dir / f"checkpoint-{step_i}", model_cfg, snap)

    state, history = train_loop(
        train_step=step_fn, state=state, frozen=merged_frozen,
        teacher_params=teacher_params, dataloader=loader, mesh=mesh,
        grad_accum=cfg.gradient_accumulation_steps, max_steps=max_steps,
        logging_steps=max(1, int(0.01 * max_steps)),
        on_save=on_save if cfg.get("save_ckpts") else None,
        save_steps=max(1, steps_per_epoch),
        # preemption-safe 5-epoch runs: full train state (opt moments) per
        # epoch + deterministic batch-skip resume (mm/finetune.py:126 analog)
        state_ckpt_dir=str(save_dir / "train_state"),
        ckpt_async=bool(cfg.get("ckpt_async", True)),
        ckpt_keep=int(cfg.get("ckpt_keep", 0) or 0) or None,
        resume=bool(cfg.get("resume_from_checkpoint")),
        profile_dir=str(save_dir / "profile") if cfg.get("profile") else None,
    )

    if cfg.get("save_model", True):
        if use_lora:
            # consume=True: end-of-run — stream the merge, free the int8
            # base (and the teacher aliasing it) leaf by leaf
            final = lora_mod.merge_model(
                params, state.trainable, scale, consume=True,
                out_dtype=common.parse_dtype(cfg.get("merge_dtype")))
        else:
            from multimodal_unlearning_tpu.utils.pytree import merge_trees
            final = state.trainable if merged_frozen is None else merge_trees(state.trainable, merged_frozen)
        common.save_model(save_dir, model_cfg, final)
        print(f"Saved model to {save_dir}")
    if use_lora and cfg.get("save_adapters"):
        # raw adapters alongside the merged model: the whole forget sweep
        # becomes servable through ONE multi-LoRA engine (cli/serve.py)
        from multimodal_unlearning_tpu.train.checkpoints import save_adapter

        save_adapter(save_dir / "adapter", state.trainable, scale,
                     meta={"forget_loss": str(cfg.forget_loss)})
        print(f"Saved raw LoRA adapter to {save_dir / 'adapter'}")
    return history


main = config_main(config_dir() / "mm", "forget")(run)

if __name__ == "__main__":
    main()
