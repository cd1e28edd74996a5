"""MM finetune entry point (reference: mm/finetune.py).

Plain-CE finetune on the mixed caption/QA dataset, LoRA on the decoder,
frozen vision tower, HF-layout save with LoRA merged.
"""

from __future__ import annotations

from pathlib import Path

import jax

from multimodal_unlearning_tpu.config import main as config_main, save_config
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
from multimodal_unlearning_tpu.data import DataLoader, MMMixedDataset
from multimodal_unlearning_tpu.models import lora as lora_mod
from multimodal_unlearning_tpu.train import optim, trainer
from multimodal_unlearning_tpu.train.loop import compute_steps, train_loop
from multimodal_unlearning_tpu.utils.pytree import (
    merge_trees,
    partition_tree,
    path_predicate,
    print_trainable_parameters,
)


def run(cfg):
    common.maybe_init_distributed()
    model_cfg = get_model_identifiers(cfg.model_family)
    mesh = common.build_mesh(cfg)
    dtype = common.dtype_of(cfg)
    save_dir = Path(cfg.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, save_dir / "config.yaml")

    processor = common.build_processor(model_cfg, cfg)
    dataset = MMMixedDataset(cfg.data_path, cfg.split, seed=cfg.seed)

    def collate(samples):
        return {"retain": processor.collate(samples, cfg.max_length)}

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
    remat = str(model_cfg.get("gradient_checkpointing", "false")) == "true"
    if cfg.get("remat") is not None:  # cfg override of the registry flag
        # (the reference inherits llava's gradient_checkpointing=false from
        # 80GB-GPU ZeRO runs; a 16GB v5e needs remat at 7B)
        remat = bool(cfg.remat)
    # save_attn_ffn measured fastest at the bf16 7B point (BASELINE.md)
    remat_policy = cfg.get("remat_policy") or None
    attn_impl = "auto" if str(model_cfg.get("flash_attention2", "true")) == "true" else "xla"

    # vision layers above vision_feature_layer never get grads; torch AdamW
    # skips grad=None params, so the reference never weight-decays them
    from multimodal_unlearning_tpu.models import vlm_module

    reach = (
        (lambda p: vlm_module(kind).reachable_mask(p, mcfg))
        if kind == "llava" else None
    )
    tx = optim.make_optimizer(
        cfg.get("optimizer", "adamw"), float(cfg.lr),
        weight_decay=float(cfg.get("weight_decay", 0.0)),
        warmup_steps=max(1, steps_per_epoch), total_steps=max_steps,
        max_grad_norm=common.max_grad_norm_of(cfg),
        reachable_mask=reach,
    )

    use_lora = cfg.LoRA.r != 0
    scale = lora_mod.lora_scale(cfg.LoRA.r, cfg.LoRA.alpha) if use_lora else 0.0
    combine = None
    if use_lora:
        # projector adapters default ON (reference adapts every linear except
        # lm_head, incl. multi_modal_projector: utils.py:10-19); LoRA.projector=false opts out
        adapters = lora_mod.init_model_lora(
            params, cfg.LoRA.r, jax.random.PRNGKey(cfg.seed),
            projector=bool(cfg.LoRA.get("projector", True)),
        )
        trainable, frozen_arg = adapters, params
        print_trainable_parameters(trainable, params)
        if cfg.get("quantize_base"):
            params = common.quantize_base_params(params, kind, cfg.quantize_base)
            frozen_arg = params
        apply_fn = make_apply_fn(kind, mcfg, lora_cfg=scale, remat=remat, remat_policy=remat_policy, attn_impl=attn_impl, compute_dtype=dtype, mesh=mesh, pp_microbatches=cfg.get("pp_microbatches"))
        combine = lambda tr, fr: (fr, tr)
    else:
        freeze_vision = str(cfg.get("freeze_vision_module", "true")).lower() == "true" and common.is_vlm(kind)
        if freeze_vision:
            frozen_arg, trainable = partition_tree(
                params, path_predicate(str(model_cfg.get("vision_module", "vision_tower")))
            )
        else:
            trainable, frozen_arg = params, None
        print_trainable_parameters(trainable, frozen_arg or {})
        apply_fn = make_apply_fn(kind, mcfg, remat=remat, remat_policy=remat_policy, attn_impl=attn_impl, compute_dtype=dtype, mesh=mesh, pp_microbatches=cfg.get("pp_microbatches"))

    step_fn = trainer.make_train_step(
        apply_fn, tx, loss_type="retain_ft",
        grad_accum=cfg.gradient_accumulation_steps,
        combine=combine,
    )
    state = trainer.create_train_state(trainable, tx)
    state, frozen_arg, _ = trainer.shard_train_state(state, frozen_arg, None, mesh)
    if mesh.shape["tensor"] > 1:
        dec_cfg = mcfg.decoder if common.is_vlm(kind) else mcfg
        if not use_lora:
            state = state.replace(
                trainable=common.apply_tensor_parallel(mesh, dec_cfg, kind, state.trainable)
            )
        frozen_arg = common.apply_tensor_parallel(mesh, dec_cfg, kind, frozen_arg)
    if mesh.shape["expert"] > 1:
        dec_cfg = mcfg.decoder if common.is_vlm(kind) else mcfg
        if not use_lora:
            state = state.replace(
                trainable=common.apply_expert_parallel(mesh, dec_cfg, kind, state.trainable)
            )
        frozen_arg = common.apply_expert_parallel(mesh, dec_cfg, kind, frozen_arg)
    if mesh.shape["pipe"] > 1:
        dec_cfg = mcfg.decoder if common.is_vlm(kind) else mcfg
        if not use_lora:
            state = state.replace(
                trainable=common.apply_pipeline_parallel(mesh, dec_cfg, kind, state.trainable)
            )
        frozen_arg = common.apply_pipeline_parallel(mesh, dec_cfg, kind, frozen_arg)

    state, history = train_loop(
        train_step=step_fn, state=state, frozen=frozen_arg, teacher_params=None,
        dataloader=loader, mesh=mesh, grad_accum=cfg.gradient_accumulation_steps,
        max_steps=max_steps, logging_steps=max(1, max_steps // 20),
        state_ckpt_dir=str(save_dir / "train_state"),
        ckpt_async=bool(cfg.get("ckpt_async", True)),
        ckpt_keep=int(cfg.get("ckpt_keep", 0) or 0) or None,
        save_steps=steps_per_epoch,
        resume=bool(cfg.get("resume_from_checkpoint")),
        profile_dir=str(save_dir / "profile") if cfg.get("profile") else None,
    )

    if use_lora:
        frozen_arg = None  # params kept on host for the merge below
        # consume=True: stream the dequant+fold leaf-by-leaf so the int8
        # base and its dense copy are never both resident (7B OOMs otherwise)
        final = lora_mod.merge_model(
            params, state.trainable, scale, consume=True,
            out_dtype=common.parse_dtype(cfg.get("merge_dtype")))
    else:
        final = state.trainable if frozen_arg is None else merge_trees(state.trainable, frozen_arg)
    common.save_model(save_dir, model_cfg, final)
    if use_lora and cfg.get("save_adapters"):
        from multimodal_unlearning_tpu.train.checkpoints import save_adapter

        save_adapter(save_dir / "adapter", state.trainable, scale)
        print(f"Saved raw LoRA adapter to {save_dir / 'adapter'}")
    print(f"Saved model to {save_dir}")
    return history


main = config_main(config_dir() / "mm", "finetune")(run)

if __name__ == "__main__":
    main()
