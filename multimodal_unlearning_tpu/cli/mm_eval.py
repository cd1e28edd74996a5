"""MM evaluation entry point (reference: mm/eval.py).

Runs the 6 zipped eval tasks: teacher-forced losses + perturbation truth
ratios + greedy generation + ROUGE → per-task JSON + eval_log_aggregated.json.
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.data import DataLoader, ImageCaptioningDataset
from multimodal_unlearning_tpu.evaluation import evaluator
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate


def get_dataloader(quest_strat, quest_key, cap_key, fold, split, bs, ds_size, collate, seed=0):
    ds = ImageCaptioningDataset(
        fold, split=split, caption_key=cap_key,
        question_strategy=quest_strat, question_key=quest_key, seed=seed,
    )
    if ds_size:
        ds.rows_ = ds.rows_[: min(ds_size, len(ds.rows_))]
    return DataLoader(ds, bs, collate, drop_last=False)


def run(cfg):
    # int8_compute is a module-global trace-time switch: restore the caller's
    # value after use (an in-process orchestrator may have enabled it globally)
    from multimodal_unlearning_tpu.models import llama

    prev = llama.INT8_COMPUTE
    try:
        return _run(cfg)
    finally:
        llama.enable_int8_compute(prev)


def _run(cfg):
    lists = [
        cfg.data_path, cfg.split_list, cfg.eval_task, cfg.question_key,
        cfg.answer_key, cfg.base_answer_key, cfg.perturbed_answer_key,
    ]
    if len({len(x) for x in lists}) != 1:
        raise ValueError("data_path, split, eval_task, question/answer keys must be the same length")
    eval_task_ids = (
        cfg.eval_task_ids if cfg.get("eval_task_ids") not in (None, "None") else list(range(len(cfg.data_path)))
    )

    model_cfg = get_model_identifiers(cfg.model_family)
    dtype = common.dtype_of(cfg)
    Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    processor = common.build_processor(model_cfg, cfg)
    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.get("seed", 42), dtype=dtype
    )
    if cfg.get("quantize_base"):
        # int8/int4 decode: greedy generation is HBM-bandwidth-bound, so
        # halving the weight bytes ≈ doubles token rate; int8_compute
        # additionally runs the frozen matmuls on the int8 MXU (quality-gated
        # — see examples/w8a8_quality_gate.py); quantize_base: int4 halves
        # the stream again (W4A16 grouped)
        params = common.quantize_base_params(params, kind, cfg.quantize_base)
        if cfg.get("int8_compute"):
            from multimodal_unlearning_tpu.models.llama import enable_int8_compute

            enable_int8_compute(True)
    mesh = common.build_mesh(cfg)
    if mesh.shape["tensor"] > 1:
        # tensor-parallel eval: decoder weights sharded, GSPMD inserts the
        # collectives under the jitted forwards/generate
        dec_cfg = mcfg.decoder if common.is_vlm(kind) else mcfg
        params = common.apply_tensor_parallel(mesh, dec_cfg, kind, params)
    if mesh.shape["expert"] > 1:
        dec_cfg = mcfg.decoder if common.is_vlm(kind) else mcfg
        params = common.apply_expert_parallel(mesh, dec_cfg, kind, params)
    vlm = common.is_vlm(kind)
    if cfg.get("reinitialize_weights"):
        # sanity-ablation fault injection (nlp/evaluate_util.py:398-407)
        import jax.random as jr
        from multimodal_unlearning_tpu.models import decoder_module, vlm_module

        init = vlm_module(kind).init_params if vlm else decoder_module(mcfg).init_params
        params = init(mcfg, jr.PRNGKey(0), dtype=dtype)

    from multimodal_unlearning_tpu.models import decoder_module, vlm_module

    fwd = vlm_module(kind).forward if vlm else decoder_module(mcfg).forward

    @jax.jit
    def model_logits(params, input_ids, attention_mask, pixel_values):
        kw = dict(attention_mask=attention_mask, compute_dtype=dtype)
        if vlm:
            kw["pixel_values"] = pixel_values
        return fwd(params, mcfg, input_ids, **kw)["logits"]

    _pad_rows, _target = common.make_tail_padder(cfg.batch_size)

    def apply_fn(batch):
        pix = batch.get("pixel_values")
        B = len(batch["input_ids"])
        to = _target(B)
        logits = model_logits(
            params,
            jnp.asarray(_pad_rows(np.asarray(batch["input_ids"]), to)),
            jnp.asarray(_pad_rows(np.asarray(batch["attention_mask"]), to)),
            None if pix is None else jnp.asarray(_pad_rows(np.asarray(pix), to)),
        )
        return {"logits": logits[:B]}

    tok = processor.tokenizer
    # int8 KV cache: halves the decode stream (models/llama.py init_kv_cache)
    cache_dtype = jnp.int8 if str(cfg.get("kv_cache_dtype") or "") == "int8" else dtype
    # head-sharded cache (TP eval): pass the mesh so the flash-decode kernel
    # runs per-shard under shard_map (ops/decode_attention.py) instead of
    # downgrading to XLA
    gen_mesh = mesh if mesh.shape["tensor"] > 1 else None
    # aot_param_layouts: compile decode with AUTO weight layouts and re-lay
    # the (int8) weights out once — kills the per-call relayout copies
    # (~1.5 GB s8 at 7B; evaluation/generate.py:_AOT_DECODE_CACHE)
    aot_layouts = bool(cfg.get("aot_param_layouts", False))
    # speculative_k > 0: prompt-lookup speculative decoding — token-identical
    # greedy output, 1..K+1 tokens per forward (evaluation/generate.py)
    speculate_k = int(cfg.get("speculative_k", 0) or 0)

    def generate_fn(batch, max_new_tokens):
        pix = batch.get("pixel_values")
        dref = batch.get("draft_ref") if speculate_k else None
        B = len(batch["input_ids"])
        to = _target(B)
        gen = greedy_generate(
            params, mcfg,
            jnp.asarray(_pad_rows(np.asarray(batch["input_ids"]), to)),
            jnp.asarray(_pad_rows(np.asarray(batch["attention_mask"]), to)),
            max_new_tokens=max_new_tokens,
            pad_token_id=tok.pad_token_id, eos_token_id=tok.eos_token_id,
            pixel_values=None if pix is None else jnp.asarray(_pad_rows(np.asarray(pix), to)),
            is_vlm=vlm, mesh=gen_mesh, aot_layouts=aot_layouts,
            cache_dtype=cache_dtype, compute_dtype=dtype,
            speculate_k=speculate_k,
            draft_ref=None if dref is None else jnp.asarray(
                _pad_rows(common.pad_width(np.asarray(dref), 64, -2), to)),
        )
        return [tok.decode(row, skip_special_tokens=True) for row in np.asarray(gen)[:B]]

    # engine_generate: run each task's generations as ONE continuous-batching
    # drain over the serving engine (evaluator._pregenerate) — slots refill
    # across batch boundaries, so eval throughput is bound by total tokens,
    # not by each batch's longest answer.  Output text identical.
    gen_engine = None
    if cfg.get("engine_generate"):
        from multimodal_unlearning_tpu.serve import ServingEngine

        slack = 2 * speculate_k + 2 if speculate_k else 0
        gen_engine = ServingEngine(
            params, mcfg, kind,
            num_slots=int(cfg.get("engine_slots", cfg.batch_size)),
            max_len=-(-(cfg.max_length + cfg.generation.max_new_tokens + slack) // 128) * 128,
            chunk=int(cfg.get("engine_chunk", 16)),
            pad_token_id=tok.pad_token_id, eos_token_id=tok.eos_token_id,
            cache_dtype=cache_dtype, compute_dtype=dtype, mesh=gen_mesh,
            speculate_k=speculate_k,
            spec_ref_len=int(cfg.get("spec_ref_len", 128) or 0) if speculate_k else 0,
            page_size=int(cfg.get("page_size", 0) or 0),
            kv_pool_pages=int(cfg.get("kv_pool_pages", 0) or 0) or None,
        )

    aggregated = {}
    zipped = zip(
        cfg.data_path, cfg.split_list, cfg.question_key, cfg.question_strategy,
        cfg.answer_key, cfg.eval_task, cfg.base_answer_key, cfg.perturbed_answer_key,
    )
    for task_idx, (fol, split, qk, qs, ak, task, base_ak, pert_ak) in enumerate(zipped):
        if task_idx not in eval_task_ids:
            continue
        print(f"Working on eval task {task} with split {split}")
        save_filename = os.path.join(cfg.save_dir, f"{task}.json")
        if os.path.exists(save_filename) and not cfg.get("overwrite", True):
            print(f"Skipping {task}: exists")
            continue

        collate_ans = partial(
            processor.collate, max_length=cfg.max_length,
            return_indices=True, return_answers=True,
        )
        collate_plain = partial(processor.collate, max_length=cfg.max_length, return_indices=True)
        small_bs = max(cfg.batch_size // 4, 1)  # perturb bs = bs//4 (mm/eval.py:237-238)
        eval_dl = get_dataloader(qs, qk, ak, fol, split, cfg.batch_size, cfg.ds_size, collate_ans)
        base_dl = get_dataloader(qs, qk, base_ak, fol, split, small_bs, cfg.ds_size, collate_plain)
        pert_dl = get_dataloader(qs, qk, pert_ak, fol, split, small_bs, cfg.ds_size, collate_plain)

        logs = evaluator.get_all_evals(
            task, eval_dl, base_dl, pert_dl,
            apply_fn=apply_fn, generate_fn=generate_fn, processor=processor,
            max_new_tokens=cfg.generation.max_new_tokens,
            generate_with_images=bool(cfg.get("generate_with_images", False)),
            gen_engine=gen_engine,
        )
        evaluator.save_eval_logs(cfg.save_dir, task, logs)
        aggregated[f"{task}.json"] = logs

    evaluator.save_aggregated(cfg.save_dir, aggregated)
    print(f"Saved aggregated eval to {cfg.save_dir}/eval_log_aggregated.json")
    return aggregated


main = config_main(config_dir() / "mm", "eval")(run)

if __name__ == "__main__":
    main()
