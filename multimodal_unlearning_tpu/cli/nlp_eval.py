"""NLP evaluation entry point (reference: nlp/evaluate_util.py).

4 zipped eval tasks over TOFU-style splits; the per-task engine
(teacher-forced losses, perturbation truth ratios, greedy generation with
reference-exact prompt/ground-truth recovery, ROUGE, normalized gt loss)
lives in ``evaluation.evaluator.nlp_get_all_evals`` — this entry wires data
loaders, padding, decode options and the aggregated JSON around it.
Weight-reinit ablation flag (nlp/evaluate_util.py:398-407) supported.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.data.loader import DataLoader
from multimodal_unlearning_tpu.data.nlp import TextDatasetQA, eval_collator
from multimodal_unlearning_tpu.evaluation import evaluator
from multimodal_unlearning_tpu.evaluation.generate import greedy_generate


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
    common.maybe_init_distributed()
    model_cfg = get_model_identifiers(cfg.model_family)
    dtype = common.dtype_of(cfg)
    Path(cfg.save_dir).mkdir(parents=True, exist_ok=True)
    processor = common.build_processor(model_cfg, cfg)
    tok = processor.tokenizer
    tags = {
        "question_start_tag": model_cfg.get("question_start_tag", ""),
        "question_end_tag": model_cfg.get("question_end_tag", ""),
        "answer_tag": model_cfg.get("answer_tag", ""),
    }
    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.get("seed", 42), dtype=dtype
    )
    if cfg.get("quantize_base"):
        # int8/int4 decode (~2x/4x lighter weight stream; see cli/mm_eval.py)
        params = common.quantize_base_params(params, kind, cfg.quantize_base)
        if cfg.get("int8_compute"):
            from multimodal_unlearning_tpu.models.llama import enable_int8_compute

            enable_int8_compute(True)
    mesh = common.build_mesh(cfg)
    if mesh.shape["tensor"] > 1:
        params = common.apply_tensor_parallel(mesh, mcfg, kind, params)
    if mesh.shape["expert"] > 1:
        params = common.apply_expert_parallel(mesh, mcfg, kind, params)
    from multimodal_unlearning_tpu.models import decoder_module

    dec = decoder_module(mcfg)
    if cfg.get("reinitialize_weights"):
        params = dec.init_params(mcfg, jax.random.PRNGKey(0), dtype=dtype)

    @jax.jit
    def model_logits(input_ids, attention_mask):
        return dec.forward(
            params, mcfg, input_ids, attention_mask=attention_mask, compute_dtype=dtype
        )["logits"]

    _pad_rows, _target = common.make_tail_padder(cfg.batch_size)

    def apply_fn(batch):
        B = len(batch["input_ids"])
        to = _target(B)
        logits = model_logits(
            jnp.asarray(_pad_rows(np.asarray(batch["input_ids"]), to)),
            jnp.asarray(_pad_rows(np.asarray(batch["attention_mask"]), to)),
        )
        return {"logits": logits[:B]}

    cache_dtype = jnp.int8 if str(cfg.get("kv_cache_dtype") or "") == "int8" else dtype
    gen_mesh = mesh if mesh.shape["tensor"] > 1 else None  # see mm_eval
    aot_layouts = bool(cfg.get("aot_param_layouts", False))  # see mm_eval

    # engine_generate: generations as one continuous-batching drain per task
    # (evaluator._nlp_pregenerate) — identical text, see cli/mm_eval.py
    gen_engine = None
    if cfg.get("engine_generate"):
        from multimodal_unlearning_tpu.serve import ServingEngine

        spec_k = int(cfg.get("speculative_k", 0) or 0)
        slack = 2 * spec_k + 2 if spec_k else 0
        gen_engine = ServingEngine(
            params, mcfg, kind,
            num_slots=int(cfg.get("engine_slots", cfg.batch_size)),
            max_len=-(-(cfg.max_length + cfg.generation.max_new_tokens + slack) // 128) * 128,
            chunk=int(cfg.get("engine_chunk", 16)),
            pad_token_id=tok.pad_token_id, eos_token_id=tok.eos_token_id,
            cache_dtype=cache_dtype, compute_dtype=dtype, mesh=gen_mesh,
            speculate_k=spec_k,
            spec_ref_len=int(cfg.get("spec_ref_len", 128) or 0) if spec_k else 0,
            page_size=int(cfg.get("page_size", 0) or 0),
            kv_pool_pages=int(cfg.get("kv_pool_pages", 0) or 0) or None,
        )

    aggregated = {}
    zipped = zip(
        cfg.data_path, cfg.split_list, cfg.question_key, cfg.answer_key,
        cfg.eval_task, cfg.base_answer_key, cfg.perturbed_answer_key,
    )
    for fol, split, qk, ak, task, base_ak, pert_ak in zipped:
        print(f"Working on eval task {task} with split {split}")
        save_filename = os.path.join(cfg.save_dir, f"{task}.json")
        if os.path.exists(save_filename) and not cfg.get("overwrite", True):
            continue

        def mk_loader(answer_key, bs):
            ds = TextDatasetQA(
                fol, tok, tags, max_length=cfg.max_length, split=split,
                question_key=qk, answer_key=answer_key,
            )
            if cfg.ds_size:
                ds.rows_ = ds.rows_[: min(cfg.ds_size, len(ds.rows_))]
            return DataLoader(ds, bs, eval_collator, drop_last=False)

        eval_dl = mk_loader(ak, cfg.batch_size)
        base_dl = mk_loader(base_ak, max(cfg.batch_size // 4, 1))
        pert_dl = mk_loader(pert_ak, max(cfg.batch_size // 4, 1))

        def generate_fn(q_texts, ref_texts=None):
            from multimodal_unlearning_tpu.evaluation.generate import pad_prompts

            spec_k = int(cfg.get("speculative_k", 0) or 0)
            q_enc = [tok.encode(q, add_special_tokens=True) for q in q_texts]
            ids, mask = pad_prompts(q_enc, tok.pad_token_id)
            B_gen = len(ids)
            ids = _pad_rows(ids, _target(B_gen))
            mask = _pad_rows(mask, _target(B_gen))
            dref = None
            if spec_k and ref_texts is not None:
                # ground-truth answers seed the lookup corpus (-2 padding);
                # drafts are verified, output stays exactly greedy
                enc = [tok.encode(r, add_special_tokens=False) for r in ref_texts]
                R = -(-max((len(e) for e in enc), default=0) // 64) * 64
                if R:
                    dref = np.full((len(enc), R), -2, np.int32)
                    for i, e in enumerate(enc):
                        dref[i, :len(e)] = e
                    dref = jnp.asarray(_pad_rows(dref, _target(B_gen)))
            gen = greedy_generate(
                params, mcfg, jnp.asarray(ids), jnp.asarray(mask),
                max_new_tokens=cfg.generation.max_new_tokens,
                pad_token_id=tok.pad_token_id, eos_token_id=tok.eos_token_id,
                cache_dtype=cache_dtype, compute_dtype=dtype,
                mesh=gen_mesh, aot_layouts=aot_layouts,
                speculate_k=spec_k, draft_ref=dref,
            )
            return [tok.decode(row, skip_special_tokens=True) for row in np.asarray(gen)[:B_gen]]

        logs = evaluator.nlp_get_all_evals(
            task, eval_dl, base_dl, pert_dl,
            apply_fn=apply_fn, generate_fn=generate_fn, tok=tok, tags=tags,
            gen_engine=gen_engine,
            max_new_tokens=int(cfg.generation.max_new_tokens),
        )

        evaluator.save_eval_logs(cfg.save_dir, task, logs)
        aggregated[f"{task}.json"] = logs

    evaluator.save_aggregated(cfg.save_dir, aggregated)
    print(f"Saved aggregated eval to {cfg.save_dir}/eval_log_aggregated.json")
    return aggregated


main = config_main(config_dir() / "nlp", "eval_everything")(run)

if __name__ == "__main__":
    main()
