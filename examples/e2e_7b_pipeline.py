"""One 7B end-to-end pipeline run on the chip (VERDICT r4 ask #7 + #5).

Runs the reference's whole recipe (run_exps.py:21-55: forget -> eval; plus
the finetune that precedes it, README.md:57) at the TRUE LLaVA-7B op point
in ONE orchestrated invocation on one v5e chip:

  mm_finetune  (int8 frozen base + LoRA, memorize a small synthetic corpus)
  mm_eval      (base model -> the metrics gold/reference JSON)
  mm_forget    (NPO: co-resident int8 7B teacher, from the finetuned ckpt)
  mm_eval x3   (forgotten ckpt; speculative_k in {0, 4, 8} -> the measured
                end-to-end eval wall-clock of speculative decoding at 7B)
  mm_calculate_metrics

proving the whole pipeline (collator feed, ckpt save/load, teacher
residency, eval decode, metrics) composes at 7B — not just its isolated
benches — and converting the speculative-decode claim from a CPU forward
count into recorded on-chip seconds.

Writes <outdir>/pipeline.json with per-stage wall-clock + peak HBM.

  python examples/e2e_7b_pipeline.py [workdir] [outjson]
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = os.environ.get("MMU_E2E_FAMILY", "llava")
# small enough to memorize in ~100 steps, big enough that forget10 has rows
DATA = os.environ.get("MMU_E2E_DATA", "synthetic:n_persons=16,qa_per_person=4")
# the realistic CLEAR sample: 576 image tokens + text
MAXLEN = int(os.environ.get("MMU_E2E_MAXLEN", "768"))
EVAL_MAXLEN = int(os.environ.get("MMU_E2E_EVAL_MAXLEN", "1024"))
QUANT = os.environ.get("MMU_E2E_QUANT", "1") != "0"  # int8 base (CPU smoke: 0)


def _cfg(sub, name, **overrides):
    from multimodal_unlearning_tpu.config import load_config
    from multimodal_unlearning_tpu.config.registry import config_dir

    cfg = load_config(config_dir() / sub, name)
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        dict.__setitem__(node, parts[-1], v)
    return cfg


def peak_hbm_gb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:  # noqa: BLE001 — not all backends expose stats
        return None


def main():
    from pathlib import Path

    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_7b")
    out_json = Path(sys.argv[2] if len(sys.argv) > 2 else "examples/e2e_7b/pipeline.json")
    root.mkdir(parents=True, exist_ok=True)
    stages = {}

    progress = root / "stages.json"
    if progress.exists():  # resume: completed stages are skipped by marker
        stages.update(json.loads(progress.read_text()))

    def stage(name, fn, done=None):
        # idempotent like orchestrate/run_exps.py: a completed stage's
        # artifact (`done` path) + its recorded wall skip re-execution, so
        # a preempted pipeline run resumes at the first unfinished stage
        if name in stages and done is not None and done.exists():
            print(f"== stage {name}: skipped (artifact exists, "
                  f"{stages[name]['wall_s']}s recorded)", flush=True)
            return done
        gc.collect()
        t0 = time.perf_counter()
        result = fn()
        dt = time.perf_counter() - t0
        stages[name] = {"wall_s": round(dt, 1), "peak_hbm_gb": peak_hbm_gb()}
        progress.write_text(json.dumps(stages, indent=2))
        print(f"== stage {name}: {dt:.1f}s  peak HBM {stages[name]['peak_hbm_gb']} GB",
              flush=True)
        return result

    base = root / "base"

    def finetune():
        from multimodal_unlearning_tpu.cli import mm_finetune

        cfg = _cfg(
            "mm", "finetune",
            model_family=FAMILY, data_path=DATA, split="full+tofu",
            # micro-batch 2 is the validated 7B activation budget on one
            # 16 GB v5e (bench.py op point); accumulate to effective bs 4
            batch_size=2, gradient_accumulation_steps=2, num_epochs=4,
            max_length=MAXLEN, lr=1e-3, save_dir=str(base),
            merge_dtype="bfloat16",  # 14 GB ckpt, not 28 GB f32 (slow tunnel)
            quantize_base=QUANT, remat=QUANT, remat_policy="save_attn" if QUANT else None,
        )
        cfg["LoRA"]["r"] = 8
        mm_finetune.run(cfg)

    def evaluate(model_dir, subdir, speculative_k=0):
        from multimodal_unlearning_tpu.cli import mm_eval

        cfg = _cfg(
            "mm", "eval",
            model_family=FAMILY, model_path=str(model_dir), processor_path=None,
            save_dir=str(model_dir / subdir),
            ds_size=16, batch_size=8, max_length=EVAL_MAXLEN,
            quantize_base=QUANT, speculative_k=speculative_k,
        )
        dict.__setitem__(cfg, "data_path", [DATA] * 6)
        mm_eval.run(cfg)
        return model_dir / subdir / "eval_log_aggregated.json"

    def forget():
        from multimodal_unlearning_tpu.cli import mm_forget
        from multimodal_unlearning_tpu.models.llama import enable_int8_compute
        from multimodal_unlearning_tpu.utils.quantize import enable_int8_bwd

        cfg = _cfg(
            "mm", "forget",
            model_family=FAMILY, model_path=str(base),
            forget_data_path=DATA, retain_data_path=DATA,
            forget_split="forget10+tofu", retain_split="retain90+tofu",
            forget_loss="npo", batch_size=2, gradient_accumulation_steps=4,
            num_epochs=5, max_length=MAXLEN, lr=1e-4,
            save_dir=str(root / "npo"), merge_dtype="bfloat16",
            quantize_base=QUANT, quantize_teacher=QUANT,
            int8_compute=QUANT, int8_bwd=QUANT,
            remat=QUANT, remat_policy="save_attn" if QUANT else None,
        )
        cfg["LoRA"]["r"] = 8
        try:
            mm_forget.run(cfg)
        finally:
            enable_int8_compute(False)
            enable_int8_bwd(False)

    def metrics(ckpt_json, gold_json):
        from multimodal_unlearning_tpu.cli import mm_calculate_metrics

        cfg = _cfg(
            "mm", "calculate_metrics",
            retain_result=str(gold_json), ckpt_result=str(ckpt_json),
            method_name="npo-7b-e2e", save_file=str(root / "metrics.json"),
        )
        return mm_calculate_metrics.run(cfg)

    t_all = time.perf_counter()
    npo = root / "npo"
    stage("finetune_7b", finetune, done=base / "model.safetensors")
    gold_eval = stage("eval_base", lambda: evaluate(base, "eval_results"),
                      done=base / "eval_results" / "eval_log_aggregated.json")
    stage("forget_npo_7b", forget, done=npo / "model.safetensors")
    evals = {}
    for k in (0, 4, 8):
        sub = f"eval_spec{k}"
        evals[k] = stage(f"eval_forgotten_spec{k}",
                         lambda k=k, sub=sub: evaluate(npo, sub, speculative_k=k),
                         done=npo / sub / "eval_log_aggregated.json")
        n_rows = 6 * 16  # 6 tasks x ds_size
        stages[f"eval_forgotten_spec{k}"]["samples_per_s"] = round(
            n_rows / stages[f"eval_forgotten_spec{k}"]["wall_s"], 2)
    m = stage("calculate_metrics", lambda: metrics(evals[0], gold_eval))

    # token-identity: speculation must not change a single generated token
    def gens(p):
        agg = json.loads(Path(p).read_text())
        return {(t, i): e[1] for t in sorted(agg)
                for i, e in agg[t].get("generated_text", {}).items()}

    g0 = gens(evals[0])
    spec_identical = {}
    spec_agreement = {}
    for k in (4, 8):
        gk = gens(evals[k])
        spec_identical[k] = gk == g0
        same = sum(1 for key in g0 if gk.get(key) == g0[key])
        spec_agreement[k] = round(same / max(len(g0), 1), 4)

    payload = {
        "family": FAMILY, "data": DATA, "max_length": MAXLEN,
        "stages": stages,
        "total_wall_s": round(time.perf_counter() - t_all, 1),
        "spec_token_identical": spec_identical,
        # fraction of generations string-identical to spec0 — verification
        # accepts only the model's own argmax, so any disagreement is a
        # numeric ARGMAX TIE flipped by the verify chunk's matmul shape
        # (bf16; near-uniform logits after unlearning are maximally
        # tie-prone), not a scheduling bug
        "spec_generation_agreement": spec_agreement,
        "metrics": {k: float(v) for k, v in m.items()
                    if isinstance(v, (int, float))},
    }
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(payload, indent=2, default=float))
    print(json.dumps(payload, indent=2, default=float))


if __name__ == "__main__":
    main()
