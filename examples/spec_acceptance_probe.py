"""Speculative-decode acceptance on the eval workload shape (CPU-runnable).

Loop-attractor acceptance (tests/test_speculative.py) is easy; the claim
that matters is that prompt-lookup drafts hit on what eval ACTUALLY
generates: a finetuned captioning model answering CLEAR-style questions —
answers echo prompt entities (names, caption phrases) and real greedy
output self-repeats.  This probe finetunes the tiny LLaVA on the synthetic
corpus, then decodes held-out questions with `_spec_generate` and reports
tokens-per-forward (1.0 = no speculation benefit).

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/spec_acceptance_probe.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from multimodal_unlearning_tpu.cli import common, mm_finetune
    from multimodal_unlearning_tpu.config import load_config
    from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
    from multimodal_unlearning_tpu.data.datasets import ImageCaptioningDataset
    from multimodal_unlearning_tpu.evaluation.generate import _spec_generate, pad_prompts
    from multimodal_unlearning_tpu.models.llama import INT8_COMPUTE

    data = "synthetic:n_persons=24,qa_per_person=6"
    out = tempfile.mkdtemp(prefix="spec_probe_")
    cfg = load_config(config_dir() / "mm", "finetune")
    for k, v in {
        "model_family": "tiny-llava-test", "data_path": data, "split": "full+tofu",
        "batch_size": 4, "gradient_accumulation_steps": 1, "num_epochs": 3,
        "max_length": 128, "lr": 1e-3, "save_dir": out, "dtype": "float32",
    }.items():
        dict.__setitem__(cfg, k, v)
    dict.__setitem__(cfg["LoRA"], "r", 0)  # full finetune: the model learns to echo
    mm_finetune.run(cfg)

    model_cfg = get_model_identifiers("tiny-llava-test")
    kind, mcfg, params = common.init_or_load_params(model_cfg, out, dtype=jnp.float32)
    proc = common.build_processor(model_cfg, cfg)

    ds = ImageCaptioningDataset(data, split="forget10+tofu")
    rows = [ds[i] for i in range(min(8, len(ds)))]
    enc = [proc._encode_expand(proc.format(r["question"], None, True)) for r in rows]
    ids, mask = pad_prompts(enc, proc.tokenizer.pad_token_id, multiple=64)
    # reference corpus = the ground-truth answer's TRAINING-TIME token ids
    # (encode the full formatted text, slice off the question span) — the
    # finetuned model generates exactly these, so drafts should all accept
    refs = []
    for r in rows:
        full_ids, n_q = proc.encode_sample(
            {"question": r["question"], "answer": r["answer"], "image": r["image"]}, 128)
        refs.append(full_ids[n_q:])
    Rmax = max(len(x) for x in refs)
    ref = np.full((len(rows), Rmax), -2, np.int32)
    for i, x in enumerate(refs):
        ref[i, :len(x)] = x
    ref = jnp.asarray(ref)
    from multimodal_unlearning_tpu.data.processor import preprocess_image

    pix = jnp.asarray(np.stack(
        [preprocess_image(np.asarray(r["image"]), mcfg.vision.image_size) for r in rows]))

    max_new = 32
    for k in (4, 8):
        slack = 2 * k + 2
        toks, rounds, n_out = _spec_generate(
            params, jnp.asarray(ids), jnp.asarray(mask), pix, ref,
            model_cfg=mcfg, is_vlm=True, attn_impl="xla",
            compute_dtype=jnp.float32, cache_dtype=jnp.float32,
            smax=-(-(ids.shape[1] + max_new + slack) // 64) * 64,
            max_new_tokens=max_new, pad_token_id=proc.tokenizer.pad_token_id,
            eos=proc.tokenizer.eos_token_id or -1,
            int8_compute=INT8_COMPUTE, k_spec=k, return_stats=True)
        emitted = int(np.asarray(n_out).sum())
        # honest batch metric: the while-loop is bound by the WORST row
        print(f"k={k}: {emitted} tokens, {int(rounds)} verify forwards vs "
              f"{max_new - 1} plain decode steps "
              f"(x{(max_new - 1) / max(int(rounds), 1):.2f})", flush=True)
        sample = proc.tokenizer.decode(
            np.asarray(toks)[0], skip_special_tokens=True)
        print(f"  sample gen: {sample[:100]!r}", flush=True)


if __name__ == "__main__":
    main()
