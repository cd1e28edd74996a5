"""Eval-generation throughput: bf16 vs int8-weight decode on the 7B.

Greedy KV-cache decode is HBM-bandwidth-bound (each new token re-reads every
decoder weight), so int8 storage (quantize_base in mm_eval/nlp_eval) halves
the bytes per step.  This measures the reference eval operating point
(config/mm/eval.yaml:32-43: bs 8, ~704-token prompt incl. 576 image tokens,
300 new tokens, greedy) on LLaVA-1.5-7B, one v5e chip.

At 7B/bs8 the bf16 variant does NOT FIT one 16 GB v5e (13.5 GB weights +
4.3 GB KV cache) — int8 weights are what make single-chip 7B batch decode
possible at all; run family qwen-vl2-2b for a clean bf16-vs-int8 ratio.

Usage: python examples/decode_bench.py [family] [bf16|int8|w8a8|w8a8c|w4a16|w4a16c ...]
(suffixes: +aot AOT-layout compile, +spec<K> prompt-lookup speculation;
w4a16* = grouped-int4 weights — half the int8 stream again — run in a
separate invocation from int8 variants: quantization is in-place)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = sys.argv[1:]
    family = args.pop(0) if args and not args[0].startswith(("bf", "int", "w4", "w8")) else "llava"
    variants = args or ["bf16", "int8", "w8a8", "w8a8c"]

    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate
    from multimodal_unlearning_tpu.models import vlm_module
    from multimodal_unlearning_tpu.models.llama import enable_int8_compute
    from multimodal_unlearning_tpu.utils.quantize import quantize_tree_inplace

    model_cfg = get_model_identifiers(family)
    mcfg = build_model_config(model_cfg)
    dtype = jnp.bfloat16

    B = int(os.environ.get("DECODE_BS", "8"))
    NEW = int(os.environ.get("DECODE_NEW", "300"))
    n_img = mcfg.num_image_tokens
    S = max(704, -(-(n_img + 128) // 128) * 128)  # image tokens + question
    S = int(os.environ.get("DECODE_PROMPT", S))  # long-context override
    img = mcfg.vision.image_size

    kind = model_cfg["arch"]["kind"]
    params = vlm_module(kind).init_params(mcfg, jax.random.PRNGKey(0), dtype=dtype)

    rng = np.random.default_rng(0)
    ids = rng.integers(10, mcfg.decoder.vocab_size - 70, (B, S))
    if kind == "qwen2_vl":
        g = img // mcfg.vision.patch_size
        ids[:, 0] = mcfg.vision_start_token_id
        ids[:, 1:1 + n_img] = mcfg.image_token_id
        ids[:, 1 + n_img] = mcfg.vision_end_token_id
        pixel_values = jnp.asarray(
            rng.normal(size=(B, g * g, mcfg.vision.patch_dim)), dtype)
    else:
        ids[:, :n_img] = mcfg.image_token_id
        pixel_values = jnp.asarray(rng.normal(size=(B, img, img, 3)), dtype)
    input_ids = jnp.asarray(ids, jnp.int32)
    attention_mask = jnp.ones((B, S), jnp.int32)

    quantized = 0  # bits of the in-place quantization, once applied
    for name in variants:
        # trailing "+aot": AUTO-layout AOT compile — weights device_put into
        # the executable's preferred formats once (no per-call relayout)
        # trailing "+spec<K>": prompt-lookup speculative decode, K drafts
        aot = name.endswith("+aot")
        base_name = name[:-4] if aot else name
        spec_k = 0
        if "+spec" in base_name:
            base_name, _, ks = base_name.partition("+spec")
            spec_k = int(ks or 8)
        want_bits = {"int8": 8, "w8a8": 8, "w8a8c": 8, "w4a16": 4, "w4a16c": 4}.get(base_name, 0)
        if want_bits:
            if quantized and quantized != want_bits:
                # the in-place quantization is destructive — int8 and int4
                # variants need separate invocations
                print(f"{name:12s} SKIPPED: run int{want_bits} variants in their own invocation")
                continue
            if not quantized:
                quantize_tree_inplace(params["language_model"], bits=want_bits)
                quantized = want_bits
        enable_int8_compute(base_name in ("w8a8", "w8a8c"))
        cache_dtype = jnp.int8 if base_name in ("w8a8c", "w4a16c") else dtype

        def gen():
            return greedy_generate(
                params, mcfg, input_ids, attention_mask,
                max_new_tokens=NEW, pad_token_id=0, eos_token_id=None,
                pixel_values=pixel_values, is_vlm=True,
                cache_dtype=cache_dtype, compute_dtype=dtype,
                aot_layouts=aot, speculate_k=spec_k,
            )

        try:
            t0 = time.perf_counter()
            out = gen()
            int(np.asarray(out)[0, -1])  # value-fetch sync
            compile_s = time.perf_counter() - t0

            n = 3
            t0 = time.perf_counter()
            for _ in range(n):
                out = gen()
            int(np.asarray(out)[0, -1])
            dt = (time.perf_counter() - t0) / n
            extra = ""
            if spec_k:
                from multimodal_unlearning_tpu.evaluation.generate import _spec_generate
                from multimodal_unlearning_tpu.models.llama import INT8_COMPUTE

                slack = 2 * spec_k + 2
                _, rounds, n_out = _spec_generate(
                    params, input_ids, attention_mask, pixel_values,
                    jnp.zeros((B, 0), jnp.int32),
                    model_cfg=mcfg, is_vlm=True, attn_impl="auto",
                    compute_dtype=dtype, cache_dtype=cache_dtype,
                    smax=-(-(S + NEW + slack) // 128) * 128,
                    max_new_tokens=NEW, pad_token_id=0, eos=-1,
                    int8_compute=INT8_COMPUTE, k_spec=spec_k,
                    return_stats=True)
                # honest batch metric: the loop is bound by the WORST row —
                # plain greedy needs NEW-1 decode steps, speculation `rounds`
                extra = (f"  verify-rounds={int(rounds)} vs {NEW - 1} plain "
                         f"(x{(NEW - 1) / max(int(rounds), 1):.2f} steps)")
            print(
                f"{name:12s} {dt:6.2f} s/batch  {B / dt:5.2f} samples/s  "
                f"{B * NEW / dt:6.0f} tok/s  (compile {compile_s:.0f}s){extra}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — e.g. bf16 7B OOMs one chip
            text = str(e)
            msg = text.split("\n")[0][:140]
            print(f"{name:6s} FAILED: {msg}", flush=True)
            # surface the server-side HBM breakdown on compile-time OOMs
            for line in text.split("\n"):
                if any(k in line for k in ("Ran out of memory", "hbm", "Largest")):
                    print("   ", line.strip()[:160], flush=True)
            # full error text for offline triage (truncated messages hide
            # whether an OOM is HBM vs Mosaic VMEM/scratch)
            with open(f"/tmp/decode_bench_{name}_error.txt", "w") as f:
                f.write(text)
            print(f"    full error -> /tmp/decode_bench_{name}_error.txt", flush=True)
    enable_int8_compute(False)


if __name__ == "__main__":
    main()
