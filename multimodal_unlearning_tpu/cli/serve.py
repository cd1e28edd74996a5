"""Offline serving entry point (beyond-reference).

Drains a JSONL request file through the continuous-batching engine
(serve/engine.py) and writes one completion per line.  The reference has
no serving surface — its checkpoints are consumed through per-batch HF
``generate`` calls inside the eval loop (mm/eval.py:126-133); this CLI is
the production-shaped equivalent: admit requests as slots free up, retire
each the step it finishes.

Request lines: {"question": str, "image": optional path or null,
"max_new_tokens": optional int}.  Questions are formatted through the
model family's chat template exactly like training/eval samples.

  python -m multimodal_unlearning_tpu.cli.serve \\
      model_family=llava model_path=... requests=reqs.jsonl save_file=out.jsonl
"""

from __future__ import annotations

import json
import time

import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers


def build_engine(cfg):
    """Engine + processor + kind/mcfg from a serve config (shared with
    cli/serve_http.py)."""
    dtype = common.dtype_of(cfg)
    model_cfg = get_model_identifiers(cfg.model_family)
    processor = common.build_processor(model_cfg, cfg)
    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.get("seed", 42), dtype=dtype
    )
    if cfg.get("quantize_base", False):
        params = common.quantize_base_params(params, kind, cfg.quantize_base)

    from multimodal_unlearning_tpu.serve import ServingEngine

    tok = processor.tokenizer
    cache_dtype = jnp.int8 if str(cfg.get("kv_cache_dtype") or "") == "int8" else dtype
    # multi-LoRA: {name: dir-with-adapter.safetensors} -> one engine serves
    # every sweep variant; requests pick theirs via an "adapter" field
    adapters = None
    if cfg.get("adapters"):
        from multimodal_unlearning_tpu.train.checkpoints import load_adapter

        adapters = {name: load_adapter(path)
                    for name, path in dict(cfg.adapters).items()}
    engine = ServingEngine(
        params, mcfg, kind,
        num_slots=int(cfg.get("num_slots", 8)),
        max_len=int(cfg.get("max_length", 2048)),
        chunk=int(cfg.get("chunk", 16)),
        pad_token_id=tok.pad_token_id,
        eos_token_id=tok.eos_token_id,
        cache_dtype=cache_dtype, compute_dtype=dtype,
        speculate_k=int(cfg.get("speculative_k", 0) or 0),
        spec_ref_len=int(cfg.get("spec_ref_len", 128) or 0),
        temperature=float(cfg.get("temperature", 0.0) or 0.0),
        top_k=int(cfg.get("top_k", 0) or 0),
        top_p=float(cfg.get("top_p", 1.0) or 1.0),
        adapters=adapters,
        prefill_chunk=int(cfg.get("prefill_chunk", 0) or 0),
        page_size=int(cfg.get("page_size", 0) or 0),
        kv_pool_pages=int(cfg.get("kv_pool_pages", 0) or 0) or None,
        logprobs=bool(cfg.get("logprobs", False)),
    )
    return engine, processor, kind, mcfg


def run(cfg):
    engine, processor, kind, mcfg = build_engine(cfg)

    from multimodal_unlearning_tpu.data.processor import preprocess_image

    tok = processor.tokenizer
    # shared system prompt -> prefix cache: prefilled once, every text-only
    # request prefills just its own (template-formatted) suffix
    prefix_id = None
    if cfg.get("system_prompt"):
        prefix_id = engine.register_prefix(
            tok.encode(str(cfg.system_prompt), add_special_tokens=True))

    default_new = int(cfg.generation.max_new_tokens)
    reqs, texts, stop_strs = [], [], []
    with open(cfg.requests) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            has_image = r.get("image") is not None and common.is_vlm(kind)
            ids = processor._encode_expand(
                processor.format(r["question"], None, has_image))
            pid = prefix_id if not has_image else None  # image prompts prefill whole
            pix = None
            if has_image:
                from PIL import Image

                img = r["image"]
                arr = np.asarray(Image.open(img).convert("RGB")) if isinstance(img, str) else np.asarray(img)
                pix = preprocess_image(arr, mcfg.vision.image_size).astype(np.float32)
            # optional "draft": expected-answer text seeding the speculative
            # lookup corpus (e.g. a cached prior completion) — output stays
            # exactly greedy either way
            dref = tok.encode(r["draft"]) if r.get("draft") else None
            # "stop": string or list of strings — matched at TEXT level
            # (token-id matching would miss BPE boundary merges)
            stops = r.get("stop") or []
            stop_strs.append([stops] if isinstance(stops, str) else list(stops))
            reqs.append(engine.submit(
                ids, int(r.get("max_new_tokens", default_new)),
                pixel_values=pix, draft_ref=dref,
                sample_seed=r.get("sample_seed"), prefix=pid,
                adapter=r.get("adapter")))
            texts.append(r["question"])

    t0 = time.perf_counter()
    cut_text: list[str | None] = [None] * len(reqs)
    while not all(r.done for r in reqs):
        engine.step()
        for i, req in enumerate(reqs):
            if req.done or not stop_strs[i] or cut_text[i] is not None:
                continue
            text = tok.decode(req.tokens, skip_special_tokens=True)
            cuts = [text.find(s) for s in stop_strs[i] if s in text]
            if cuts:
                cut_text[i] = text[: min(cuts)]
                engine.cancel(req)
    outs = [r.tokens for r in reqs]
    dt = time.perf_counter() - t0

    results = []
    with open(cfg.save_file, "w") as f:
        for i, (question, req, toks) in enumerate(zip(texts, reqs, outs)):
            completion = (cut_text[i] if cut_text[i] is not None
                          else tok.decode(toks, skip_special_tokens=True))
            # a stop can land inside the final chunk after natural finish
            late = [completion.find(s) for s in stop_strs[i] if s in completion]
            if late:
                completion = completion[: min(late)]
            row = {
                "question": question,
                "completion": completion,
                "tokens": len(toks),
            }
            if engine.want_lp:
                row["logprobs"] = [round(x, 6) for x in req.logprobs]
            results.append(row)
            f.write(json.dumps(row) + "\n")
    n_tok = sum(len(t) for t in outs)
    st = engine.stats()
    print(f"served {len(reqs)} requests, {n_tok} tokens in {dt:.1f}s "
          f"({n_tok / max(dt, 1e-9):.1f} tok/s; {st['dispatches']} dispatches, "
          f"{st['tokens_per_round']:.2f} tok/round) -> {cfg.save_file}")
    return results


main = config_main(config_dir() / "mm", "serve")(run)

if __name__ == "__main__":
    main()
