"""ECO prompt preparation entry point (reference:
methods/eco/prepare_eco_prompts.py + methods/eco/main.py).

Builds the corrupted model from the registry + eco config, generates
answers over the forget split, writes the eco_ft dataset.
"""

from __future__ import annotations

import jax.numpy as jnp

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.data.nlp import resolve_text_rows
from multimodal_unlearning_tpu.methods.eco import get_eco_model
from multimodal_unlearning_tpu.methods.eco.prepare_prompts import prepare_eco_prompts


def run(cfg):
    model_cfg = get_model_identifiers(cfg.model_family)
    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), dtype=jnp.float32
    )
    processor = common.build_processor(model_cfg, cfg)
    tok = processor.tokenizer
    tags = {
        "question_start_tag": model_cfg.get("question_start_tag", ""),
        "question_end_tag": model_cfg.get("question_end_tag", ""),
        "answer_tag": model_cfg.get("answer_tag", ""),
    }
    forget_rows = resolve_text_rows(cfg.data_path, cfg.split)
    entities = sorted({r.get("name") for r in forget_rows if r.get("name")})
    eco = get_eco_model(
        params, mcfg, tok,
        forget_prompts=[r["question"] for r in forget_rows],
        entities=entities,
        corrupt_method=cfg.get("corrupt_method", "zero_out_top_k"),
        dims=int(cfg.get("corrupt_args", {}).get("dims", 1000)),
        threshold=float(cfg.get("prompt_threshold", 0.999)),
        prompt_classifier_path=cfg.get("prompt_classifier_path"),
        token_classifier_path=cfg.get("token_classifier_path"),
    )
    rows = prepare_eco_prompts(
        eco, tok, tags, cfg.data_path, cfg.split, cfg.out_dir,
        max_new_tokens=int(cfg.get("max_new_tokens", 32)),
        batch_size=int(cfg.get("batch_size", 8)),
    )
    print(f"Wrote {len(rows)} eco prompts to {cfg.out_dir}")
    return rows


main = config_main(config_dir() / "methods", "eco_llama2-7b")(run)

if __name__ == "__main__":
    main()
