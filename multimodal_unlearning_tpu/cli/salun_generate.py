"""SalUn mask-generation entry point (reference: methods/salun/generate_mask.py).

Accumulates |∇θ| of forget-set CE over the decoder and writes binary
top-fraction masks ``with_{0.1..1.0}.npz`` into save_dir.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.data.loader import DataLoader
from multimodal_unlearning_tpu.data.nlp import TextForgetDatasetQA, text_collator
from multimodal_unlearning_tpu.methods import salun
from multimodal_unlearning_tpu.train.losses import ce_loss


def run(cfg):
    model_cfg = get_model_identifiers(cfg.model_family)
    dtype = common.dtype_of(cfg)
    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.seed, dtype=dtype
    )
    processor = common.build_processor(model_cfg, cfg)
    tags = {
        "question_start_tag": model_cfg.get("question_start_tag", ""),
        "question_end_tag": model_cfg.get("question_end_tag", ""),
        "answer_tag": model_cfg.get("answer_tag", ""),
    }
    ds = TextForgetDatasetQA(
        cfg.data_path, processor.tokenizer, tags,
        max_length=cfg.max_length, split=cfg.split, loss_type="grad_ascent", seed=cfg.seed,
    )
    loader = DataLoader(ds, cfg.batch_size, text_collator, shuffle=True, seed=cfg.seed)
    from multimodal_unlearning_tpu.models import decoder_module

    fwd = llava.forward if kind == "llava" else decoder_module(mcfg).forward

    @jax.jit
    def grad_fn(p, input_ids, labels, attention_mask):
        def loss(p):
            out = fwd(p, mcfg, input_ids, attention_mask=attention_mask, compute_dtype=dtype)
            return ce_loss(out["logits"], labels)

        return jax.grad(loss)(p)

    batches = []
    for i, batch in enumerate(loader):
        if i >= cfg.num_batches:
            break
        batches.append(batch["forget"])

    sal = salun.accumulate_saliency(
        lambda p, b: grad_fn(
            p, jnp.asarray(b["input_ids"]), jnp.asarray(b["labels"]), jnp.asarray(b["attention_mask"])
        ),
        params, batches,
    )
    masks = salun.masks_for_thresholds(sal)
    salun.save_masks(masks, cfg.save_dir)
    print(f"Saved {len(masks)} SalUn masks to {cfg.save_dir}")
    return list(masks.keys())


main = config_main(config_dir() / "methods", "salun")(run)

if __name__ == "__main__":
    main()
