"""Offline model quantizer (beyond-reference deployment tooling).

The reference always loads dense bf16 weights and relies on multi-GPU
DeepSpeed when they don't fit (mm/forget.py:79-115, mm/trainer.py:130-162).
Here quantization is a ONE-TIME offline step: load a dense HF-layout
checkpoint, quantize the decoder tower (int8 per-output-channel or grouped
int4 — utils/quantize.py), and write a native quantized checkpoint
(train/checkpoints.py: nibble-packed safetensors + quantize_meta.json).
Every downstream CLI (mm_eval / nlp_eval / serve / mm_forget's frozen base
or teacher) detects the quantized layout in ``model_path`` and loads the
int tree directly — a 7B deployment artifact is ~6.8 GB (int8) or ~3.4 GB
(int4) on disk and never materializes dense weights at load time.

  python -m multimodal_unlearning_tpu.cli.quantize_model \\
      model_family=llava model_path=ckpts/ft save_dir=ckpts/ft-int4 bits=int4
"""

from __future__ import annotations

import jax

from multimodal_unlearning_tpu.cli import common
from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir, get_model_identifiers
from multimodal_unlearning_tpu.train import checkpoints
from multimodal_unlearning_tpu.utils.quantize import tree_nbytes


def run(cfg):
    dtype = common.dtype_of(cfg)
    model_cfg = get_model_identifiers(cfg.model_family)
    kind, mcfg, params = common.init_or_load_params(
        model_cfg, cfg.get("model_path"), seed=cfg.get("seed", 42), dtype=dtype
    )
    dense_bytes = tree_nbytes(params)
    bits = str(cfg.get("bits", "int8"))
    params = common.quantize_base_params(params, kind, bits)
    params = jax.tree.map(lambda x: x, params)  # materialize before measuring
    quant_bytes = tree_nbytes(params)
    checkpoints.save_quantized_checkpoint(
        cfg.save_dir,
        params,
        meta={
            "bits": bits,
            "model_family": cfg.model_family,
            "dtype": str(cfg.get("dtype", "bfloat16")),
        },
    )
    print(
        f"Quantized {cfg.model_family} to {bits}: {dense_bytes / 2**30:.2f} GiB "
        f"-> {quant_bytes / 2**30:.2f} GiB "
        f"({dense_bytes / max(quant_bytes, 1):.2f}x) -> {cfg.save_dir}"
    )
    return {"dense_bytes": dense_bytes, "quant_bytes": quant_bytes}


main = config_main(config_dir(), "quantize")(run)

if __name__ == "__main__":
    main()
