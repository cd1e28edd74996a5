"""Metrics aggregation entry point (reference: mm/calculate_metrics.py)."""

from __future__ import annotations

import json

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir
from multimodal_unlearning_tpu.evaluation import metrics


def run(cfg):
    with open(cfg.retain_result) as f:
        retain_data = json.load(f)
    with open(cfg.ckpt_result) as f:
        checkpoint_data = json.load(f)

    results = dict(
        method=cfg.method_name,
        submitted_by=cfg.submitted_by,
        **metrics.compute_model_utility(checkpoint_data),
        **metrics.evaluate_forget_quality(checkpoint_data, retain_data),
    )
    with open(cfg.save_file, "w") as f:
        json.dump(results, f, indent=4, default=float)
    print(results)
    return results


main = config_main(config_dir() / "mm", "calculate_metrics")(run)

if __name__ == "__main__":
    main()
