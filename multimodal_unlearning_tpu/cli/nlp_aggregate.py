"""NLP aggregation entry point (reference: nlp/aggregate_eval_stat.py):
Model Utility + Forget Quality → one CSV row."""

from __future__ import annotations

import csv
import json

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir
from multimodal_unlearning_tpu.evaluation import metrics


def run(cfg):
    with open(cfg.retain_result) as f:
        retain = json.load(f)
    with open(cfg.ckpt_result) as f:
        ckpt = json.load(f)
    for excluded in cfg.get("excluded_eval_files", []) or []:
        retain.pop(excluded, None)
        ckpt.pop(excluded, None)

    # the reference CLI's own MU variant (nlp/aggregate_eval_stat.py:40-91),
    # NOT the shared TOFU copy — see metrics.nlp_get_model_utility
    utility = metrics.nlp_get_model_utility(ckpt)
    quality = metrics.get_forget_quality(ckpt, retain)
    # row shape = reference main (aggregate_eval_stat.py:109-117): utility
    # keys, then Forget Quality, Method, Submitted By
    row = {**utility, "Forget Quality": quality["Forget Quality"],
           "Method": cfg.method_name, "Submitted By": cfg.submitted_by}

    with open(cfg.save_file, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        w.writeheader()
        w.writerow({k: float(v) if hasattr(v, "item") else v for k, v in row.items()})
    print(row)
    return row


main = config_main(config_dir() / "nlp", "aggregate_eval_stat")(run)

if __name__ == "__main__":
    main()
