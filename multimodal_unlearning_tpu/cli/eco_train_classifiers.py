"""Train ECO's learned prompt/token classifiers from an experiment corpus
(reference analog: the hub-hosted detector models consumed by
methods/eco/classifier.py:29-104; here they are trained locally so the
attack runs on zero-egress pods).

Usage:
  python -m multimodal_unlearning_tpu.cli.eco_train_classifiers \
      data_path=synthetic forget_split=forget10 retain_split=retain90 \
      out_dir=models/eco_classifiers
"""

from __future__ import annotations

from pathlib import Path

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir
from multimodal_unlearning_tpu.data.nlp import resolve_text_rows
from multimodal_unlearning_tpu.methods.eco.train_classifiers import (
    train_prompt_classifier,
    train_token_classifier,
)


def run(cfg):
    forget_rows = resolve_text_rows(cfg.data_path, cfg.get("forget_split", "forget10"))
    retain_rows = resolve_text_rows(cfg.data_path, cfg.get("retain_split", "retain90"))
    forget = [r["question"] for r in forget_rows]
    retain = [r["question"] for r in retain_rows]
    entities = sorted({r.get("name") for r in forget_rows if r.get("name")})

    out = Path(cfg.out_dir)
    p_dir = train_prompt_classifier(
        forget, retain, out / "prompt_classifier",
        epochs=int(cfg.get("epochs", 400)), seed=int(cfg.get("seed", 0)),
    )
    t_dir = train_token_classifier(
        forget + retain, entities, out / "token_classifier",
        epochs=int(cfg.get("epochs", 400)), seed=int(cfg.get("seed", 0)),
    )
    print(f"prompt classifier: {p_dir}")
    print(f"token classifier:  {t_dir}")
    return p_dir, t_dir


main = config_main(config_dir() / "methods", "eco_classifiers")(run)

if __name__ == "__main__":
    main()
