"""Model registry lookup (reference: utils.py:40-54).

The registry YAML lives at ``<repo>/configs/model_config.yaml`` and carries
both the reference's key surface (prompt tags, flash_attention2, ...) and an
``arch`` block that fully specifies each architecture, so that models are
constructible with zero hub access.
"""

from __future__ import annotations

import os
from pathlib import Path

from multimodal_unlearning_tpu.config.loader import Config, load_config

_REPO_ROOT = Path(__file__).resolve().parents[2]


def config_dir() -> Path:
    """Experiment-config root; overridable via ``MMU_CONFIG_DIR``."""
    return Path(os.environ.get("MMU_CONFIG_DIR", _REPO_ROOT / "configs"))


def get_model_identifiers(model_family: str) -> Config:
    registry = load_config(config_dir(), "model_config")
    if model_family not in registry:
        raise KeyError(
            f"Unknown model family {model_family!r}; known: {sorted(dict.keys(registry))}"
        )
    return registry[model_family]
