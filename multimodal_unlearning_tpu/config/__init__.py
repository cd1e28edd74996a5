from multimodal_unlearning_tpu.config.loader import (
    Config,
    load_config,
    main,
    save_config,
)
from multimodal_unlearning_tpu.config.registry import get_model_identifiers

__all__ = ["Config", "load_config", "save_config", "main", "get_model_identifiers"]
