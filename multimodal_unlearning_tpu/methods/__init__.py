from multimodal_unlearning_tpu.methods import eco, salun

__all__ = ["eco", "salun"]
