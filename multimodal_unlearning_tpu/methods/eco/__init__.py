from multimodal_unlearning_tpu.methods.eco.corrupt import corrupt_methods
from multimodal_unlearning_tpu.methods.eco.attacked_model import AttackedModel, get_eco_model

__all__ = ["corrupt_methods", "AttackedModel", "get_eco_model"]
