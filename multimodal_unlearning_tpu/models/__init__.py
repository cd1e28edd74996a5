from multimodal_unlearning_tpu.models import llama, llava, lora, resnet, vit

__all__ = ["llama", "llava", "lora", "resnet", "vit"]
