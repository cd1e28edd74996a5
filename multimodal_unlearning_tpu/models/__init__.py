from multimodal_unlearning_tpu.models import (
    gpt_decoder,
    llama,
    llava,
    lora,
    qwen2_vl,
    resnet,
    vit,
)

__all__ = [
    "gpt_decoder", "llama", "llava", "lora", "qwen2_vl", "resnet", "vit",
    "decoder_module", "decoder_config",
]


VLM_KINDS = ("llava", "qwen2_vl")


def vlm_module(kind_or_cfg):
    """VLM assembly module for a registry ``arch.kind`` or a built Config."""
    if isinstance(kind_or_cfg, qwen2_vl.QwenVLConfig) or kind_or_cfg == "qwen2_vl":
        return qwen2_vl
    return llava


def decoder_module(cfg_or_name):
    """Decoder module for a registry ``arch.decoder`` name or a built Config.

    llama-family archs (llama/mistral/qwen text towers) use models.llama;
    neox/phi/stablelm use models.gpt_decoder. Both expose the same API:
    Config.from_registry / init_params / forward / init_kv_cache.
    """
    if isinstance(cfg_or_name, gpt_decoder.GptConfig):
        return gpt_decoder
    if isinstance(cfg_or_name, str) and cfg_or_name in gpt_decoder.PRESETS:
        return gpt_decoder
    return llama


def decoder_config(arch):
    """Build the right decoder Config dataclass from a registry arch block."""
    name = str(arch.get("decoder", "llama"))
    if name in gpt_decoder.PRESETS:
        return gpt_decoder.GptConfig.from_registry(arch)
    return llama.LlamaConfig.from_registry(arch)
