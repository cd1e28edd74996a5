from multimodal_unlearning_tpu.ops.attention import flash_attention, mha_reference
from multimodal_unlearning_tpu.ops.rope import apply_rope, rope_table

__all__ = ["flash_attention", "mha_reference", "apply_rope", "rope_table"]
