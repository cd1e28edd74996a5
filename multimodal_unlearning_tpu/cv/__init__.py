from multimodal_unlearning_tpu.cv import attack, data, score, train, unlearn

__all__ = ["attack", "data", "score", "train", "unlearn"]
