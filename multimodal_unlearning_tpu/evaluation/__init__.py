from multimodal_unlearning_tpu.evaluation import evaluator, generate, metrics

__all__ = ["evaluator", "generate", "metrics"]
