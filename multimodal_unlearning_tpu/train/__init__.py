from multimodal_unlearning_tpu.train import losses, optim, trainer

__all__ = ["losses", "optim", "trainer"]
