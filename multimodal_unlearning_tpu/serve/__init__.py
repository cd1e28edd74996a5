from multimodal_unlearning_tpu.serve.engine import Request, ServingEngine
from multimodal_unlearning_tpu.serve.http import EngineServer

__all__ = ["EngineServer", "Request", "ServingEngine"]
