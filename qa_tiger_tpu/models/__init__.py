from qa_tiger_tpu.models.registry import build_model, MODEL_REGISTRY

__all__ = ["build_model", "MODEL_REGISTRY"]
