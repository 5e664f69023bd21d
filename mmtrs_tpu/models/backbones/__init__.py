from mmtrs_tpu.models.backbones.factory import create_model, MODEL_REGISTRY

__all__ = ["create_model", "MODEL_REGISTRY"]
