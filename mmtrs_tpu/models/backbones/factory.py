"""Model factory — ``create_model`` parity with the reference's thin timm
wrapper (models/vision/model_factory.py:4-22): name → backbone module with
num_classes set, drop_rate 0.2 / drop_path 0.1 defaults.

Registered names mirror the reference recipes (timm names map 1:1):
  efficientnet_b0..b5  (tf_efficientnet_bX_ns)
  convnext_tiny / convnext_small / convnext_base
  convnextv2_tiny / convnextv2_base
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from mmtrs_tpu.models.backbones import convnext as _cn
from mmtrs_tpu.models.backbones import efficientnet as _en

MODEL_REGISTRY: dict[str, dict[str, Any]] = {
    **{
        f"efficientnet_{v}": {"family": "efficientnet", "variant": v}
        for v in ("b0", "b1", "b2", "b3", "b4", "b5")
    },
    **{
        f"tf_efficientnet_{v}_ns": {"family": "efficientnet", "variant": v}
        for v in ("b0", "b1", "b2", "b3", "b4", "b5")
    },
    "convnext_tiny": {"family": "convnext", "variant": "tiny", "v2": False},
    "convnext_small": {"family": "convnext", "variant": "small", "v2": False},
    "convnext_base": {"family": "convnext", "variant": "base", "v2": False},
    "convnextv2_tiny": {"family": "convnext", "variant": "tiny", "v2": True},
    "convnextv2_base": {"family": "convnext", "variant": "base", "v2": True},
    # test/CI-only minimal backbone (see tinynet.py docstring)
    "test_cnn": {"family": "tinynet"},
}


def create_model(
    model_name: str,
    num_classes: int = 2,
    drop_rate: float = 0.2,
    drop_path: float = 0.1,
    dtype: Any = jnp.bfloat16,
    head_bias_init: float = 0.0,
):
    if model_name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model '{model_name}'; available: {sorted(MODEL_REGISTRY)}"
        )
    spec = MODEL_REGISTRY[model_name]
    if spec["family"] == "tinynet":
        from mmtrs_tpu.models.backbones.tinynet import TinyNet

        return TinyNet(
            num_classes=num_classes,
            drop_rate=drop_rate,
            dtype=dtype,
            head_bias_init=head_bias_init,
        )
    if spec["family"] == "efficientnet":
        return _en.EfficientNet(
            variant=spec["variant"],
            num_classes=num_classes,
            drop_rate=drop_rate,
            drop_path_rate=drop_path,
            dtype=dtype,
            head_bias_init=head_bias_init,
        )
    return _cn.ConvNeXt(
        variant=spec["variant"],
        v2=spec["v2"],
        num_classes=num_classes,
        drop_rate=drop_rate,
        drop_path_rate=drop_path,
        dtype=dtype,
        head_bias_init=head_bias_init,
    )


def feature_dim(model_name: str) -> int:
    spec = MODEL_REGISTRY[model_name]
    if spec["family"] == "tinynet":
        from mmtrs_tpu.models.backbones.tinynet import feature_dim as _fd

        return _fd()
    if spec["family"] == "efficientnet":
        return _en.feature_dim(spec["variant"])
    return _cn.feature_dim(spec["variant"])
