"""ConvNeXt / ConvNeXtV2 in Flax linen.

Functional replacement for the timm `convnext_tiny` / `convnextv2_base`
backbones the reference uses (run_train_images.py:27 soft stream default;
train_hard_kfold_v2.py:200). V2 swaps LayerScale for GRN (global response
normalization) per the ConvNeXtV2 paper. NHWC, bf16 compute, f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrs_tpu.models.backbones.efficientnet import DropPath

_CONFIGS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x.astype(jnp.float32)).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float
    v2: bool
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Conv(self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h)
        if self.v2:
            h = GRN(4 * self.dim, name="grn")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        if not self.v2:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
            )
            h = h * gamma.astype(h.dtype)
        h = DropPath(self.drop_path, name="drop_path")(h, deterministic=not train)
        return x + h


class ConvNeXt(nn.Module):
    variant: str = "tiny"
    v2: bool = False
    num_classes: int = 0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    head_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = _CONFIGS[self.variant]
        x = x.astype(self.dtype)

        x = nn.Conv(dims[0], (4, 4), strides=4, dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)

        total = sum(depths)
        bidx = 0
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            if si > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"down{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=2, dtype=self.dtype, name=f"down{si}_conv")(x)
            for j in range(depth):
                dp = self.drop_path_rate * bidx / max(total - 1, 1)
                x = ConvNeXtBlock(
                    dim=dim, drop_path=dp, v2=self.v2, dtype=self.dtype,
                    name=f"stage{si}_block{j}",
                )(x, train)
                bidx += 1

        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        x = nn.LayerNorm(epsilon=1e-6, name="head_norm")(x)
        if self.num_classes == 0:
            return x
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(
            self.num_classes,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.full(
                shape, self.head_bias_init, dtype
            ),
            name="classifier",
        )(x)


def feature_dim(variant: str) -> int:
    return _CONFIGS[variant][1][-1]
