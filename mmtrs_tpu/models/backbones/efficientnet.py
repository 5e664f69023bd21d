"""EfficientNet B0–B5 in Flax linen, TPU-first.

Functional replacement for the timm backbones the reference trains
(`tf_efficientnet_b0..b5_ns` — model_factory.py:4-22, train_hard.py:155,
train_hard_v2.py:174, train_mil_attention_v1.py:136, mm trainer :375).
Channels-last NHWC layout (native for TPU convolutions), bf16 activations
with f32 parameters/batch-stats, stochastic depth (drop-path), and SE blocks
expressed as 1×1 convs so everything lands on the MXU.

Pretrained ImageNet weights are not available in this offline environment;
`head-bias to class prior` init (train_hard_v2.py:93-117) is provided via
``head_bias_init`` to compensate at small scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio, channels, num_blocks, stride, kernel)
_BASE_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# (width_mult, depth_mult, resolution, dropout)
_SCALING = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
}


def _round_channels(c: float, divisor: int = 8) -> int:
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return new


def _round_repeats(r: float) -> int:
    return int(math.ceil(r))


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    expand: int
    stride: int
    kernel: int
    drop_path: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        h = x
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, name=name,
        )
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype, name="pw_expand")(h)
            h = norm("bn0")(h)
            h = nn.silu(h)
        h = nn.Conv(
            h.shape[-1], (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=h.shape[-1], use_bias=False,
            dtype=self.dtype, name="dw",
        )(h)
        h = norm("bn1")(h)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, in_ch // 4), dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw_project")(h)
        h = norm("bn2")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = DropPath(self.drop_path, name="drop_path")(h, deterministic=not train)
            h = h + x
        return h


class EfficientNet(nn.Module):
    """Returns pooled features (num_classes=0 style) or logits."""

    variant: str = "b0"
    num_classes: int = 0
    drop_rate: float = 0.2
    drop_path_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    head_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm, _, _ = _SCALING[self.variant]
        x = x.astype(self.dtype)

        stem = _round_channels(32 * wm)
        x = nn.Conv(stem, (3, 3), strides=2, padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn_stem")(x)
        x = nn.silu(x)

        total_blocks = sum(_round_repeats(r * dm) for _, _, r, _, _ in _BASE_BLOCKS)
        bidx = 0
        for si, (e, c, r, s, k) in enumerate(_BASE_BLOCKS):
            out_ch = _round_channels(c * wm)
            for j in range(_round_repeats(r * dm)):
                dp = self.drop_path_rate * bidx / max(total_blocks, 1)
                x = MBConv(
                    out_ch=out_ch, expand=e, stride=s if j == 0 else 1,
                    kernel=k, drop_path=dp, dtype=self.dtype,
                    name=f"stage{si}_block{j}",
                )(x, train)
                bidx += 1

        head_ch = _round_channels(1280 * wm)
        x = nn.Conv(head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn_head")(x)
        x = nn.silu(x)
        x = jnp.mean(x, axis=(1, 2))  # global avg pool
        x = x.astype(jnp.float32)

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

    @property
    def num_features(self) -> int:
        wm = _SCALING[self.variant][0]
        return _round_channels(1280 * wm)


def feature_dim(variant: str) -> int:
    return _round_channels(1280 * _SCALING[variant][0])
