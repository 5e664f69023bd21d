"""TinyNet — a minimal conv backbone for hermetic tests & CI.

Not part of the reference model zoo; exists because XLA-compiling a full
EfficientNet on the 1-vCPU test machine takes minutes per variant. TinyNet
exposes the exact same module contract (num_classes=0 → pooled features,
BatchNorm batch_stats, dropout rng, head_bias_init) so every trainer test
exercises the identical code paths at ~100× lower compile cost.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class TinyNet(nn.Module):
    num_classes: int = 0
    width: int = 16
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    head_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i, mult in enumerate((1, 2, 4)):
            x = nn.Conv(self.width * mult, (3, 3), strides=2, padding="SAME",
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
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


def feature_dim(width: int = 16) -> int:
    return width * 4
