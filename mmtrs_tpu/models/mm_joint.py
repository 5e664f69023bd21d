"""Joint image+tabular dual-task model (stream 2 of the final system).

Parity: experiments/multimodal_v1/train_mm_joint_dualtask.py:135-160
``MMJointDualHead``: timm backbone (default efficientnet_b4, pooled
features) ⊕ tabular MLP 9→64→64 (BatchNorm, ReLU, dropout .2) → concat →
dropout → two linear heads (hard classification logit, soft regression
logit). Loss composition α·BCE(hard) + β·BCE(soft) lives in the trainer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mmtrs_tpu.models.backbones.factory import create_model


class TabMLP(nn.Module):
    hidden: int = 64
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class MMJointDualHead(nn.Module):
    model_name: str = "efficientnet_b4"
    tab_hidden: int = 64
    tab_dropout: float = 0.2
    head_dropout: float = 0.2
    drop_rate: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x_img, x_tab, train: bool = False):
        """x_img: [B,H,W,3]; x_tab: [B,9] standardized features.
        Returns (logit_cls [B], logit_reg [B])."""
        backbone = create_model(
            self.model_name, num_classes=0, drop_rate=self.drop_rate,
            dtype=self.dtype,
        )
        f_img = backbone(x_img, train=train)  # [B, D] f32
        f_tab = TabMLP(self.tab_hidden, self.tab_dropout, name="tab_mlp")(
            x_tab.astype(jnp.float32), train=train
        )
        f = jnp.concatenate([f_img, f_tab], axis=-1)
        f = nn.Dropout(self.head_dropout, deterministic=not train)(f)
        logit_cls = nn.Dense(1, name="head_cls")(f)[..., 0]
        logit_reg = nn.Dense(1, name="head_reg")(f)[..., 0]
        return logit_cls, logit_reg
