"""Gated-attention MIL model (stream 3 of the final system).

Parity: experiments/vision_v2/train_mil_attention_v1.py —
- AttentionMIL (:117-130, Ilse et al. 2018 gated attention):
  ``A = softmax(w·(tanh(V·H) ⊙ σ(U·H)))``, ``M = Σ A·H``;
- MILNet (:132-148): efficientnet_b0 encoder + attention pool + linear head;
- bags of K=12 random-resized-crop instances per image @320 (:78-115) —
  bag construction is the on-device :func:`make_bags`.

TPU shape discipline: bags are [B, K, H, W, 3]; the encoder runs on the
flattened [B·K, ...] batch (one big MXU-friendly batch, no per-instance
loop) and attention is two tiny matmuls.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmtrs_tpu.models.backbones.factory import create_model
from mmtrs_tpu.ops.warp import scale3, translate3, warp_affine


class AttentionMIL(nn.Module):
    """Gated attention pooling over instance features [B, K, D] → [B, D]."""

    attn_dim: int = 128

    @nn.compact
    def __call__(self, h):
        v = nn.tanh(nn.Dense(self.attn_dim, name="V")(h))
        u = nn.sigmoid(nn.Dense(self.attn_dim, name="U")(h))
        a = nn.Dense(1, use_bias=False, name="w")(v * u)[..., 0]  # [B, K]
        a = jax.nn.softmax(a, axis=-1)
        m = jnp.einsum("bk,bkd->bd", a, h)
        return m, a


class MILNet(nn.Module):
    model_name: str = "efficientnet_b0"
    attn_dim: int = 128
    drop_rate: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, bags, train: bool = False):
        """bags: [B, K, H, W, 3] → (logit [B], attention [B, K])."""
        B, K = bags.shape[0], bags.shape[1]
        enc = create_model(
            self.model_name, num_classes=0, drop_rate=self.drop_rate,
            dtype=self.dtype,
        )
        flat = bags.reshape((B * K,) + bags.shape[2:])
        h = enc(flat, train=train)  # [B·K, D] f32
        h = h.reshape(B, K, -1)
        m, a = AttentionMIL(self.attn_dim, name="mil")(h)
        if self.drop_rate > 0:
            m = nn.Dropout(self.drop_rate, deterministic=not train)(m)
        logit = nn.Dense(1, name="head")(m)[..., 0]
        return logit, a


def make_bags(
    imgs: jnp.ndarray,
    keys: jnp.ndarray,
    bag_size: int = 12,
    out_size: int = 320,
    scale_range: tuple[float, float] = (0.4, 1.0),
    hflip_p: float = 0.5,
) -> jnp.ndarray:
    """On-device bag construction: K RandomResizedCrop(scale 0.4-1.0)
    instances per image (+ random hflip), as one batched affine warp
    (TeethMILBag parity, train_mil_attention_v1.py:78-115)."""
    B, H, W, C = imgs.shape

    def crop_mat(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        area_frac = jax.random.uniform(k1, (), minval=scale_range[0], maxval=scale_range[1])
        side = jnp.sqrt(area_frac)
        ch, cw = side * H, side * W
        y0 = jax.random.uniform(k2, (), minval=0.0, maxval=1.0) * (H - ch)
        x0 = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (W - cw)
        # forward map: crop rect → [0, out)² ; compose optional hflip
        sx = out_size / cw
        sy = out_size / ch
        m = (
            scale3(sx, sy)
            @ translate3(-x0, -y0)
        )
        flip = jax.random.bernoulli(k4, hflip_p)
        fm = jnp.array(
            [[-1.0, 0.0, out_size - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        return jnp.where(flip, fm @ m, m)

    bag_keys = jax.vmap(lambda k: jax.random.split(k, bag_size))(keys)  # [B,K,2]
    mats = jax.vmap(jax.vmap(crop_mat))(bag_keys)  # [B, K, 3, 3]
    flat_imgs = jnp.repeat(imgs, bag_size, axis=0)
    flat_mats = mats.reshape(-1, 3, 3)
    crops = warp_affine(
        flat_imgs, flat_mats, out_hw=(out_size, out_size), border="replicate"
    )
    return crops.reshape(B, bag_size, out_size, out_size, C)


def make_eval_bag(imgs: jnp.ndarray, out_size: int = 480) -> jnp.ndarray:
    """Serving-time bag: resize 512 → centre-crop 480 per image, all images
    of a case forming one bag (infer_mil.py:116-149)."""
    from mmtrs_tpu.ops.resize import resize_bilinear

    r = resize_bilinear(imgs, (512, 512))
    off = (512 - out_size) // 2
    return r[:, off : off + out_size, off : off + out_size, :]
