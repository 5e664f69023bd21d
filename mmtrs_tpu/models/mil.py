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
from mmtrs_tpu.ops.warp import warp_affine  # noqa: F401 (re-export compat)


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
    instances per image (+ random hflip), as two batched MXU hat-matrix
    einsums (TeethMILBag parity, train_mil_attention_v1.py:78-115).

    TPU-first: the RRC crop is axis-aligned, so each instance is a
    separable resample — per-instance interpolation matrices contracted
    directly against the [B,H,W,C] batch (no jnp.repeat materialization,
    no gathers). The previous gather-warp form ran at ~45M taps/s and was
    the round-2 rehearsal's dominant cost (~0.8 s/step at bag 6@224);
    this form is MXU-bound (~1 ms/step at bag 12@320, b16).
    Sampling convention unchanged: src = dst·(crop/out) + origin; hflip
    reverses the output column coordinate."""
    B, H, W, C = imgs.shape

    def crop_coords(key):
        k1, k2, k3, k4, _ = jax.random.split(key, 5)
        area_frac = jax.random.uniform(
            k1, (), minval=scale_range[0], maxval=scale_range[1]
        )
        side = jnp.sqrt(area_frac)
        ch, cw = side * H, side * W
        y0 = jax.random.uniform(k2, (), minval=0.0, maxval=1.0) * (H - ch)
        x0 = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (W - cw)
        u = jnp.arange(out_size, dtype=jnp.float32)
        flip = jax.random.bernoulli(k4, hflip_p)
        ux = jnp.where(flip, out_size - 1.0 - u, u)
        sy = u * (ch / out_size) + y0
        sx = ux * (cw / out_size) + x0
        return sy, sx

    bag_keys = jax.vmap(lambda k: jax.random.split(k, bag_size))(keys)  # [B,K,2]
    sy, sx = jax.vmap(jax.vmap(crop_coords))(bag_keys)  # [B,K,out]

    def hat(coords, n):
        c = jnp.clip(coords, 0.0, n - 1.0)[..., None]
        idx = jnp.arange(n, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(c - idx))

    Wy = hat(sy, H)  # [B,K,out,H]
    Wx = hat(sx, W)  # [B,K,out,W]
    t = jnp.einsum("bkoh,bhwc->bkowc", Wy, imgs.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGH,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bkpw,bkowc->bkopc", Wx, t,
                     precision=jax.lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)
    return out


def make_eval_bag(imgs: jnp.ndarray, out_size: int = 480) -> jnp.ndarray:
    """Serving-time bag: resize 512 → centre-crop 480 per image, all images
    of a case forming one bag (infer_mil.py:116-149)."""
    from mmtrs_tpu.ops.resize import resize_bilinear

    r = resize_bilinear(imgs, (512, 512))
    off = (512 - out_size) // 2
    return r[:, off : off + out_size, off : off + out_size, :]
