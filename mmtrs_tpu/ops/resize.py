"""Resizes and crop geometry as single-gather warps.

The reference's crop path (segment.py:60-82 ``crop_with_mask``: bbox+margin →
pad-to-square with zeros → resize 512) and the centre-crop fallback
(pipeline.py:23-29) are dynamic-shape operations in numpy. Here they are
recast as ONE affine sampling with static output shape — the bbox only
changes the sampling matrix, never a shape, so the whole crop layer jits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmtrs_tpu.ops.warp import sample_bilinear


@partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(imgs: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible batched resize (half-pixel centers)."""
    B, H, W, C = imgs.shape
    oh, ow = out_hw
    sy, sx = H / oh, W / ow
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5
    yy = jnp.broadcast_to(ys[:, None], (oh, ow))
    xx = jnp.broadcast_to(xs[None, :], (oh, ow))
    return jax.vmap(lambda im: sample_bilinear(im, yy, xx, border="replicate"))(imgs)


@partial(jax.jit, static_argnames=("out_size",))
def center_crop_resize(imgs: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Centre square crop then resize (pipeline.py:23-29)."""
    B, H, W, C = imgs.shape
    side = min(H, W)
    y0 = (H - side) // 2
    x0 = (W - side) // 2
    crop = imgs[:, y0 : y0 + side, x0 : x0 + side, :]
    return resize_bilinear(crop, (out_size, out_size))


@partial(jax.jit, static_argnames=("out_size",))
def crop_box_resize(
    imgs: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
    margin: float = 15.0,
) -> jnp.ndarray:
    """Batched ``crop_with_mask`` geometry (segment.py:60-82): per-sample box
    (y0, x0, y1, x1) + margin, clamp, pad-to-square with zeros, resize —
    expressed as one bilinear sampling with constant border.

    ``boxes`` is [B, 4] float (y0, x0, y1, x1), exclusive upper bounds like
    the reference's ``y.max()+1``-equivalent slicing.
    """
    B, H, W, C = imgs.shape

    def one(img, box):
        y0 = jnp.maximum(box[0] - margin, 0.0)
        x0 = jnp.maximum(box[1] - margin, 0.0)
        y1 = jnp.minimum(box[2] + margin, float(H))
        x1 = jnp.minimum(box[3] + margin, float(W))
        h = y1 - y0
        w = x1 - x0
        d = jnp.maximum(h, w)
        # reference uses integer offsets ((d-h)//2); match that rounding
        y_off = jnp.floor((d - h) / 2.0)
        x_off = jnp.floor((d - w) / 2.0)
        # output pixel u,v ∈ [0,out) maps into padded square of side d:
        # padded coord p = (u+0.5) * d/out - 0.5; source = p - off + origin
        scale = d / out_size
        us = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        py = us[:, None] - y_off + y0
        px = us[None, :] - x_off + x0
        yy = jnp.broadcast_to(py, (out_size, out_size))
        xx = jnp.broadcast_to(px, (out_size, out_size))
        # outside the crop rect (incl. the zero padding) → 0
        inside = (
            (yy >= y0 - 0.5) & (yy <= y1 - 0.5) & (xx >= x0 - 0.5) & (xx <= x1 - 0.5)
        )
        out = sample_bilinear(img, yy, xx, border="constant", cval=0.0)
        return jnp.where(inside[..., None], out, 0.0)

    return jax.vmap(one)(imgs, boxes.astype(jnp.float32))


def mask_to_box(mask: jnp.ndarray) -> jnp.ndarray:
    """[H,W] bool → (y0, x0, y1, x1) with exclusive upper bounds; static
    shapes (argmax over row/col any-reductions)."""
    H, W = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(H)
    cidx = jnp.arange(W)
    y0 = jnp.min(jnp.where(rows, ridx, H))
    y1 = jnp.max(jnp.where(rows, ridx, -1)) + 1
    x0 = jnp.min(jnp.where(cols, cidx, W))
    x1 = jnp.max(jnp.where(cols, cidx, -1)) + 1
    return jnp.stack([y0, x0, y1, x1]).astype(jnp.float32)
