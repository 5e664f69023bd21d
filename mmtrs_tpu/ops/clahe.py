"""CLAHE — Contrast-Limited Adaptive Histogram Equalization, batched.

Replaces cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8,8)).apply on the LAB
L channel (normalise.py:10-16) with an array-resident implementation:

1. per-tile 256-bin histograms via one ``segment_sum`` over the whole batch
   (no per-image Python, no dynamic shapes);
2. OpenCV clip semantics: integer clip limit ``max(clip*tileArea/nbins, 1)``,
   clipped excess redistributed evenly across bins;
3. per-tile LUT = round(cdf * (nbins-1)/tileArea);
4. bilinear interpolation between the 4 neighbouring tile LUTs per pixel
   (half-tile border handling like OpenCV: tile coordinates are computed
   against tile centers and clamped).

Deviation from OpenCV (documented): OpenCV redistributes the residual of the
integer division one unit per leading bin; we spread it evenly (≤1 intensity
level difference). Parity is metric-level, not bit-level (SURVEY.md §7
hard-part 3).

A fused Pallas kernel with the same semantics lives in
mmtrs_tpu.ops.pallas.clahe_kernel; this module is the XLA reference both for
CPU tests and as the golden oracle for the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmtrs_tpu.ops.color import lab_to_rgb, rgb_to_lab


@partial(jax.jit, static_argnames=("tiles", "n_bins", "clip"))
def clahe(
    l: jnp.ndarray,
    clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    n_bins: int = 256,
) -> jnp.ndarray:
    """l: [B, H, W] float32 in 0..255 (H, W divisible by the tile grid)."""
    B, H, W = l.shape
    ty, tx = tiles
    assert H % ty == 0 and W % tx == 0, "pad inputs to a multiple of the tile grid"
    th, tw = H // ty, W // tx
    area = th * tw

    pix = jnp.clip(jnp.round(l), 0, n_bins - 1).astype(jnp.int32)

    # tile id per pixel → one flat segment_sum for all histograms
    by = jnp.arange(ty, dtype=jnp.int32).repeat(th)[None, :, None]
    bx = jnp.arange(tx, dtype=jnp.int32).repeat(tw)[None, None, :]
    bb = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    tile_flat = (bb * ty + by) * tx + bx  # [B,H,W]
    idx = tile_flat * n_bins + pix
    hist = jax.ops.segment_sum(
        jnp.ones_like(pix, dtype=jnp.float32).ravel(),
        idx.ravel(),
        num_segments=B * ty * tx * n_bins,
    ).reshape(B, ty, tx, n_bins)

    limit = max(int(clip * area / n_bins), 1)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins
    cdf = jnp.cumsum(hist, axis=-1)
    lut = jnp.clip(jnp.round(cdf * ((n_bins - 1) / area)), 0, n_bins - 1)  # [B,ty,tx,256]

    # bilinear interpolation between tile LUTs
    fy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / th - 0.5
    fx = (jnp.arange(W, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, ty - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, tx - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ty - 1)
    x1 = jnp.minimum(x0 + 1, tx - 1)
    wy = jnp.clip(fy - y0, 0.0, 1.0)[None, :, None]  # [1,H,1]
    wx = jnp.clip(fx - x0, 0.0, 1.0)[None, None, :]  # [1,1,W]

    lut_flat = lut.reshape(B, ty * tx * n_bins)

    def g(tiy, tix):
        # tiy:[H], tix:[W] → per-pixel flat LUT index
        t = (tiy[:, None] * tx + tix[None, :]) * n_bins + pix  # [B,H,W] via broadcast
        return jax.vmap(jnp.take)(lut_flat, t)

    v00 = g(y0, x0)
    v01 = g(y0, x1)
    v10 = g(y1, x0)
    v11 = g(y1, x1)
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out


def clahe_rgb(
    imgs: jnp.ndarray, clip: float = 3.0, tiles: tuple[int, int] = (8, 8)
) -> jnp.ndarray:
    """apply_clahe parity (normalise.py:10-16): RGB→LAB, CLAHE on L, back."""
    lab = rgb_to_lab(imgs)
    l2 = clahe(lab[..., 0], clip=clip, tiles=tiles)
    lab = lab.at[..., 0].set(l2)
    return lab_to_rgb(lab)
