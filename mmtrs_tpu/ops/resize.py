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

from mmtrs_tpu.ops.warp import _to_3x3, invert_affine, sample_bilinear, warp_affine_shear


def _interp_matrix(src_coords: jnp.ndarray, n_src: int) -> jnp.ndarray:
    """[..., n_out] float source coords → [..., n_out, n_src] bilinear
    interpolation matrix (hat weights, clamped = replicate border).

    TPU-first trick: axis-aligned resampling as a dense banded matrix turns
    gathers (catastrophically slow on TPU — measured ~45M taps/s) into MXU
    matmuls. The matrix is built with one compare-free hat function over a
    lane iota; 512×512 f32 is 1MB — trivial next to the gather cost.
    """
    c = jnp.clip(src_coords, 0.0, n_src - 1.0)[..., None]
    idx = jnp.arange(n_src, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c - idx))


def _resample_axis_matmul(imgs: jnp.ndarray, Wm: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply per-sample interpolation matrices along H (axis=1) or W (axis=2).
    imgs [B,H,W,C]; Wm [B, n_out, n_src]. Precision: plain bf16 (DEFAULT)
    costs ~0.5 intensity levels — visible against the exact-bilinear
    oracle; HIGH (bf16_3x) is ~1e-6 relative (invisible at the 0..255
    scale, hat rows have ≤2 nonzeros) at half the cost of HIGHEST's
    6-pass f32 emulation."""
    if axis == 1:
        return jnp.einsum("byi,bixc->byxc", Wm, imgs,
                          precision=jax.lax.Precision.HIGH,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("bxj,byjc->byxc", Wm, imgs,
                      precision=jax.lax.Precision.HIGH,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(imgs: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible batched resize (half-pixel centers),
    as two separable MXU matmuls."""
    B, H, W, C = imgs.shape
    oh, ow = out_hw
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (H / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (W / ow) - 0.5
    Wy = jnp.broadcast_to(_interp_matrix(ys, H), (B, oh, H))
    Wx = jnp.broadcast_to(_interp_matrix(xs, W), (B, ow, W))
    out = _resample_axis_matmul(imgs.astype(jnp.float32), Wy, axis=1)
    return _resample_axis_matmul(out, Wx, axis=2)


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
    (y0, x0, y1, x1) + margin, clamp, pad-to-square with zeros, resize.

    Routed through :func:`warp_affine` (src→dst matrices) plus a
    scalar-bounds mask: output pixel u maps to source
    ``(u+0.5)·d/out − 0.5 − off + origin``, which is affine, and the
    zero-padding region is exactly the set of outputs whose source falls
    outside the crop rect — per-sample scalar bounds in *output*
    coordinates, so the mask is two iota comparisons.

    ``boxes`` is [B, 4] float (y0, x0, y1, x1), exclusive upper bounds like
    the reference's ``y.max()+1``-equivalent slicing.
    """
    B, H, W, C = imgs.shape
    # reference uses integer offsets ((d-h)//2); _crop_affine_params matches
    # that rounding. src = scale·dst + t per axis.
    scale, ty, tx, y0, x0, y1, x1 = _crop_affine_params(
        boxes, H, W, out_size, margin
    )

    # axis-aligned map → two separable MXU matmuls (see _interp_matrix)
    u = jnp.arange(out_size, dtype=jnp.float32)
    sy = scale[:, None] * u[None, :] + ty[:, None]  # [B, out]
    sx = scale[:, None] * u[None, :] + tx[:, None]
    Wy = _interp_matrix(sy, H)  # [B, out, H]
    Wx = _interp_matrix(sx, W)
    out = _resample_axis_matmul(imgs.astype(jnp.float32), Wy, axis=1)
    out = _resample_axis_matmul(out, Wx, axis=2)

    # zero the pad region: outputs whose source falls outside the crop rect
    row_ok = (sy >= y0[:, None] - 0.5) & (sy <= y1[:, None] - 0.5)  # [B, out]
    col_ok = (sx >= x0[:, None] - 0.5) & (sx <= x1[:, None] - 0.5)
    mask = row_ok[:, :, None] & col_ok[:, None, :]
    return jnp.where(mask[..., None], out, 0.0)


def _crop_affine_params(boxes, H, W, out_size, margin):
    """Shared crop geometry (crop_box_resize docstring): per-sample scale
    and translation of the dst→src axis-aligned map src = scale·dst + t,
    plus the crop-rect bounds for the zero-pad mask."""
    b = boxes.astype(jnp.float32)
    y0 = jnp.maximum(b[:, 0] - margin, 0.0)
    x0 = jnp.maximum(b[:, 1] - margin, 0.0)
    y1 = jnp.minimum(b[:, 2] + margin, float(H))
    x1 = jnp.minimum(b[:, 3] + margin, float(W))
    h = y1 - y0
    w = x1 - x0
    d = jnp.maximum(h, w)
    y_off = jnp.floor((d - h) / 2.0)
    x_off = jnp.floor((d - w) / 2.0)
    scale = d / out_size
    ty = 0.5 * scale - 0.5 - y_off + y0
    tx = 0.5 * scale - 0.5 - x_off + x0
    return scale, ty, tx, y0, x0, y1, x1


@partial(jax.jit, static_argnames=("out_size",))
def crop_warp_fused(
    imgs: jnp.ndarray,
    boxes: jnp.ndarray,
    mats: jnp.ndarray,
    out_size: int,
    margin: float = 15.0,
) -> jnp.ndarray:
    """``crop_box_resize`` composed with a per-sample affine augmentation in
    ONE resample: the crop is an axis-aligned affine (src = scale·dst + t)
    and the augment matrix is affine, so crop∘augment is a single affine —
    one two-pass shear warp instead of two full-image resamples (the
    round-3 perf lever VERDICT #1b).

    Semantics match ``augment(warp) ∘ crop_box_resize`` except at mask
    boundaries: the sequential path bilinearly blends the crop's zero-pad
    into edge pixels before masking, the fused path samples the original
    image there — subpixel boundary differences only (augmentation parity
    is distributional, SURVEY §7 hard-part 3). The combined zero mask is
    exact: output pixel u is zero iff its augment-source v=M_aug⁻¹u leaves
    the [0,out−1]² crop frame (the warp's constant border) OR its original-
    source s=scale·v+t leaves the crop rect (the pad-to-square zeros).

    ``mats``: [B,2,3] or [B,3,3] forward maps in the crop-output frame
    (same convention as warp_affine_shear). Requires square inputs with
    H == W == out_size (the production 512² path) because the two-pass
    shear warp emits input-sized outputs.
    """
    B, H, W, C = imgs.shape
    if H != out_size or W != out_size:
        raise ValueError(
            f"crop_warp_fused requires H=W=out_size, got {(H, W, out_size)}"
        )
    m_total, m_aug, crop_params = _crop_warp_matrix(
        boxes, mats, H, W, out_size, margin
    )
    # replicate border here; the exact combined mask is applied below
    out = warp_affine_shear(imgs, m_total, border="replicate")
    ok = _crop_warp_mask(m_aug, crop_params, out_size)
    # dtype-preserving fill: the fused-TPU warp returns uint8 for uint8
    # inputs — a 0.0 literal would silently promote the whole image back
    # to f32 and undo the u8 staging
    fill = jnp.uint8(0) if out.dtype == jnp.uint8 else 0.0
    return jnp.where(ok[..., None], out, fill)


def _crop_warp_matrix(boxes, mats, H, W, out_size, margin):
    """Combined crop∘augment forward matrix + mask params (shared by the
    interleaved and planar crop_warp entry points)."""
    scale, ty, tx, y0, x0, y1, x1 = _crop_affine_params(
        boxes, H, W, out_size, margin
    )
    m_aug = _to_3x3(mats.astype(jnp.float32))
    z = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    inv_s = 1.0 / scale
    m_crop = jnp.stack(
        [
            jnp.stack([inv_s, z, -tx * inv_s], axis=-1),
            jnp.stack([z, inv_s, -ty * inv_s], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )  # [B,3,3], (x,y,1) coords
    m_total = jnp.einsum("bij,bjk->bik", m_aug, m_crop,
                         precision=jax.lax.Precision.HIGHEST)
    return m_total, m_aug, (scale, ty, tx, y0, x0, y1, x1)


def _crop_warp_mask(m_aug, crop_params, out_size):
    """[B,out,out] bool — True where the output pixel has a real source
    (see crop_warp_fused docstring for the exact-mask derivation)."""
    scale, ty, tx, y0, x0, y1, x1 = crop_params
    inva = jax.vmap(invert_affine)(m_aug)
    xx = jnp.arange(out_size, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]
    vx = inva[:, 0, 0, None, None] * xx + inva[:, 0, 1, None, None] * yy \
        + inva[:, 0, 2, None, None]
    vy = inva[:, 1, 0, None, None] * xx + inva[:, 1, 1, None, None] * yy \
        + inva[:, 1, 2, None, None]
    sx = scale[:, None, None] * vx + tx[:, None, None]
    sy = scale[:, None, None] * vy + ty[:, None, None]
    lim = float(out_size - 1)
    return (
        (vx >= 0.0) & (vx <= lim) & (vy >= 0.0) & (vy <= lim)
        & (sx >= x0[:, None, None] - 0.5) & (sx <= x1[:, None, None] - 0.5)
        & (sy >= y0[:, None, None] - 0.5) & (sy <= y1[:, None, None] - 0.5)
    )


def crop_warp_fused_planes(
    planes: tuple,
    boxes: jnp.ndarray,
    mats: jnp.ndarray,
    out_size: int,
    margin: float = 15.0,
    interpret: bool = False,
) -> tuple:
    """Planar-chain twin of :func:`crop_warp_fused`: (r, g, b) u8 planes
    [B,S,S] in → planes out. Identical math (same combined matrix, same
    fused two-pass kernels, same exact combined mask); the only difference
    is that NO NHWC planarize/interleave pass exists — the round-5 chain
    keeps planes separate from the LAB stage to the final interleave."""
    from mmtrs_tpu.ops.warp import (
        _warp_shear_fused_planes,
        invert_affine_params,
    )

    B, H, W = planes[0].shape
    if H != out_size or W != out_size:
        raise ValueError(
            f"crop_warp_fused_planes requires H=W=out_size, got {(H, W, out_size)}"
        )
    m_total, m_aug, crop_params = _crop_warp_matrix(
        boxes, mats, H, W, out_size, margin
    )
    a, b, c, d, e, f = invert_affine_params(m_total)
    e_safe = jnp.where(jnp.abs(e) < 1e-3,
                       jnp.where(e < 0, -1e-3, 1e-3), e)
    outs = _warp_shear_fused_planes(planes, a, b, c, d, e_safe, f,
                                    interpret=interpret)
    ok = _crop_warp_mask(m_aug, crop_params, out_size)
    fill = jnp.uint8(0) if outs[0].dtype == jnp.uint8 else 0.0
    return tuple(jnp.where(ok, o, fill) for o in outs)


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
