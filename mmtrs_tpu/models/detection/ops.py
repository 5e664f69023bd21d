"""Static-shape detection ops for the TPU Mask R-CNN port.

Everything here is dynamic-shape-free by design (SURVEY.md §7 hard-part 1):
fixed top-k proposal counts, padded detections with validity masks, NMS as
a fixed-length scan over a precomputed IoU matrix, and RoIAlign as
per-ROI interpolation *matmuls* (TPU gathers measured ~45M taps/s in round
1 — the MXU path is orders of magnitude faster for these shapes).

Box convention: (x0, y0, x1, y1) in image pixels, matching torchvision
(reference consumer: src/preprocessing/segment.py:60-82 operates on mask
bboxes in pixel space).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# torchvision BoxCoder clamp: log(1000/16)
_BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------


def make_anchors_per_level(
    feat_hw: tuple[int, int],
    stride: int,
    size: float,
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """[H*W*A, 4] anchors for one FPN level (torchvision AnchorGenerator
    semantics: zero-centered cell anchors of `size`, rounded, shifted by
    stride grid)."""
    h, w = feat_hw
    ratios = np.asarray(aspect_ratios, np.float64)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = w_ratios * size
    hs = h_ratios * size
    # torchvision AnchorGenerator.generate_anchors rounds AFTER halving
    base = np.round(np.stack([-ws, -hs, ws, hs], axis=1) / 2.0)  # [A,4]

    shifts_x = np.arange(w, dtype=np.float32) * stride
    shifts_y = np.arange(h, dtype=np.float32) * stride
    sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [HW,1,4]
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


# ---------------------------------------------------------------------------
# Box coding (torchvision BoxCoder, weights per stage)
# ---------------------------------------------------------------------------


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    """deltas [..., 4] + anchors [..., 4] → boxes [..., 4]."""
    wx, wy, ww, wh = weights
    ax0, ay0, ax1, ay1 = jnp.split(anchors, 4, axis=-1)
    aw = ax1 - ax0
    ah = ay1 - ay0
    acx = ax0 + 0.5 * aw
    acy = ay0 + 0.5 * ah

    dx, dy, dw, dh = jnp.split(deltas, 4, axis=-1)
    dx, dy, dw, dh = dx / wx, dy / wy, dw / ww, dh / wh
    dw = jnp.minimum(dw, _BBOX_XFORM_CLIP)
    dh = jnp.minimum(dh, _BBOX_XFORM_CLIP)

    cx = dx * aw + acx
    cy = dy * ah + acy
    bw = jnp.exp(dw) * aw
    bh = jnp.exp(dh) * ah
    return jnp.concatenate(
        [cx - 0.5 * bw, cy - 0.5 * bh, cx + 0.5 * bw, cy + 0.5 * bh], axis=-1
    )


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    """Inverse of decode_boxes (used by detector training losses)."""
    wx, wy, ww, wh = weights
    ax0, ay0, ax1, ay1 = jnp.split(anchors, 4, axis=-1)
    aw = jnp.maximum(ax1 - ax0, 1e-6)
    ah = jnp.maximum(ay1 - ay0, 1e-6)
    acx = ax0 + 0.5 * aw
    acy = ay0 + 0.5 * ah
    bx0, by0, bx1, by1 = jnp.split(boxes, 4, axis=-1)
    bw = jnp.maximum(bx1 - bx0, 1e-6)
    bh = jnp.maximum(by1 - by0, 1e-6)
    bcx = bx0 + 0.5 * bw
    bcy = by0 + 0.5 * bh
    return jnp.concatenate(
        [
            wx * (bcx - acx) / aw,
            wy * (bcy - acy) / ah,
            ww * jnp.log(bw / aw),
            wh * jnp.log(bh / ah),
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, img_hw: tuple[int, int]) -> jnp.ndarray:
    h, w = img_hw
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x0, 0, w),
            jnp.clip(y0, 0, h),
            jnp.clip(x1, 0, w),
            jnp.clip(y1, 0, h),
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# IoU + static NMS
# ---------------------------------------------------------------------------


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a [N,4], b [M,4] → [N,M]."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    x0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def static_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    k_out: int,
    groups: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS, fixed output length.

    boxes [N,4], scores [N] → (keep_idx [k_out] int32, keep_valid [k_out]
    bool). With ``groups`` (int [N]), boxes in different groups never
    suppress each other (torchvision batched_nms: per-level for RPN,
    per-class for detections — implemented by masking the IoU matrix, not
    by coordinate offsets, to keep fp range sane)."""
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)
    if groups is not None:
        same = groups[:, None] == groups[None, :]
        iou = jnp.where(same, iou, 0.0)

    def step(live_scores, _):
        i = jnp.argmax(live_scores)
        valid = live_scores[i] > -jnp.inf
        suppress = iou[i] > iou_thresh
        live_scores = jnp.where(suppress, -jnp.inf, live_scores)
        live_scores = live_scores.at[i].set(-jnp.inf)
        return live_scores, (i.astype(jnp.int32), valid)

    _, (idx, valid) = jax.lax.scan(step, scores, None, length=k_out)
    return idx, valid


def topk_static(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """top-k along the last axis with k clamped statically to the size."""
    k = min(k, scores.shape[-1])
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# RoIAlign as interpolation matmuls (no gathers)
# ---------------------------------------------------------------------------


def _axis_weights(starts, ends, n_out: int, n_src: int, sampling: int):
    """Per-ROI 1-D average-of-bilinear-samples weights.

    starts/ends [R] in feature coords → [R, n_out, n_src] weights where
    out[r, i] = mean over `sampling` bilinear taps inside bin i of ROI r
    (torchvision RoIAlign aligned=False semantics: continuous coordinate
    c ∈ [0, n_src-1], taps at bin_start + (s+0.5)/sampling * bin_size)."""
    R = starts.shape[0]
    size = (ends - starts) / n_out  # [R]
    i = jnp.arange(n_out, dtype=jnp.float32)  # bins
    s = (jnp.arange(sampling, dtype=jnp.float32) + 0.5) / sampling
    # tap coords [R, n_out, sampling]
    c = starts[:, None, None] + (i[None, :, None] + s[None, None, :]) * size[:, None, None]
    c = jnp.clip(c, 0.0, n_src - 1)
    src = jnp.arange(n_src, dtype=jnp.float32)  # [n_src]
    # bilinear hat weights per tap → [R, n_out, sampling, n_src]
    w = jnp.maximum(1.0 - jnp.abs(c[..., None] - src), 0.0)
    return w.mean(axis=2)  # [R, n_out, n_src]


def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
    spatial_scale: float,
    sampling: int = 2,
) -> jnp.ndarray:
    """feat [H,W,C], boxes [R,4] (x0,y0,x1,y1 image coords) →
    [R, out, out, C]. Two per-ROI matmuls: rows then cols."""
    H, W, C = feat.shape
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    wy = _axis_weights(y0 * spatial_scale, y1 * spatial_scale, out_size, H, sampling)
    wx = _axis_weights(x0 * spatial_scale, x1 * spatial_scale, out_size, W, sampling)
    # rows: contract H → [R,P,W,C]; cols: contract W → [R,P,Q,C].
    # HIGHEST precision: TPU einsum defaults to bf16 multiplies, which
    # breaks sub-pixel interpolation parity
    hi = jax.lax.Precision.HIGHEST
    rows = jnp.einsum("rph,hwc->rpwc", wy, feat, precision=hi)
    return jnp.einsum("rqw,rpwc->rpqc", wx, rows, precision=hi)


def roi_align_multilevel(
    feats: list[jnp.ndarray],
    strides: list[int],
    boxes: jnp.ndarray,
    out_size: int,
    sampling: int = 2,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level assignment (FPN paper eq. 1, torchvision
    LevelMapper): k = floor(k0 + log2(sqrt(area)/224)), clamped. Static
    shapes: align on every level and one-hot select."""
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    k = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-6)
    )
    k = jnp.clip(k, 2, 2 + len(feats) - 1) - 2  # 0-based level index
    outs = jnp.stack(
        [
            roi_align(f, boxes, out_size, 1.0 / s, sampling)
            for f, s in zip(feats, strides)
        ],
        axis=0,
    )  # [L,R,out,out,C]
    onehot = jax.nn.one_hot(k.astype(jnp.int32), len(feats), axis=0)  # [L,R]
    return jnp.einsum(
        "lr,lrijc->rijc", onehot, outs, precision=jax.lax.Precision.HIGHEST
    )


# ---------------------------------------------------------------------------
# Mask pasting (28×28 ROI mask → full-image grid) via two matmuls
# ---------------------------------------------------------------------------


def paste_mask(
    mask: jnp.ndarray, box: jnp.ndarray, img_hw: tuple[int, int]
) -> jnp.ndarray:
    """mask [M,M] probabilities, box [4] (x0,y0,x1,y1) → [H,W] pasted by
    bilinear expansion (torchvision paste_masks_in_image semantics, minus
    the integer-box rounding: we evaluate the continuous bilinear field,
    which the 0.5 threshold downstream makes near-identical)."""
    M = mask.shape[0]
    H, W = img_hw
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x1 - x0, 1e-3)
    bh = jnp.maximum(y1 - y0, 1e-3)
    # image pixel centers → mask coords (torchvision: img_x scaled into
    # [-1,1] grid_sample over the MxM mask, align_corners=False)
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5 - y0) / bh * M - 0.5
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5 - x0) / bw * M - 0.5
    src = jnp.arange(M, dtype=jnp.float32)
    wy = jnp.maximum(1.0 - jnp.abs(ys[:, None] - src[None, :]), 0.0)  # [H,M]
    wx = jnp.maximum(1.0 - jnp.abs(xs[:, None] - src[None, :]), 0.0)  # [W,M]
    # out-of-box pixels get zero weight automatically (hat support)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(wy, mask, precision=hi), wx.T, precision=hi)


def mask_bbox(mask_bool: jnp.ndarray) -> jnp.ndarray:
    """[H,W] bool → (y0,x0,y1,x1) float bbox; full-zero masks yield an
    empty (H,0-style) box the caller must gate on."""
    H, W = mask_bool.shape
    ridx = jnp.arange(H, dtype=jnp.float32)
    cidx = jnp.arange(W, dtype=jnp.float32)
    rows = mask_bool.any(axis=1)
    cols = mask_bool.any(axis=0)
    y0 = jnp.min(jnp.where(rows, ridx, float(H)))
    y1 = jnp.max(jnp.where(rows, ridx, -1.0)) + 1.0
    x0 = jnp.min(jnp.where(cols, cidx, float(W)))
    x1 = jnp.max(jnp.where(cols, cidx, -1.0)) + 1.0
    return jnp.stack([y0, x0, y1, x1])
