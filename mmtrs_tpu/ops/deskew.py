"""Batched deskew: edge-orientation estimate + conditional rotation.

Parity with normalise.py:19-57: Canny(50,150) edge map → PCA of edge-point
coordinates → principal-axis angle; skip when |angle| < ROT_TOLERANCE (15°)
or too few edge points; rotate about the centre with replicate border.

TPU-first reformulations:
- the covariance is computed as *mask-weighted moments* over the full pixel
  grid (static shapes, no coordinate lists);
- the Canny is approximated by Sobel magnitude + one hysteresis dilation
  step (no non-max thinning) — parity is the angle statistic, not the edge
  bitmap (SURVEY.md §7 hard-part 3);
- the estimate runs on a 4×4 average-pooled image: the principal-axis angle
  is scale-invariant and this cuts the edge-map cost 16×;
- the expensive rotation warp (a gather) is wrapped in ``lax.cond`` and
  skipped entirely when *no* sample in the batch exceeds the tolerance —
  the common case, since ROT_TOLERANCE is 15°.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmtrs_tpu.ops.color import rgb_to_gray
from mmtrs_tpu.ops.warp import rotate_shear3


def _sobel(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3×3 Sobel via shifts (replicate border), gray: [B,H,W]."""
    p = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="edge")
    tl, tc, tr = p[:, :-2, :-2], p[:, :-2, 1:-1], p[:, :-2, 2:]
    ml, mr = p[:, 1:-1, :-2], p[:, 1:-1, 2:]
    bl, bc, br = p[:, 2:, :-2], p[:, 2:, 1:-1], p[:, 2:, 2:]
    gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
    gy = (bl + 2 * bc + br) - (tl + 2 * tc + tr)
    return gx, gy


def canny_lite(
    gray: jnp.ndarray, low: float = 50.0, high: float = 150.0
) -> jnp.ndarray:
    """Strong edges + weak edges adjacent to strong (1-step hysteresis)."""
    gx, gy = _sobel(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    strong = mag >= high
    weak = mag >= low
    s = strong.astype(jnp.float32)
    sp = jnp.pad(s, ((0, 0), (1, 1), (1, 1)))
    dil = jnp.zeros_like(s)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            dil = jnp.maximum(dil, sp[:, dy : dy + s.shape[1], dx : dx + s.shape[2]])
    return strong | (weak & (dil > 0))


@jax.jit
def estimate_skew_angle(
    imgs: jnp.ndarray,
    low: float = 50.0,
    high: float = 150.0,
    min_points: int = 10,
    downsample: bool = True,
) -> jnp.ndarray:
    """Principal-axis angle (degrees) of the edge mass, per image [B].

    Order note: gray-then-pool fuses into ONE u8 read on XLA:TPU; the
    "obvious" pool-before-gray reorder measured SLOWER (3.06 vs 2.14 ms
    @b128, scripts/exp_subset_r5.py D1/D2) because it breaks that fusion.
    """
    return _estimate_from_gray(rgb_to_gray(imgs), low, high, min_points,
                               downsample)


def _estimate_from_gray(
    gray: jnp.ndarray,
    low: float = 50.0,
    high: float = 150.0,
    min_points: int = 10,
    downsample: bool = True,
) -> jnp.ndarray:
    if downsample:
        B, H, W = gray.shape
        h4, w4 = (H // 4) * 4, (W // 4) * 4
        gray = gray[:, :h4, :w4].reshape(B, h4 // 4, 4, w4 // 4, 4).mean(axis=(2, 4))
    m = canny_lite(gray, low, high).astype(jnp.float32)
    B, H, W = m.shape
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    n = jnp.sum(m, axis=(1, 2))
    safe_n = jnp.maximum(n, 1.0)
    my = jnp.sum(m * ys, axis=(1, 2)) / safe_n
    mx = jnp.sum(m * xs, axis=(1, 2)) / safe_n
    dy = ys - my[:, None, None]
    dx = xs - mx[:, None, None]
    # covariance of (y, x) like np.cov of the coordinate list (ddof=1)
    denom = jnp.maximum(n - 1.0, 1.0)
    vyy = jnp.sum(m * dy * dy, axis=(1, 2)) / denom
    vxx = jnp.sum(m * dx * dx, axis=(1, 2)) / denom
    vyx = jnp.sum(m * dy * dx, axis=(1, 2)) / denom
    # principal axis of a 2×2 symmetric matrix, closed form:
    # θ = 0.5·atan2(2·vyx, vxx − vyy) gives the angle (from the x-axis) of
    # the eigenvector with the LARGER eigenvalue
    angle = jnp.rad2deg(0.5 * jnp.arctan2(2.0 * vyx, vxx - vyy))
    return jnp.where(n < min_points, 0.0, angle)


@partial(jax.jit, static_argnames=("tolerance_deg",))
def deskew_batch(
    imgs: jnp.ndarray,
    tolerance_deg: float = 15.0,
    low: float = 50.0,
    high: float = 150.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate each image so its dominant edge axis lies horizontal; skip
    small corrections (|angle| < tolerance). Returns (imgs, applied_angle).

    The 15° tolerance means most images skip the rotation, but one firing
    image used to drag the whole batch through the 3-shear warp — the warp
    now goes through :func:`subset_apply` (static-cap batch compaction,
    full-batch fallback if more than B/4 images fire)."""
    from mmtrs_tpu.ops.augment import subset_apply

    B, H, W, _ = imgs.shape
    angle = estimate_skew_angle(imgs, low, high)
    apply = jnp.abs(angle) >= tolerance_deg
    eff = jnp.where(apply, angle, 0.0)

    def do_warp(x, a):
        # gather-free 3-shear rotation (see warp.rotate_shear3); the
        # reference rotates about (W/2, H/2) (normalise.py:48-56).
        # dtype-preserving: uint8-staged chains stay uint8 (cv2.warpAffine
        # likewise returns the input dtype). On the TPU Pallas path a u8
        # input rides u8 through all three shear passes (each pass stores
        # the chain's round-half-up quantiser — ≤1.5 level total vs the
        # f32 3-shear, ¼ the HBM traffic); elsewhere the XLA passes return
        # f32 and the quantise happens once below.
        rot = rotate_shear3(x, a, center_xy=(W / 2.0, H / 2.0))
        if imgs.dtype == jnp.uint8 and rot.dtype != jnp.uint8:
            return (jnp.clip(rot, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
        return rot.astype(imgs.dtype)

    out = subset_apply(do_warp, imgs, apply, max(2, B // 4), eff)
    return out, eff


@partial(jax.jit, static_argnames=("tolerance_deg",))
def deskew_batch_planes(
    planes: tuple,
    tolerance_deg: float = 15.0,
    low: float = 50.0,
    high: float = 150.0,
) -> tuple:
    """Planar-chain twin of :func:`deskew_batch`: (r, g, b) u8 planes in →
    planes out. The angle estimate reads the planes directly (same luma
    weights); the rarely-firing rotation warp stacks ONLY the compacted
    cap-sized sub-batch to NHWC for rotate_shear3 — at cap = B/4 that
    stack is a quarter-batch copy inside a branch that usually processes
    no-op rows, vs. a full-batch planarize/interleave on the hot path."""
    from mmtrs_tpu.ops.augment import subset_apply

    r, g, b = planes
    B, H, W = r.shape
    gray = (0.299 * r.astype(jnp.float32) + 0.587 * g.astype(jnp.float32)
            + 0.114 * b.astype(jnp.float32))  # rgb_to_gray on planes
    angle = _estimate_from_gray(gray, low, high)
    apply = jnp.abs(angle) >= tolerance_deg
    eff = jnp.where(apply, angle, 0.0)

    def do_warp(sub_planes, a):
        x = jnp.stack(sub_planes, axis=-1)  # [cap,H,W,3]
        rot = rotate_shear3(x, a, center_xy=(W / 2.0, H / 2.0))
        if rot.dtype != jnp.uint8:
            rot = (jnp.clip(rot, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
        return (rot[..., 0], rot[..., 1], rot[..., 2])

    out = subset_apply(do_warp, planes, apply, max(2, B // 4), eff)
    return out, eff
