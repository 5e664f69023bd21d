"""Batched deskew: edge-orientation estimate + conditional rotation.

Parity with normalise.py:19-57: Canny(50,150) edge map → PCA of edge-point
coordinates → principal-axis angle; skip when |angle| < ROT_TOLERANCE (15°)
or fewer than 10 edge points; rotate about the centre with replicate border.

TPU-first reformulation: instead of materializing a dynamic-size coordinate
list, the covariance is computed as *mask-weighted moments* over the full
pixel grid (static shapes). The Canny is approximated by Sobel gradient
magnitude with one hysteresis dilation step (no non-max thinning); parity is
distributional — the angle statistic, not the edge bitmap (SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmtrs_tpu.ops.color import rgb_to_gray
from mmtrs_tpu.ops.warp import rotate3, warp_affine


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
    # dilate strong by 1 (3×3 max) — one hysteresis propagation step
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
) -> jnp.ndarray:
    """Principal-axis angle (degrees) of the edge mass, per image [B]."""
    gray = rgb_to_gray(imgs)
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
    cov = jnp.stack(
        [jnp.stack([vyy, vyx], -1), jnp.stack([vyx, vxx], -1)], -2
    )  # [B,2,2]
    _, eigvecs = jnp.linalg.eigh(cov)
    # eigh sorts eigenvalues ascending → the principal component is column 1
    principal = eigvecs[..., :, 1]  # [B, 2] = (e_y, e_x)
    angle = jnp.rad2deg(jnp.arctan2(principal[..., 0], principal[..., 1]))
    return jnp.where(n < min_points, 0.0, angle)


@partial(jax.jit, static_argnames=("tolerance_deg",))
def deskew_batch(
    imgs: jnp.ndarray,
    tolerance_deg: float = 15.0,
    low: float = 50.0,
    high: float = 150.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate each image so its dominant edge axis lies horizontal; skip
    small corrections (|angle| < tolerance). Returns (imgs, applied_angle)."""
    B, H, W, _ = imgs.shape
    angle = estimate_skew_angle(imgs, low, high)
    apply = jnp.abs(angle) >= tolerance_deg
    eff = jnp.where(apply, angle, 0.0)
    mats = jax.vmap(lambda a: rotate3(a, (W / 2.0, H / 2.0)))(eff)
    out = warp_affine(imgs, mats, border="replicate")
    return out, eff
