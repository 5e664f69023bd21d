"""CLAHE — Contrast-Limited Adaptive Histogram Equalization, batched.

Replaces cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8,8)).apply on the LAB
L channel (normalise.py:10-16) with an array-resident implementation:

1. per-tile 256-bin histograms via one ``segment_sum`` over the whole batch
   (no per-image Python, no dynamic shapes);
2. OpenCV clip semantics, exactly: integer clip limit
   ``max(clip*tileArea/nbins, 1)``; clipped excess redistributed as
   ``excess // nbins`` to every bin plus a +1 bonus to the first
   ``residual`` bins at spacing ``max(nbins // residual, 1)``
   (clahe.cpp calcLut residual loop);
3. per-tile LUT = round(cdf * (nbins-1)/tileArea)  (round-half-even =
   cvRound);
4. bilinear interpolation between the 4 neighbouring tile LUTs with
   OpenCV's tile coordinate ``x·inv_tw − 0.5`` and edge clamping.

Parity is pinned to REAL cv2 5.0 outputs in tests/test_cv2_goldens.py
(≤1 level, from cv2's final uint8 rounding); round 1's "even residual
spread" deviation was caught by those goldens (up to 14 levels off) and
removed.

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
    hist = jnp.minimum(hist, limit)
    # OpenCV integer redistribution (clahe.cpp): every bin gets
    # excess // nbins; the first `residual` bins at spacing
    # max(nbins // residual, 1) get +1
    exc_i = excess.astype(jnp.int32)  # counts are exact small ints
    batch_add = exc_i // n_bins
    resid = exc_i - batch_add * n_bins  # [..,1] ∈ [0, nbins)
    step = jnp.maximum(n_bins // jnp.maximum(resid, 1), 1)
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    bonus = ((bins % step) == 0) & ((bins // step) < resid)
    hist = hist + batch_add.astype(jnp.float32) + bonus.astype(jnp.float32)
    cdf = jnp.cumsum(hist, axis=-1)
    lut = jnp.clip(jnp.round(cdf * ((n_bins - 1) / area)), 0, n_bins - 1)  # [B,ty,tx,256]

    # bilinear interpolation between tile LUTs (OpenCV convention:
    # txf = x·inv_tw − 0.5, clahe.cpp CLAHE_Interpolation_Body)
    fy = jnp.arange(H, dtype=jnp.float32) / th - 0.5
    fx = jnp.arange(W, dtype=jnp.float32) / tw - 0.5
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


def _pallas_clahe():
    """Lazy import: the Pallas kernel only compiles on real TPU."""
    try:
        from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

        return clahe_pallas
    except Exception:  # pragma: no cover
        return None


def clahe_dispatch(
    l: jnp.ndarray,
    clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """CLAHE on the L channel, auto-routing to the fused Pallas kernel on
    TPU (bit-identical to :func:`clahe`; the XLA path's 4 LUT gathers cost
    ~430 ms/batch32 at 512² vs ~6 ms for the kernel)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = _pallas_clahe() if use_pallas else None
    return (fn or clahe)(l, clip=clip, tiles=tiles)


def clahe_rgb(
    imgs: jnp.ndarray,
    clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    use_pallas: bool | None = None,
    quant_l: bool = False,
) -> jnp.ndarray:
    """apply_clahe parity (normalise.py:10-16): RGB→LAB, CLAHE on L, back.

    The reference chain runs on uint8 (cv2 quantizes L,a,b between steps);
    LAB is rounded here to match that data path — without it, sub-level L
    differences land in different histogram bins and the clipped LUT
    amplifies them (real-cv2 goldens showed p99≈9 levels unquantized).

    ``quant_l=True`` additionally quantizes the CLAHE OUTPUT L (round-half-
    up) — cv2's CLAHE stores saturate_cast<uchar>, so this is the exact
    reference semantics and the oracle for the fused u8 TPU path; the f32
    default keeps the interpolated float for the historical goldens."""
    lab = jnp.round(rgb_to_lab(imgs))
    l2 = clahe_dispatch(lab[..., 0], clip=clip, tiles=tiles, use_pallas=use_pallas)
    if quant_l:
        l2 = jnp.floor(jnp.clip(l2, 0.0, 255.0) + 0.5)
    lab = lab.at[..., 0].set(l2)
    return lab_to_rgb(lab)
