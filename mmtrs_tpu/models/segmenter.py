"""Molar segmentation → crop box, batched and jit-compiled.

The reference wraps a COCO-pretrained torchvision Mask R-CNN
(src/preprocessing/segment.py:15-58) but its *consumer* needs exactly one
crop rectangle per image, selected with these heuristics:
- reject low-confidence masks (score < 0.05);
- reject "gray"/metal regions: mean HSV saturation over the mask < 40
  (segment.py:37-39);
- shipped selection = argmax-score mask (the centre-closest computation at
  :41-49 is dead code overwritten at :50-58 — SURVEY.md quirk, preserved
  here as "saliency-peak" selection);
- ``crop_with_mask``: bbox + 15px margin, pad-to-square with zeros, resize
  to 512 (segment.py:60-82);
- on any failure → centre-crop fallback (pipeline.py:107-111).

TPU-first design (round 1): a classical, fully-array saliency proposer —
no dynamic shapes, no connected components. "Toothness" = brightness ×
centre prior, gated by the same saturation-≥-40 metal filter; the box is
the bounding box of the thresholded saliency mass. The :class:`Segmenter`
protocol lets a learned JAX detector (Mask R-CNN port) drop in later with
the same box contract.
"""

from __future__ import annotations

from functools import partial
from typing import Protocol

import jax
import jax.numpy as jnp



class Segmenter(Protocol):
    def propose_boxes(self, imgs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """imgs [B,H,W,3] 0..255 → (boxes [B,4] (y0,x0,y1,x1), valid [B] bool)."""
        ...


class SaliencySegmenter:
    """Classical tooth proposer with the reference's mask-selection gates."""

    def __init__(
        self,
        min_saturation: float = 40.0,
        min_area_frac: float = 0.005,
        centre_sigma_frac: float = 0.5,
        quantile: float = 0.80,
    ):
        self.min_saturation = min_saturation
        self.min_area_frac = min_area_frac
        self.centre_sigma_frac = centre_sigma_frac
        self.quantile = quantile

    @partial(jax.jit, static_argnums=(0,))
    def propose_boxes(self, imgs: jnp.ndarray):
        x = imgs.astype(jnp.float32)
        return self._propose_from_rgb(x[..., 0], x[..., 1], x[..., 2])

    @partial(jax.jit, static_argnums=(0,))
    def propose_boxes_planes(self, planes: tuple):
        """Planar-chain entry: (r, g, b) planes [B,H,W] — identical math to
        :meth:`propose_boxes`, reading the chain's plane arrays directly."""
        r, g, b = planes
        return self._propose_from_rgb(
            r.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)
        )

    def _propose_from_rgb(self, r, g, b):
        B, H, W = r.shape
        # Brightness = Rec.601 luma, not LAB L: the saliency heuristic only
        # needs a monotone brightness field (quantile=0.80 is a tuning knob,
        # not a contract), and luma is one fused multiply-add per pixel vs
        # LAB's per-pixel pow transcendentals — the segmenter's former main
        # VPU cost (round-4 perf backlog item 4). Saturation is computed
        # directly ((max−min)/max, cv2 scale) instead of through the full
        # HSV conversion (hue is unused here).
        l = 0.299 * r + 0.587 * g + 0.114 * b
        cmax = jnp.maximum(jnp.maximum(r, g), b)
        cmin = jnp.minimum(jnp.minimum(r, g), b)
        sat = jnp.where(cmax > 0, (cmax - cmin) / jnp.maximum(cmax, 1e-6), 0.0) * 255.0

        yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        sy = H * self.centre_sigma_frac
        sx = W * self.centre_sigma_frac
        centre_prior = jnp.exp(
            -(((yy - H / 2) / sy) ** 2 + ((xx - W / 2) / sx) ** 2)
        )
        sal = l * centre_prior  # bright AND central

        # per-image quantile via fixed-iteration bisection — jnp.quantile
        # sorts 262k values per image (the pipeline's next-biggest cost after
        # the kernels); 16 halvings pin the threshold to range/2^16 with pure
        # vector passes. The ESTIMATE runs on a 4×4-mean-pooled bf16 map
        # (32× less HBM traffic per pass than full-res f32; the 16
        # sequential passes made this the segmenter's main cost) — the
        # quantile of a lightly pooled saliency field tracks the full-res
        # one to well under the heuristic's own tuning slack (quantile=0.80
        # is a knob, not a contract); the MASK below is still taken at full
        # resolution in f32.
        h4, w4 = (H // 4) * 4, (W // 4) * 4
        pooled = sal[:, :h4, :w4].reshape(B, h4 // 4, 4, w4 // 4, 4).mean((2, 4))
        flat = pooled.reshape(B, -1).astype(jnp.bfloat16)
        lo = jnp.min(flat, axis=1).astype(jnp.float32)
        hi = jnp.max(flat, axis=1).astype(jnp.float32)
        target = 1.0 - self.quantile  # fraction above the threshold

        def bisect(carry, _):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            frac_above = jnp.mean(flat > mid[:, None], axis=1)
            # too many above → raise threshold
            lo = jnp.where(frac_above > target, mid, lo)
            hi = jnp.where(frac_above > target, hi, mid)
            return (lo, hi), None

        (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=16)
        thr = 0.5 * (lo + hi)
        seed = sal >= thr[:, None, None]

        ridx = jnp.arange(H, dtype=jnp.float32)
        cidx = jnp.arange(W, dtype=jnp.float32)

        def mask_bbox(mask):
            rows = mask.any(axis=2)
            cols = mask.any(axis=1)
            y0 = jnp.min(jnp.where(rows, ridx, float(H)), axis=1)
            y1 = jnp.max(jnp.where(rows, ridx, -1.0), axis=1) + 1.0
            x0 = jnp.min(jnp.where(cols, cidx, float(W)), axis=1)
            x1 = jnp.max(jnp.where(cols, cidx, -1.0), axis=1) + 1.0
            return y0, x0, y1, x1

        # Extent growth (round 4): the seed is the top-(1−q) saliency MASS —
        # a peak region, not the tooth's extent — while the reference crops
        # the bbox of the detected tooth's full mask (segment.py:57-66). Grow
        # the seed to the full bright object: threshold raw brightness at the
        # Otsu-style midpoint between seed and background means, windowed to
        # a 25%-dilated seed bbox so bright clutter elsewhere in the frame
        # cannot inflate the crop.
        sf = seed.astype(jnp.float32)
        n_seed = jnp.maximum(sf.sum(axis=(1, 2)), 1.0)
        mean_seed = (l * sf).sum(axis=(1, 2)) / n_seed
        n_rest = jnp.maximum((1.0 - sf).sum(axis=(1, 2)), 1.0)
        mean_rest = (l * (1.0 - sf)).sum(axis=(1, 2)) / n_rest
        thr_l = 0.5 * (mean_seed + mean_rest)

        sy0, sx0, sy1, sx1 = mask_bbox(seed)
        my = 0.25 * (sy1 - sy0)
        mx = 0.25 * (sx1 - sx0)
        yy1 = ridx[None, :, None]
        xx1 = cidx[None, None, :]
        window = (
            (yy1 >= (sy0 - my)[:, None, None])
            & (yy1 < (sy1 + my)[:, None, None])
            & (xx1 >= (sx0 - mx)[:, None, None])
            & (xx1 < (sx1 + mx)[:, None, None])
        )
        mask = (l >= thr_l[:, None, None]) & window
        # degenerate extent (flat image) → fall back to the seed
        has_ext = mask.any(axis=(1, 2))
        mask = jnp.where(has_ext[:, None, None], mask, seed)

        # metal filter: mean saturation over the proposed mask must be ≥ 40
        m = mask.astype(jnp.float32)
        n = jnp.maximum(m.sum(axis=(1, 2)), 1.0)
        mean_sat = (sat * m).sum(axis=(1, 2)) / n
        sat_ok = mean_sat >= self.min_saturation
        area_ok = n >= self.min_area_frac * H * W
        valid = sat_ok & area_ok

        # bounding box of the grown mask (static shapes)
        y0, x0, y1, x1 = mask_bbox(mask)
        boxes = jnp.stack([y0, x0, y1, x1], axis=1)

        # centre-crop fallback geometry for invalid proposals
        side = float(min(H, W))
        cy0 = (H - side) / 2.0
        cx0 = (W - side) / 2.0
        centre_box = jnp.array([cy0, cx0, cy0 + side, cx0 + side])
        boxes = jnp.where(valid[:, None], boxes, centre_box[None, :])
        return boxes, valid
