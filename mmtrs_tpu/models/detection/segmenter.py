"""Learned molar segmenter: Mask R-CNN behind the Segmenter box contract.

Reference behavior (src/preprocessing/segment.py:24-58), preserved exactly:
- score < 0.05 detections are skipped (:34);
- masks whose mean HSV saturation < 40 are metal → rejected (:37-39);
- shipped selection = argmax-score mask (:50-58 overwrite the
  centre-closest pick — the documented dead-code quirk);
- the crop is the bbox OF THE THRESHOLDED MASK (mask > 0.5), not the
  detection box (:57, :60-66);
- no valid mask → the caller's centre-crop fallback fires
  (pipeline.py:107-111), expressed here as valid=False + centre box.

TPU-first: the whole selection is one jit over the batch; masks are pasted
to image coordinates with two interpolation matmuls (no gathers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmtrs_tpu.models.detection.modules import DetectorConfig, MaskRCNN
from mmtrs_tpu.models.detection.ops import mask_bbox, paste_mask
from mmtrs_tpu.ops.color import rgb_to_hsv
from mmtrs_tpu.ops.resize import resize_bilinear


class MaskRCNNSegmenter:
    """Implements mmtrs_tpu.models.segmenter.Segmenter with a learned
    detector. ``variables`` come from convert_torchvision (COCO weights)
    or any trained checkpoint with the same tree."""

    def __init__(
        self,
        variables: dict,
        cfg: DetectorConfig = DetectorConfig(),
        score_thresh: float = 0.05,
        min_saturation: float = 40.0,
        mask_thresh: float = 0.5,
    ):
        self.variables = variables
        self.cfg = cfg
        self.score_thresh = score_thresh
        self.min_saturation = min_saturation
        self.mask_thresh = mask_thresh
        self.model = MaskRCNN(cfg)

    @partial(jax.jit, static_argnums=(0,))
    def propose_boxes(self, imgs: jnp.ndarray):
        """imgs [B,H,W,3] float 0..255 → (boxes [B,4] (y0,x0,y1,x1),
        valid [B])."""
        B, H, W, _ = imgs.shape
        S = self.cfg.img_size
        det_in = imgs
        if (H, W) != (S, S):
            det_in = resize_bilinear(imgs, (S, S))
        det_boxes, det_scores, _, det_valid, det_masks = self.model.apply(
            self.variables, det_in / 255.0
        )
        # scale detection boxes back to the input frame
        sy, sx = H / S, W / S
        det_boxes = det_boxes * jnp.array([sx, sy, sx, sy])

        sat = rgb_to_hsv(imgs)[..., 1]  # 0..255 scale (cv2 HSV parity)

        def select_one(boxes_d, scores_d, valid_d, masks_d, sat_i):
            def per_det(box, mask):
                m = paste_mask(mask, box, (H, W)) > self.mask_thresh
                area = jnp.sum(m)
                mean_sat = jnp.sum(jnp.where(m, sat_i, 0.0)) / jnp.maximum(area, 1.0)
                return m, mean_sat, area

            masks_img, mean_sats, areas = jax.vmap(per_det)(boxes_d, masks_d)
            ok = (
                valid_d
                & (scores_d >= self.score_thresh)
                & (mean_sats >= self.min_saturation)
                & (areas > 0)
            )
            # shipped reference behavior: argmax score among gated masks
            sc = jnp.where(ok, scores_d, -jnp.inf)
            best = jnp.argmax(sc)
            any_ok = jnp.any(ok)
            box = mask_bbox(masks_img[best])  # (y0,x0,y1,x1)
            side = float(min(H, W))
            centre = jnp.array(
                [(H - side) / 2.0, (W - side) / 2.0,
                 (H + side) / 2.0, (W + side) / 2.0]
            )
            return jnp.where(any_ok, box, centre), any_ok

        return jax.vmap(select_one)(det_boxes, det_scores, det_valid, det_masks, sat)


def load_detector(path) -> MaskRCNNSegmenter:
    """Load a converted checkpoint (download_weights.py --torch_ckpt output)
    into a pipeline-ready MaskRCNNSegmenter."""
    from mmtrs_tpu.utils.checkpoint import load_checkpoint

    variables, recipe = load_checkpoint(path)
    recipe = recipe or {}
    cfg = DetectorConfig(
        img_size=int(recipe.get("img_size", 512)),
        num_classes=int(recipe.get("num_classes", 91)),
    )
    return MaskRCNNSegmenter(variables, cfg)
