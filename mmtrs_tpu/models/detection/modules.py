"""Flax modules for the Mask R-CNN port (torchvision maskrcnn_resnet50_fpn
architecture — reference consumer: src/preprocessing/segment.py:18-20 loads
the COCO-pretrained torchvision model).

Module/param names are chosen so the torchvision→Flax weight conversion in
convert_torchvision.py is a mechanical rename (conv kernels OIHW→HWIO,
linear weights transposed). BatchNorms are frozen affine transforms
(torchvision FrozenBatchNorm2d) — scale/bias/mean/var all live in
``params`` so converted running statistics ride along.

The width/depth are configurable so tests can exercise the full
RPN→RoIAlign→heads control flow with a tiny backbone on CPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        # folded affine computed in f32 (tiny), applied in compute dtype
        inv = scale * jax.lax.rsqrt(var + self.eps)
        off = bias - mean * inv
        return x * inv.astype(self.dtype) + off.astype(self.dtype)


def _conv(features, kernel, stride=1, padding=None, use_bias=False, name=None,
          dtype=jnp.float32):
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


class Bottleneck(nn.Module):
    width: int  # conv1/conv2 width; output is 4*width
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        identity = x
        out = _conv(self.width, 1, name="conv1", dtype=dt)(x)
        out = FrozenBN(self.width, name="bn1", dtype=dt)(out)
        out = nn.relu(out)
        out = _conv(self.width, 3, stride=self.stride, name="conv2", dtype=dt)(out)
        out = FrozenBN(self.width, name="bn2", dtype=dt)(out)
        out = nn.relu(out)
        out = _conv(self.width * 4, 1, name="conv3", dtype=dt)(out)
        out = FrozenBN(self.width * 4, name="bn3", dtype=dt)(out)
        if self.downsample:
            identity = _conv(self.width * 4, 1, stride=self.stride,
                             name="downsample_conv", dtype=dt)(x)
            identity = FrozenBN(self.width * 4, name="downsample_bn", dtype=dt)(identity)
        return nn.relu(out + identity)


class ResNetBody(nn.Module):
    """torchvision resnet50 body (conv1..layer4), returning C2..C5."""

    base_width: int = 64
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.base_width
        x = x.astype(self.dtype)
        x = nn.Conv(
            w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            name="conv1", dtype=self.dtype,
        )(x)
        x = FrozenBN(w, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for li, blocks in enumerate(self.layers):
            width = w * (2 ** li)
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = Bottleneck(
                    width,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    name=f"layer{li + 1}_{bi}",
                    dtype=self.dtype,
                )(x)
            feats.append(x)
        return feats  # [C2, C3, C4, C5]


class FPN(nn.Module):
    """Feature Pyramid Network: 1×1 laterals + 3×3 outputs + P6 maxpool
    (torchvision FeaturePyramidNetwork + LastLevelMaxPool)."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        laterals = [
            _conv(self.out_channels, 1, use_bias=True, name=f"inner{i}",
                  dtype=self.dtype)(f)
            for i, f in enumerate(feats)
        ]
        # top-down: upsample by 2 (nearest) and add
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
            laterals[i] = laterals[i] + up
        outs = [
            _conv(self.out_channels, 3, use_bias=True, name=f"layer{i}",
                  dtype=self.dtype)(l)
            for i, l in enumerate(laterals)
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]  # [P2, P3, P4, P5, P6]


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = _conv(self.channels, 3, use_bias=True, name="conv",
                     dtype=self.dtype)
        cls = _conv(self.num_anchors, 1, use_bias=True, name="cls_logits",
                    dtype=self.dtype)
        bbox = _conv(self.num_anchors * 4, 1, use_bias=True, name="bbox_pred",
                     dtype=self.dtype)
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(bbox(t))
        return logits, deltas


class BoxHead(nn.Module):
    """TwoMLPHead + FastRCNNPredictor."""

    num_classes: int = 91
    representation: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):  # [R, 7, 7, C]
        R = roi_feats.shape[0]
        # torchvision flattens NCHW — transpose so converted fc6 weights
        # contract the same (C, H, W) order
        x = roi_feats.transpose(0, 3, 1, 2).reshape(R, -1)
        x = nn.relu(nn.Dense(self.representation, name="fc6",
                             dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.representation, name="fc7",
                             dtype=self.dtype)(x))
        scores = nn.Dense(self.num_classes, name="cls_score",
                          dtype=self.dtype)(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred",
                          dtype=self.dtype)(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    """4×(conv3x3+relu) + deconv2x + 1×1 logits (MaskRCNNHeads +
    MaskRCNNPredictor)."""

    num_classes: int = 91
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):  # [R, 14, 14, C]
        x = roi_feats
        for i in range(1, 5):
            x = nn.relu(_conv(self.channels, 3, use_bias=True,
                              name=f"mask_fcn{i}", dtype=self.dtype)(x))
        x = nn.relu(
            nn.ConvTranspose(
                self.channels, (2, 2), strides=(2, 2), padding="VALID",
                transpose_kernel=True,  # torch ConvTranspose2d semantics
                name="conv5_mask",      # (gradient-of-conv: flipped kernel)
                dtype=self.dtype,
            )(x)
        )
        return _conv(self.num_classes, 1, use_bias=True,
                     name="mask_fcn_logits", dtype=self.dtype)(x).astype(
            jnp.float32
        )


@dataclass(frozen=True)
class DetectorConfig:
    """Static-shape inference configuration.

    torchvision test-time defaults: rpn pre_nms 1000/level, post_nms 1000,
    nms 0.7; box score 0.05, nms 0.5, 100 detections. The TPU build uses
    smaller static budgets — the consumer keeps one box per image
    (segment.py:50-58), so a 256/128/32 budget loses nothing measurable
    while keeping the NMS IoU matrices tiny.
    """

    img_size: int = 512
    base_width: int = 64
    layers: tuple[int, ...] = (3, 4, 6, 3)
    fpn_channels: int = 256
    num_classes: int = 91
    anchor_sizes: tuple[float, ...] = (32.0, 64.0, 128.0, 256.0, 512.0)
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    pre_nms_topk: int = 256  # per level
    post_nms_topk: int = 128
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    # Candidate cap BEFORE the class-aware box NMS: the flat candidate set
    # is post_nms_topk × (num_classes−1) = 11,520 boxes, whose pairwise-IoU
    # matrix is 531 MB f32 PER IMAGE — the detector's dominant HBM cost.
    # Greedy NMS picks in score order and keeps ≤ max_detections, so
    # restricting to the top-K scored candidates is exact unless > K−D of
    # the top K are suppressed before D survivors emerge (never observed;
    # K/D = 32). 512² IoU is 1 MB — a 500× traffic cut.
    box_pre_nms_topk: int = 512
    max_detections: int = 16
    mask_out: int = 28
    # "bfloat16" runs body/FPN/RPN/heads matmuls on the MXU at half the HBM
    # traffic; box decode/NMS/mask-paste stay f32. f32 default keeps the
    # converted-weight golden tests bit-stable.
    compute_dtype: str = "float32"

    @property
    def strides(self) -> tuple[int, ...]:
        return (4, 8, 16, 32, 64)


# ImageNet normalization (GeneralizedRCNNTransform defaults)
_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


class MaskRCNN(nn.Module):
    """Inference-oriented Mask R-CNN; __call__ returns padded, masked
    detections: boxes [B,D,4], scores [B,D], labels [B,D], valid [B,D],
    masks [B,D,28,28] (sigmoid probabilities in ROI frame)."""

    cfg: DetectorConfig = field(default_factory=DetectorConfig)

    def setup(self):
        c = self.cfg
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.body = ResNetBody(c.base_width, c.layers, name="body", dtype=dt)
        self.fpn = FPN(c.fpn_channels, name="fpn", dtype=dt)
        self.rpn_head = RPNHead(len(c.aspect_ratios), c.fpn_channels,
                                name="rpn_head", dtype=dt)
        self.box_head = BoxHead(c.num_classes, name="box_head", dtype=dt)
        self.mask_head = MaskHead(c.num_classes, name="mask_head", dtype=dt)

    def features(self, imgs01: jnp.ndarray):
        x = (imgs01 - _MEAN) / _STD
        return self.fpn(self.body(x))

    def __call__(self, imgs01: jnp.ndarray):
        """imgs01: [B, S, S, 3] float32 in 0..1."""
        S = imgs01.shape[1]
        feats = self.features(imgs01)
        logits, deltas = self.rpn_head(feats)
        props, pvalid = self.rpn_proposals(feats, logits, deltas, S)
        return self.detection_heads(feats, props, pvalid, S)

    def rpn_proposals(self, feats, logits, deltas, S: int):
        """Per-image RPN proposal selection, vmapped over the batch.
        Split out of __call__ so the perf harness can attribute stages
        (scripts/perf_detector_r5.py) and alternate pipelines can reuse it."""
        from mmtrs_tpu.models.detection.ops import (
            clip_boxes,
            decode_boxes,
            make_anchors_per_level,
            static_nms,
            topk_static,
        )

        c = self.cfg
        anchors = [
            jnp.asarray(
                make_anchors_per_level(
                    (f.shape[1], f.shape[2]), s, sz, c.aspect_ratios
                )
            )
            for f, s, sz in zip(feats, c.strides, c.anchor_sizes)
        ]

        def proposals_one(logits_b, deltas_b):
            """Per-image RPN: level-wise top-k → decode → joint NMS with
            level groups (torchvision concat-then-batched_nms order).
            Channel layout: our convs are NHWA / NHW(A·4), which flattens
            in the same (H, W, A) order torchvision permutes to."""
            all_boxes, all_scores, all_groups = [], [], []
            for lvl, (lg, dl, an) in enumerate(zip(logits_b, deltas_b, anchors)):
                sc = lg.reshape(-1)  # [HWA]
                dd = dl.reshape(-1, 4)
                k = min(c.pre_nms_topk, sc.shape[0])
                top_sc, top_i = topk_static(sc, k)
                boxes = decode_boxes(dd[top_i], an[top_i])
                boxes = clip_boxes(boxes, (S, S))
                # drop degenerate boxes (torchvision min_size=1e-3)
                ok = (boxes[:, 2] - boxes[:, 0] > 1e-3) & (boxes[:, 3] - boxes[:, 1] > 1e-3)
                top_sc = jnp.where(ok, top_sc, -jnp.inf)
                all_boxes.append(boxes)
                all_scores.append(top_sc)
                all_groups.append(jnp.full((k,), lvl, jnp.int32))
            boxes = jnp.concatenate(all_boxes)
            scores = jnp.concatenate(all_scores)
            groups = jnp.concatenate(all_groups)
            keep, valid = static_nms(
                boxes, scores, c.rpn_nms_thresh, c.post_nms_topk, groups
            )
            return boxes[keep], valid

        return jax.vmap(proposals_one)(logits, deltas)

    def detection_heads(self, feats, props, pvalid, S: int):
        """Box + mask heads over RPN proposals, vmapped over the batch."""
        from mmtrs_tpu.models.detection.ops import (
            clip_boxes,
            decode_boxes,
            roi_align_multilevel,
            static_nms,
            topk_static,
        )

        c = self.cfg

        def heads_one(feats_b, props_b, pvalid_b):
            roi = roi_align_multilevel(
                feats_b[:4], list(c.strides[:4]), props_b, 7
            )
            scores, deltas2 = self.box_head(roi)
            probs = jax.nn.softmax(scores, axis=-1)[:, 1:]  # drop background
            n_cls = c.num_classes - 1
            boxes2 = decode_boxes(
                deltas2.reshape(-1, c.num_classes, 4)[:, 1:],
                props_b[:, None, :],
                weights=(10.0, 10.0, 5.0, 5.0),
            )  # [R, n_cls, 4]
            boxes2 = clip_boxes(boxes2, (S, S))
            flat_boxes = boxes2.reshape(-1, 4)
            flat_scores = jnp.where(
                pvalid_b[:, None], probs, 0.0
            ).reshape(-1)
            flat_labels = jnp.tile(
                jnp.arange(1, c.num_classes, dtype=jnp.int32)[None],
                (props_b.shape[0], 1),
            ).reshape(-1)
            ok = flat_scores > c.box_score_thresh
            small = (flat_boxes[:, 2] - flat_boxes[:, 0] <= 1e-2) | (
                flat_boxes[:, 3] - flat_boxes[:, 1] <= 1e-2
            )
            sc = jnp.where(ok & ~small, flat_scores, -jnp.inf)
            # cap candidates by score BEFORE building the IoU matrix (see
            # box_pre_nms_topk in DetectorConfig — exact for ≤max_detections
            # outputs, turns a 531 MB/image matrix into 1 MB)
            K = min(c.box_pre_nms_topk, sc.shape[0])
            if K < sc.shape[0]:
                sc, top_i = topk_static(sc, K)
                flat_boxes = flat_boxes[top_i]
                flat_scores = flat_scores[top_i]
                flat_labels = flat_labels[top_i]
            keep, valid = static_nms(
                flat_boxes, sc, c.box_nms_thresh, c.max_detections, flat_labels
            )
            det_boxes = flat_boxes[keep]
            det_scores = flat_scores[keep]
            valid = valid & (det_scores > c.box_score_thresh)
            det_scores = jnp.where(valid, det_scores, 0.0)
            det_labels = jnp.where(valid, flat_labels[keep], 0)

            mroi = roi_align_multilevel(
                feats_b[:4], list(c.strides[:4]), det_boxes, 14
            )
            mask_logits = self.mask_head(mroi)  # [D,28,28,num_classes]
            sel = jax.nn.one_hot(det_labels, c.num_classes)
            masks = jax.nn.sigmoid(
                jnp.einsum("dijk,dk->dij", mask_logits, sel)
            )
            return det_boxes, det_scores, det_labels, valid, masks

        return jax.vmap(heads_one)(feats, props, pvalid)
