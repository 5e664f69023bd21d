"""torchvision maskrcnn_resnet50_fpn → Flax weight conversion.

The reference downloads the COCO-pretrained torchvision checkpoint
(download_weights.py:14-29) and loads it into torchvision's model
(segment.py:18-20). This module converts that state_dict into the param
tree of :class:`mmtrs_tpu.models.detection.modules.MaskRCNN`.

No egress exists in this environment and torchvision is not installed, so
the mapping is validated structurally instead: ``expected_torch_keys``
enumerates every torchvision parameter name/shape for a config,
``fake_state_dict`` builds a synthetic checkpoint with those exact
names/shapes, and tests assert that conversion consumes every key and
round-trips values bit-exactly. When a real ``mask_rcnn_molar.pt``
state_dict is available, ``convert_state_dict`` ingests it unchanged.

Layout rules:
- conv weights OIHW → HWIO;
- ConvTranspose2d weights (in, out, kh, kw) → (kh, kw, in, out);
- Linear weights (out, in) → (in, out);
- FrozenBatchNorm2d weight/bias/running_mean/running_var map 1:1;
- fc6 consumes NCHW-flattened ROI features — BoxHead transposes to match.

Both naming eras of torchvision are accepted: bare module names
(``backbone.fpn.inner_blocks.0.weight``) and Conv2dNormActivation-wrapped
(``backbone.fpn.inner_blocks.0.0.weight``).
"""

from __future__ import annotations

import numpy as np

from mmtrs_tpu.models.detection.modules import DetectorConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_w(x):
    return _np(x).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _deconv_w(x):
    # (in,out,kh,kw) → (kh,kw,out,in): flax ConvTranspose(transpose_kernel=
    # True) expects (spatial..., features, in_features) and flips/swaps
    # internally to reproduce torch's gradient-of-conv exactly
    return _np(x).transpose(2, 3, 1, 0)


def _fc_w(x):
    return _np(x).T


def _bn(sd, prefix) -> dict:
    return {
        "weight": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "running_mean": _np(sd[f"{prefix}.running_mean"]),
        "running_var": _np(sd[f"{prefix}.running_var"]),
    }


def _pick(sd, *candidates):
    for c in candidates:
        if c in sd:
            return c
    raise KeyError(f"none of {candidates} in state_dict")


def convert_state_dict(sd: dict, cfg: DetectorConfig = DetectorConfig()) -> dict:
    """torchvision state_dict (tensors or ndarrays) → {'params': tree}."""
    used: set[str] = set()

    def take(key):
        used.add(key)
        return sd[key]

    def take_any(*cands):
        return take(_pick(sd, *cands))

    def bn(prefix):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            used.add(f"{prefix}.{suf}")
        return _bn(sd, prefix)

    p: dict = {}

    # --- backbone body -----------------------------------------------------
    body: dict = {
        "conv1": {"kernel": _conv_w(take("backbone.body.conv1.weight"))},
        "bn1": bn("backbone.body.bn1"),
    }
    for li, blocks in enumerate(cfg.layers):
        for bi in range(blocks):
            t = f"backbone.body.layer{li + 1}.{bi}"
            blk = {
                "conv1": {"kernel": _conv_w(take(f"{t}.conv1.weight"))},
                "bn1": bn(f"{t}.bn1"),
                "conv2": {"kernel": _conv_w(take(f"{t}.conv2.weight"))},
                "bn2": bn(f"{t}.bn2"),
                "conv3": {"kernel": _conv_w(take(f"{t}.conv3.weight"))},
                "bn3": bn(f"{t}.bn3"),
            }
            if bi == 0:
                blk["downsample_conv"] = {
                    "kernel": _conv_w(take(f"{t}.downsample.0.weight"))
                }
                blk["downsample_bn"] = bn(f"{t}.downsample.1")
            body[f"layer{li + 1}_{bi}"] = blk
    p["body"] = body

    # --- FPN ----------------------------------------------------------------
    fpn: dict = {}
    for i in range(4):
        wk = _pick(
            sd,
            f"backbone.fpn.inner_blocks.{i}.weight",
            f"backbone.fpn.inner_blocks.{i}.0.weight",
        )
        fpn[f"inner{i}"] = {
            "kernel": _conv_w(take(wk)),
            "bias": _np(take(wk.replace("weight", "bias"))),
        }
        wk = _pick(
            sd,
            f"backbone.fpn.layer_blocks.{i}.weight",
            f"backbone.fpn.layer_blocks.{i}.0.weight",
        )
        fpn[f"layer{i}"] = {
            "kernel": _conv_w(take(wk)),
            "bias": _np(take(wk.replace("weight", "bias"))),
        }
    p["fpn"] = fpn

    # --- RPN head ------------------------------------------------------------
    conv_w = _pick(sd, "rpn.head.conv.weight", "rpn.head.conv.0.0.weight")
    p["rpn_head"] = {
        "conv": {
            "kernel": _conv_w(take(conv_w)),
            "bias": _np(take(conv_w.replace("weight", "bias"))),
        },
        "cls_logits": {
            "kernel": _conv_w(take("rpn.head.cls_logits.weight")),
            "bias": _np(take("rpn.head.cls_logits.bias")),
        },
        "bbox_pred": {
            "kernel": _conv_w(take("rpn.head.bbox_pred.weight")),
            "bias": _np(take("rpn.head.bbox_pred.bias")),
        },
    }

    # --- box head -------------------------------------------------------------
    p["box_head"] = {
        "fc6": {
            "kernel": _fc_w(take("roi_heads.box_head.fc6.weight")),
            "bias": _np(take("roi_heads.box_head.fc6.bias")),
        },
        "fc7": {
            "kernel": _fc_w(take("roi_heads.box_head.fc7.weight")),
            "bias": _np(take("roi_heads.box_head.fc7.bias")),
        },
        "cls_score": {
            "kernel": _fc_w(take("roi_heads.box_predictor.cls_score.weight")),
            "bias": _np(take("roi_heads.box_predictor.cls_score.bias")),
        },
        "bbox_pred": {
            "kernel": _fc_w(take("roi_heads.box_predictor.bbox_pred.weight")),
            "bias": _np(take("roi_heads.box_predictor.bbox_pred.bias")),
        },
    }

    # --- mask head ---------------------------------------------------------------
    mh: dict = {}
    for i in range(1, 5):
        wk = _pick(
            sd,
            f"roi_heads.mask_head.mask_fcn{i}.weight",
            f"roi_heads.mask_head.{i - 1}.0.weight",
        )
        mh[f"mask_fcn{i}"] = {
            "kernel": _conv_w(take(wk)),
            "bias": _np(take(wk.replace("weight", "bias"))),
        }
    mh["conv5_mask"] = {
        "kernel": _deconv_w(take("roi_heads.mask_predictor.conv5_mask.weight")),
        "bias": _np(take("roi_heads.mask_predictor.conv5_mask.bias")),
    }
    mh["mask_fcn_logits"] = {
        "kernel": _conv_w(take("roi_heads.mask_predictor.mask_fcn_logits.weight")),
        "bias": _np(take("roi_heads.mask_predictor.mask_fcn_logits.bias")),
    }
    p["mask_head"] = mh

    leftovers = {
        k for k in sd
        if k not in used and "anchor" not in k and "num_batches_tracked" not in k
    }
    if leftovers:
        raise ValueError(f"unconsumed torchvision keys: {sorted(leftovers)[:8]} ...")
    return {"params": p}


def expected_torch_keys(cfg: DetectorConfig = DetectorConfig()) -> dict[str, tuple]:
    """Every torchvision parameter name → shape (classic naming era)."""
    w = cfg.base_width
    ks: dict[str, tuple] = {
        "backbone.body.conv1.weight": (w, 3, 7, 7),
    }
    for suf in ("weight", "bias", "running_mean", "running_var"):
        ks[f"backbone.body.bn1.{suf}"] = (w,)
    in_ch = w
    for li, blocks in enumerate(cfg.layers):
        width = w * (2 ** li)
        for bi in range(blocks):
            t = f"backbone.body.layer{li + 1}.{bi}"
            ks[f"{t}.conv1.weight"] = (width, in_ch if bi == 0 else width * 4, 1, 1)
            ks[f"{t}.conv2.weight"] = (width, width, 3, 3)
            ks[f"{t}.conv3.weight"] = (width * 4, width, 1, 1)
            for j, ww in (("1", width), ("2", width), ("3", width * 4)):
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    ks[f"{t}.bn{j}.{suf}"] = (ww,)
            if bi == 0:
                ks[f"{t}.downsample.0.weight"] = (width * 4, in_ch, 1, 1)
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    ks[f"{t}.downsample.1.{suf}"] = (width * 4,)
        in_ch = width * 4

    C = cfg.fpn_channels
    for i in range(4):
        cin = w * (2 ** i) * 4
        ks[f"backbone.fpn.inner_blocks.{i}.weight"] = (C, cin, 1, 1)
        ks[f"backbone.fpn.inner_blocks.{i}.bias"] = (C,)
        ks[f"backbone.fpn.layer_blocks.{i}.weight"] = (C, C, 3, 3)
        ks[f"backbone.fpn.layer_blocks.{i}.bias"] = (C,)

    A = len(cfg.aspect_ratios)
    ks["rpn.head.conv.weight"] = (C, C, 3, 3)
    ks["rpn.head.conv.bias"] = (C,)
    ks["rpn.head.cls_logits.weight"] = (A, C, 1, 1)
    ks["rpn.head.cls_logits.bias"] = (A,)
    ks["rpn.head.bbox_pred.weight"] = (A * 4, C, 1, 1)
    ks["rpn.head.bbox_pred.bias"] = (A * 4,)

    R = 1024
    ks["roi_heads.box_head.fc6.weight"] = (R, C * 7 * 7)
    ks["roi_heads.box_head.fc6.bias"] = (R,)
    ks["roi_heads.box_head.fc7.weight"] = (R, R)
    ks["roi_heads.box_head.fc7.bias"] = (R,)
    ks["roi_heads.box_predictor.cls_score.weight"] = (cfg.num_classes, R)
    ks["roi_heads.box_predictor.cls_score.bias"] = (cfg.num_classes,)
    ks["roi_heads.box_predictor.bbox_pred.weight"] = (cfg.num_classes * 4, R)
    ks["roi_heads.box_predictor.bbox_pred.bias"] = (cfg.num_classes * 4,)

    for i in range(1, 5):
        ks[f"roi_heads.mask_head.mask_fcn{i}.weight"] = (C, C, 3, 3)
        ks[f"roi_heads.mask_head.mask_fcn{i}.bias"] = (C,)
    ks["roi_heads.mask_predictor.conv5_mask.weight"] = (C, C, 2, 2)
    ks["roi_heads.mask_predictor.conv5_mask.bias"] = (C,)
    ks["roi_heads.mask_predictor.mask_fcn_logits.weight"] = (cfg.num_classes, C, 1, 1)
    ks["roi_heads.mask_predictor.mask_fcn_logits.bias"] = (cfg.num_classes,)
    return ks


def fake_state_dict(cfg: DetectorConfig = DetectorConfig(), seed: int = 0) -> dict:
    """Synthetic checkpoint with torchvision's exact names/shapes (random
    values) — the hermetic stand-in for the real COCO download."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in expected_torch_keys(cfg).items():
        if k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            sd[k] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd
