#!/usr/bin/env python3
"""Segmenter weights bootstrap — reference surface parity (download_weights.py).

The reference downloads the COCO-pretrained torchvision Mask R-CNN state
dict to models/segmenter/mask_rcnn_molar.pt (download_weights.py:14-29;
note it is NOT a fine-tuned molar model despite the filename —
segment.py:18-20). This environment has no network egress, so instead of
downloading this script *converts*: given a local torchvision checkpoint
(--torch_ckpt, a .pt/.pth state_dict), it maps the weights into the JAX
Mask R-CNN (mmtrs_tpu/models/detection) and saves them where
run_pipeline.py --model_path picks them up. Without a checkpoint it writes
the config stub for the classical saliency fallback segmenter.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def convert_torch_ckpt(ckpt_path: Path, out_dir: Path) -> Path:
    """torchvision maskrcnn_resnet50_fpn state_dict → Orbax checkpoint +
    recipe sidecar (consumable by MaskRCNNSegmenter via load_detector)."""
    import torch  # CPU torch is available in this image

    from mmtrs_tpu.models.detection import DetectorConfig, convert_state_dict
    from mmtrs_tpu.utils.checkpoint import save_checkpoint

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    cfg = DetectorConfig()
    variables = convert_state_dict(sd, cfg)
    out = out_dir / "mask_rcnn_molar"
    save_checkpoint(
        out,
        variables,
        recipe={
            "kind": "maskrcnn_resnet50_fpn",
            "img_size": cfg.img_size,
            "num_classes": cfg.num_classes,
            "source": str(ckpt_path),
        },
    )
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="models/segmenter")
    p.add_argument("--torch_ckpt", default=None,
                   help="local torchvision maskrcnn_resnet50_fpn state_dict")
    args = p.parse_args(argv)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.torch_ckpt:
        out = convert_torch_ckpt(Path(args.torch_ckpt), out_dir)
        print(f"converted torchvision weights → {out}")
        return 0

    cfg = {
        "segmenter": "saliency",
        "params": {
            "min_saturation": 40.0,
            "quantile": 0.80,
            "centre_sigma_frac": 0.5,
        },
        "note": "no egress: COCO weights unavailable; classical saliency "
                "proposer active. Supply --torch_ckpt to convert the "
                "torchvision Mask R-CNN into the learned JAX segmenter.",
    }
    stub = out_dir / "mask_rcnn_molar.json"
    stub.write_text(json.dumps(cfg, indent=2))
    print(f"wrote segmenter config to {stub}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
