#!/usr/bin/env python3
"""Segmenter weights bootstrap — reference surface parity (download_weights.py).

The reference downloads the COCO-pretrained torchvision Mask R-CNN state
dict to models/segmenter/mask_rcnn_molar.pt (download_weights.py:14-29;
note it is NOT a fine-tuned molar model despite the filename —
segment.py:18-20). This environment has no network egress and the round-1
TPU segmenter is the classical saliency proposer (mmtrs_tpu/models/
segmenter.py), which needs no weights. This script therefore:

1. writes the segmenter config stub at the reference path so downstream
   tooling that checks for its existence keeps working;
2. if a local torch Mask R-CNN checkpoint is supplied (--torch_ckpt), logs
   it for the future learned-detector conversion path.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="models/segmenter/mask_rcnn_molar.json")
    p.add_argument("--torch_ckpt", default=None)
    args = p.parse_args(argv)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    cfg = {
        "segmenter": "saliency",
        "params": {
            "min_saturation": 40.0,
            "quantile": 0.80,
            "centre_sigma_frac": 0.5,
        },
        "note": "classical saliency proposer; drop-in learned detector "
                "uses the same propose_boxes contract",
    }
    if args.torch_ckpt:
        cfg["torch_ckpt"] = str(Path(args.torch_ckpt).resolve())
    out.write_text(json.dumps(cfg, indent=2))
    print(f"wrote segmenter config to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
