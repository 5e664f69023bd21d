#!/usr/bin/env python3
"""Generate REAL torchvision Mask R-CNN goldens for the detection port.

This environment has no egress and no torchvision, so the script cannot run
here — it is the committed recipe for any egress-ful environment (mirror of
scripts/make_cv2_goldens.py, which caught two real parity bugs in round 2).
Run it wherever ``torchvision`` + network exist:

    python scripts/make_torchvision_goldens.py \
        --out tests/goldens/torchvision_goldens.npz \
        --ckpt_out weights/detection/coco_maskrcnn

It will:
1. build the deterministic synthetic fixture images (tests/synth.py);
2. run torchvision ``maskrcnn_resnet50_fpn(weights=COCO_V1)`` in eval mode
   (the reference's exact segmenter backbone — src/preprocessing/segment.py
   :18-20) and save per-image boxes/scores/labels/binary masks;
3. convert the torch state_dict to the Flax tree (download_weights.py
   --torch_ckpt path) and save an Orbax checkpoint so the skip-gated
   parity test (tests/test_detection.py::test_real_coco_parity) can load
   the SAME weights into mmtrs_tpu.models.detection.MaskRCNN and compare.

The consuming test auto-skips unless both artifacts exist.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/goldens/torchvision_goldens.npz")
    ap.add_argument("--ckpt_out", default="weights/detection/coco_maskrcnn")
    ap.add_argument("--n_images", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    try:
        import torch
        import torchvision
    except ImportError as e:  # pragma: no cover - this env has no torchvision
        print(f"[goldens] torchvision unavailable here ({e}); run this "
              "script in an egress-ful environment.")
        return 1

    from tests.synth import synth_images

    imgs = synth_images(args.n_images, args.size, seed=99)

    weights = torchvision.models.detection.MaskRCNN_ResNet50_FPN_Weights.COCO_V1
    model = torchvision.models.detection.maskrcnn_resnet50_fpn(weights=weights)
    model.eval()

    payload: dict[str, np.ndarray] = {"images": imgs}
    with torch.no_grad():
        for i, im in enumerate(imgs):
            t = torch.from_numpy(im.astype(np.float32) / 255.0).permute(2, 0, 1)
            (out,) = model([t])
            payload[f"boxes_{i}"] = out["boxes"].numpy()
            payload[f"scores_{i}"] = out["scores"].numpy()
            payload[f"labels_{i}"] = out["labels"].numpy()
            payload[f"masks_{i}"] = (out["masks"][:, 0].numpy() > 0.5).astype(
                np.uint8
            )
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(outp, **payload)
    print(f"[goldens] wrote {outp} ({outp.stat().st_size/1e6:.1f} MB)")

    # convert + save the weights so the parity test can load them
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(model.state_dict(), f.name)
        from download_weights import convert_torch_ckpt

        convert_torch_ckpt(Path(f.name), Path(args.ckpt_out))
    print(f"[goldens] converted COCO weights → {args.ckpt_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
