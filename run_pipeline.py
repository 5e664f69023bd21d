#!/usr/bin/env python3
"""Preprocessing CLI — reference surface parity (run_pipeline.py:8-119).

Usage:
  python run_pipeline.py --input_dir data/raw/images --output_dir data/processed/images \
      [--model_path models/segmenter/mask_rcnn_molar.pt] [--no_crop] [--no_rotate] \
      [--batch_size 16]

Differences by design (TPU-first): images are decoded on the host, batched,
and pushed through ONE jit-compiled device pipeline (CLAHE → deskew →
segment-crop with centre fallback → 512²) instead of per-image OpenCV calls.
``--model_path`` takes a converted Mask R-CNN checkpoint (see
download_weights.py --torch_ckpt) and activates the learned JAX detector
(mmtrs_tpu/models/detection); otherwise the classical saliency proposer
(models/segmenter.py) holds the same box contract.

Preserves: JSON log ``preprocess_<ts>.json`` (pipeline.py:156-159), min-edge
<400px rejection (pipeline.py:80), layered fallbacks — enhanced copy → raw
copy — when the pipeline yields nothing (reference run_pipeline.py:74-113).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batched TPU preprocessing pipeline")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_path", default=None,
                   help="converted Mask R-CNN checkpoint (download_weights.py "
                        "--torch_ckpt output); falls back to the saliency "
                        "segmenter when absent/unloadable")
    p.add_argument("--no_crop", action="store_true")
    p.add_argument("--no_rotate", action="store_true")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--log_dir", default="logs")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from mmtrs_tpu.config import PreprocessConfig
    from mmtrs_tpu.preprocess import preprocess_stream
    from mmtrs_tpu.utils.images import iter_batches, list_images, load_image, save_jpeg
    from mmtrs_tpu.utils.io import save_json, timestamp

    cfg = PreprocessConfig(do_crop=not args.no_crop, do_rotate=not args.no_rotate)
    segmenter = None
    if args.model_path and Path(args.model_path).is_dir():
        try:
            from mmtrs_tpu.models.detection import load_detector

            segmenter = load_detector(args.model_path)
            print(f"[info] learned Mask R-CNN segmenter loaded from {args.model_path}")
        except Exception as e:  # graceful degradation (pipeline contract)
            print(f"[warn] could not load detector ({e}); using saliency segmenter")
    in_dir, out_dir = Path(args.input_dir), Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = list_images(in_dir)
    if not paths:
        print(f"[warn] no images found in {in_dir}")
        return 1

    logs, n_ok = [], 0
    t0 = time.perf_counter()

    # decode→compute→fetch overlap (preprocess_stream pipelines the three
    # stages; the reference pays a synchronous round-trip per image,
    # segment.py:30). Batches are padded to batch_size so the jit program
    # shape stays static across the stream.
    def feed():
        for ok_paths, batch, rejected in iter_batches(
            paths, args.batch_size, min_edge=cfg.min_edge_px
        ):
            for r, reason in rejected:
                logs.append({"file": r.name, "status": f"rejected_{reason}"})
            if not len(batch):
                continue
            n_real = len(batch)
            if n_real < args.batch_size:
                pad = np.repeat(batch[-1:], args.batch_size - n_real, axis=0)
                batch = np.concatenate([batch, pad], axis=0)
            yield (ok_paths, n_real), batch

    for (ok_paths, n_real), out, info in preprocess_stream(
        feed(), cfg, segmenter=segmenter
    ):
        for i, p in enumerate(ok_paths[:n_real]):
            dst = out_dir / f"{p.stem}.jpg"
            save_jpeg(dst, out[i], cfg.jpeg_quality)
            logs.append(
                {
                    "file": p.name,
                    "status": "ok",
                    "seg_valid": bool(info["seg_valid"][i]),
                    "deskew_angle": float(info["deskew_angle"][i]),
                    "output": str(dst),
                }
            )
            n_ok += 1
    dt = time.perf_counter() - t0

    # layered fallbacks (reference run_pipeline.py:74-113)
    if n_ok == 0:
        print("[warn] pipeline produced nothing — falling back to enhanced copies")
        for p in paths:
            try:
                img = load_image(p).astype(np.float32)
                # simple contrast stretch as "enhanced" copy
                lo, hi = np.percentile(img, [2, 98])
                img = np.clip((img - lo) * 255.0 / max(hi - lo, 1.0), 0, 255)
                save_jpeg(out_dir / f"{p.stem}.jpg", img)
                logs.append({"file": p.name, "status": "fallback_enhanced"})
                n_ok += 1
            except Exception:
                try:
                    save_jpeg(out_dir / f"{p.stem}.jpg", load_image(p))
                    logs.append({"file": p.name, "status": "fallback_copy"})
                    n_ok += 1
                except Exception:
                    logs.append({"file": p.name, "status": "failed"})

    log_path = Path(args.log_dir) / f"preprocess_{timestamp()}.json"
    save_json(
        {
            "processed": n_ok,
            "total": len(paths),
            "seconds": dt,
            "imgs_per_sec": n_ok / dt if dt > 0 else 0.0,
            "config": {"do_crop": cfg.do_crop, "do_rotate": cfg.do_rotate},
            "entries": logs,
        },
        log_path,
    )
    print(f"Processed {n_ok}/{len(paths)} images in {dt:.2f}s "
          f"({n_ok / dt if dt > 0 else 0:.1f} imgs/s) — log: {log_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
