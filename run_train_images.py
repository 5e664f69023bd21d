#!/usr/bin/env python3
"""Vision trainer dispatcher — reference surface parity (run_train_images.py).

  python run_train_images.py --task hard --model efficientnet_b3 --img_size 512 \
      --data data/dl_augmented.csv --image_dir data/processed/images \
      --epochs 30 --batch_size 16 --out weights/vision_hard

Unlike the reference (which shells out to models/vision/train_*.py via
subprocess, run_train_images.py:30-49), this dispatches in-process to the
data-parallel JAX trainers.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["hard", "soft"], default="hard")
    p.add_argument("--model", default=None,
                   help="default: efficientnet_b3 (hard) / convnext_tiny (soft)")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--data", required=True, help="metadata CSV/XLSX")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--val_frac", type=float, default=0.15)
    p.add_argument("--aug", default="none", choices=["none", "legacy", "ten", "simple"])
    p.add_argument("--out", default="weights/vision")
    return p


def load_vision_dataset(df, image_dir, img_size):
    from mmtrs_tpu.train.vision import VisionData
    from mmtrs_tpu.utils.images import load_image
    from PIL import Image

    imgs = []
    keep = []
    for i, name in enumerate(df["image_name"]):
        p = Path(image_dir) / str(name)
        if not p.exists():
            continue
        a = load_image(p)
        if a.shape[0] != img_size or a.shape[1] != img_size:
            a = np.asarray(
                Image.fromarray(a).resize((img_size, img_size), Image.BILINEAR)
            )
        imgs.append(a)
        keep.append(i)
    sub = df.iloc[keep].reset_index(drop=True)
    return VisionData(
        images=np.stack(imgs),
        y=sub["y_majority"].astype(int).to_numpy(),
        p=sub.get("p_indirect", sub["y_majority"]).astype(float).to_numpy(),
        w=(sub["weight"].astype(float).to_numpy()
           if "weight" in sub else np.ones(len(sub), np.float32)),
        origin_id=(sub["origin_id"].to_numpy() if "origin_id" in sub
                   else np.arange(len(sub))),
        aug_idx=sub["aug_idx"].to_numpy() if "aug_idx" in sub else None,
    ), sub


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from mmtrs_tpu.config import VisionTrainConfig
    from mmtrs_tpu.data.splits import grouped_train_test_split
    from mmtrs_tpu.train.vision import VisionTrainer
    from mmtrs_tpu.utils.checkpoint import save_checkpoint
    from mmtrs_tpu.utils.io import read_table, save_json

    model = args.model or ("efficientnet_b3" if args.task == "hard" else "convnext_tiny")
    df = read_table(args.data)
    df["split"] = df.get("split", "train").astype(str).str.lower()
    data_all, sub = load_vision_dataset(
        df[df["split"] != "test"].reset_index(drop=True), args.image_dir, args.img_size
    )
    # grouped val split on origin_id, else stratified (_split_train_val,
    # train_hard.py:20-34)
    tr, va = grouped_train_test_split(sub, args.val_frac, args.seed)
    slice_data = lambda d, idx: type(d)(
        images=d.images[idx], y=d.y[idx], p=d.p[idx], w=d.w[idx],
        origin_id=d.origin_id[idx],
        aug_idx=None if d.aug_idx is None else d.aug_idx[idx],
    )
    train, val = slice_data(data_all, tr), slice_data(data_all, va)

    cfg = VisionTrainConfig(
        model_name=model, img_size=args.img_size, task=args.task,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr, seed=args.seed,
    )
    trainer = VisionTrainer(cfg, aug_preset=args.aug)
    state, history = trainer.fit(train, val)
    thr = trainer.tune_threshold_f1(state, val)

    out = Path(args.out)
    save_checkpoint(
        out / f"vision_{args.task}_best",
        {"params": state.params, "batch_stats": state.batch_stats},
        recipe={"model_name": model, "img_size": args.img_size, "task": args.task,
                "thr": thr},
    )
    save_json({"history": history, "thr": thr}, out / f"{args.task}_summary.json")
    print(f"saved {out}/vision_{args.task}_best (thr={thr:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
