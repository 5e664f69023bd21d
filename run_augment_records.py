#!/usr/bin/env python3
"""Record-keeping augmentation CLI — reference surface parity
(run_augment_records.py:10-39 → augment_records.py:657-699).

  python run_augment_records.py --table data/data_processed.csv \
      --image_dir data/processed/images --out_dir data/augmented \
      --n_aug 10 --preset ten --seed 42

Reads the metadata table, generates N augmented children per original in
device batches through the fused kernels, writes images + CSV(+XLSX) table
with the image_id/origin_id/aug_idx/split lineage schema.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_aug", type=int, default=10)
    p.add_argument("--preset", default="ten", choices=["legacy", "ten", "simple", "none"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--test_frac", type=float, default=0.2)
    p.add_argument("--val_frac", type=float, default=0.0)
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=32)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from PIL import Image

    from mmtrs_tpu.data.records import build_augmented_table
    from mmtrs_tpu.utils.images import load_image, save_jpeg
    from mmtrs_tpu.utils.io import read_table, write_table

    df = read_table(args.table)
    image_dir = Path(args.image_dir)
    out_dir = Path(args.out_dir)
    img_out = out_dir / "images"
    img_out.mkdir(parents=True, exist_ok=True)

    imgs, keep = [], []
    for i, name in enumerate(df["image_name"]):
        p = image_dir / str(name)
        if not p.exists():
            alt = image_dir / (Path(str(name)).stem + ".jpg")
            p = alt if alt.exists() else p
        if not p.exists():
            continue
        a = load_image(p)
        if a.shape[0] != args.img_size or a.shape[1] != args.img_size:
            a = np.asarray(
                Image.fromarray(a).resize((args.img_size, args.img_size), Image.BILINEAR)
            )
        imgs.append(a)
        keep.append(i)
    df = df.iloc[keep].reset_index(drop=True)
    if not len(df):
        print("[error] no images matched the table")
        return 1

    table, _ = build_augmented_table(
        df,
        np.stack(imgs),
        n_aug=args.n_aug,
        preset=args.preset,
        seed=args.seed,
        test_frac=args.test_frac,
        val_frac=args.val_frac,
        batch_size=args.batch_size,
        image_writer=lambda name, img: save_jpeg(img_out / name, img),
    )
    written = write_table(table, out_dir / "data_dl_augmented.csv")
    print(f"wrote {len(table)} rows ({args.n_aug}× aug, preset={args.preset}) → {written}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
