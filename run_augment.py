#!/usr/bin/env python3
"""Class-balancing augmentation CLI (reference run_augment.py →
src/preprocessing/augment.py): expand a labelled dataset to a balanced
per-class target count with strength presets light/medium/strong.

  python run_augment.py --table data.csv --image_dir imgs --out_dir out \
      --target_per_class 200 --strength medium --label_col y_majority
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

STRENGTH_TO_PRESET = {"light": "simple", "medium": "ten", "strong": "legacy"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--target_per_class", type=int, default=200)
    p.add_argument("--strength", default="medium", choices=list(STRENGTH_TO_PRESET))
    p.add_argument("--label_col", default="y_majority")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args(argv)

    from PIL import Image

    from mmtrs_tpu.ops.augment import augment_batch
    from mmtrs_tpu.utils.images import load_image, save_jpeg
    from mmtrs_tpu.utils.io import read_table, write_table
    from mmtrs_tpu.utils.rng import keys_for_batch

    df = read_table(args.table).reset_index(drop=True)
    image_dir = Path(args.image_dir)
    out_dir = Path(args.out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    preset = STRENGTH_TO_PRESET[args.strength]

    rng = np.random.default_rng(args.seed)
    rows = []
    for cls, sub in df.groupby(args.label_col):
        need = max(args.target_per_class - len(sub), 0)
        # originals pass through
        for _, r in sub.iterrows():
            rows.append({**r.to_dict(), "aug_idx": 0})
            src = image_dir / str(r["image_name"])
            if src.exists():
                save_jpeg(out_dir / "images" / f"{src.stem}.jpg", load_image(src))
        # balanced expansion
        picks = rng.choice(len(sub), size=need, replace=True) if need else []
        for k, i in enumerate(picks):
            r = sub.iloc[i]
            src = image_dir / str(r["image_name"])
            if not src.exists():
                continue
            a = load_image(src)
            if a.shape[0] != args.img_size or a.shape[1] != args.img_size:
                a = np.asarray(
                    Image.fromarray(a).resize((args.img_size, args.img_size), Image.BILINEAR)
                )
            keys = keys_for_batch(args.seed, [hash(src.stem) % (2**31)], [k + 1])
            out = augment_batch(
                a[None].astype(np.float32), keys, preset,
                aug_idx=np.array([k], np.int32), img_size=args.img_size,
            )
            name = f"{src.stem}_bal{k + 1}.jpg"
            save_jpeg(out_dir / "images" / name,
                      np.clip(np.asarray(out[0]), 0, 255).astype(np.uint8))
            rows.append({**r.to_dict(), "image_name": name, "aug_idx": k + 1})

    import pandas as pd

    write_table(pd.DataFrame(rows), out_dir / "data_balanced.csv")
    print(f"wrote {len(rows)} rows to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
