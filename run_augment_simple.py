#!/usr/bin/env python3
"""Simple folder augmenter CLI (reference run_augment_simple.py →
src/preprocessing/augment_simple.py ``augment_folder_fixed_multiplicity``):
N children per image named <stem>_<k>.jpg, deterministic per source
(hash(stem)^seed, augment_simple.py:175-179).

  python run_augment_simple.py --input_dir imgs --output_dir out --n 10
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--copy_originals", action="store_true")
    args = p.parse_args(argv)

    from PIL import Image

    from mmtrs_tpu.ops.augment import augment_simple
    from mmtrs_tpu.utils.images import list_images, load_image, save_jpeg
    from mmtrs_tpu.utils.rng import keys_for_batch

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = list_images(args.input_dir)
    n_out = 0
    for src in paths:
        a = load_image(src)
        if a.shape[0] != args.img_size or a.shape[1] != args.img_size:
            a = np.asarray(
                Image.fromarray(a).resize((args.img_size, args.img_size), Image.BILINEAR)
            )
        if args.copy_originals:
            save_jpeg(out_dir / f"{src.stem}.jpg", a)
        origin = (hash(src.stem) ^ args.seed) % (2**31)
        batch = np.repeat(a[None].astype(np.float32), args.n, axis=0)
        keys = keys_for_batch(args.seed, np.full(args.n, origin), np.arange(1, args.n + 1))
        import jax.numpy as jnp

        out = augment_simple(jnp.asarray(batch), keys, jnp.arange(args.n))
        out = np.clip(np.asarray(out), 0, 255).astype(np.uint8)
        for k in range(args.n):
            save_jpeg(out_dir / f"{src.stem}_{k + 1}.jpg", out[k])
            n_out += 1
    print(f"wrote {n_out} augmented images to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
