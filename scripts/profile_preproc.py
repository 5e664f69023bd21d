#!/usr/bin/env python3
"""Per-stage TPU timing of the preprocessing+augmentation chain.

Timing discipline for the axon tunnel (NOTES_ROUND1): dispatch N calls
with DISTINCT inputs, then fetch ONE on-device-reduced scalar from the
last output — block_until_ready does not reliably wait, and device→host
transfers run ~0.2 MB/s.

Usage: python scripts/profile_preproc.py [--batch 32] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name: str, fn, variants, iters: int):
    out = fn(variants[0])  # compile
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jnp.sum(leaf[(0,) * (leaf.ndim - 2)][:2, :2])))
    t0 = time.perf_counter()
    outs = [fn(variants[i % len(variants)]) for i in range(iters)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(jnp.sum(leaf[(0,) * (leaf.ndim - 2)][:2, :2])))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} {dt:8.2f} ms/batch")
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from bench import synth_batch

    from mmtrs_tpu.models.segmenter import SaliencySegmenter
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.ops.clahe import clahe as clahe_xla, clahe_rgb
    from mmtrs_tpu.ops.color import lab_to_rgb, rgb_to_lab
    from mmtrs_tpu.ops.deskew import deskew_batch
    from mmtrs_tpu.ops.resize import crop_box_resize
    from mmtrs_tpu.ops.warp import rotate_shear3, warp_affine_shear, hflip3
    from mmtrs_tpu.preprocess import preprocess_batch
    from mmtrs_tpu.utils.rng import keys_for_batch

    platform = jax.devices()[0].platform
    print(f"platform={platform} batch={args.batch} iters={args.iters}")
    B = args.batch
    x0 = synth_batch(B)
    variants = [jnp.clip(jnp.asarray(x0, jnp.float32) + i, 0, 255) for i in range(4)]
    it = args.iters

    lab = rgb_to_lab(variants[0])
    lab_v = [lab + i * 0.1 for i in range(4)]
    l_v = [v[..., 0] for v in lab_v]
    keys = keys_for_batch(42, np.arange(B), np.ones(B))

    timeit("rgb_to_lab", jax.jit(rgb_to_lab), variants, it)
    timeit("lab_to_rgb", jax.jit(lab_to_rgb), lab_v, it)
    if platform == "tpu":
        from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

        timeit("clahe (pallas)", clahe_pallas, l_v, it)
    timeit("clahe (xla)", clahe_xla, l_v, it)
    timeit("clahe_rgb (full roundtrip)", jax.jit(clahe_rgb), variants, it)
    timeit("deskew_batch", deskew_batch, variants, it)
    timeit(
        "rotate_shear3",
        jax.jit(lambda v: rotate_shear3(v, jnp.full((B,), 7.0))),
        variants, it,
    )
    seg = SaliencySegmenter()
    timeit("segmenter.propose_boxes", seg.propose_boxes, variants, it)
    boxes, _ = seg.propose_boxes(variants[0])
    timeit(
        "crop_box_resize",
        jax.jit(lambda v: crop_box_resize(v, boxes, 512, margin=15.0)),
        variants, it,
    )
    timeit(
        "preprocess_batch (full)",
        lambda v: preprocess_batch(v, use_pallas=platform == "tpu"),
        variants, it,
    )

    m = jnp.tile(hflip3(512.0)[None], (B, 1, 1))
    timeit(
        "warp_affine_shear (hflip)",
        jax.jit(lambda v: warp_affine_shear(v, m)),
        variants, it,
    )
    timeit(
        "elastic", jax.jit(lambda v: A.elastic(v, keys)), variants, it
    )
    timeit(
        "motion_blur", jax.jit(lambda v: A.motion_blur(v, keys)), variants, it
    )
    timeit(
        "gauss_noise",
        jax.jit(lambda v: A.gauss_noise(v, keys, jnp.full((B,), 10.0))),
        variants, it,
    )
    timeit(
        "augment_legacy (full)",
        lambda v: A.augment_legacy(v, keys, img_size=512),
        variants, it,
    )
    timeit(
        "augment_ten (full)",
        lambda v: A.augment_ten(v, keys, jnp.arange(B) % 10),
        variants, it,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
