#!/usr/bin/env python3
"""Benchmark: preprocessing+augmentation throughput on one chip (the
north-star metric).

Measures the full device-side chain BASELINE.json names
("segment+CLAHE+augment"): CLAHE (Pallas on TPU) → deskew (Sobel+PCA+
3-shear) → saliency segment-crop → 512² resize → the `legacy`
augmentation preset (the one the final system uses) — on HBM-resident
synthetic batches, end to end per image.

Prints ONE JSON line:
  {"metric": "preproc_imgs_per_sec_512px", "value": N, "unit": "imgs/s/chip",
   "vs_baseline": N / 5000.0}

Baseline: BASELINE.json north star = 5,000 processed 512px images/s/chip
(the reference's per-image CPU/OpenCV pipeline measures in the tens/s;
its GPU eval throughput was 48-51 imgs/s — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np


def synth_batch(b: int, size: int = 512, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = np.empty((b, size, size, 3), dtype=np.uint8)
    for i in range(b):
        cx, cy = size / 2 + rng.normal(0, size * 0.05, 2)
        a_ = size * rng.uniform(0.22, 0.32)
        b_ = size * rng.uniform(0.15, 0.25)
        mask = ((xs - cx) / a_) ** 2 + ((ys - cy) / b_) ** 2 <= 1.0
        img = np.empty((size, size, 3), dtype=np.float32)
        img[..., 0], img[..., 1], img[..., 2] = 60, 35, 40
        img += rng.normal(0, 6, (size, size, 3))
        img[mask] = np.array([225, 218, 200]) + rng.normal(0, 8, (int(mask.sum()), 3))
        imgs[i] = np.clip(img, 0, 255)
    return imgs


def main() -> int:
    from mmtrs_tpu.ops.augment import augment_batch
    from mmtrs_tpu.preprocess import preprocess_batch
    from mmtrs_tpu.utils.rng import keys_for_batch

    platform = jax.devices()[0].platform
    use_pallas = platform == "tpu"
    # batch 128: per-image cost is batch-invariant (compute-bound) but the
    # per-program dispatch through the axon tunnel is a measured ~2.6 ms
    # floor — batch 32 donates 11% to dispatch, 128 only 3% (256 OOMs: the
    # warp interp matrices are [B,512,512] f32 each)
    batch = 128 if platform == "tpu" else 8
    x = jnp.asarray(synth_batch(batch))
    keys = keys_for_batch(42, np.arange(batch), np.ones(batch))

    # ONE compiled program for the whole chain (the production shape): the
    # inner jits inline, so there is a single dispatch and no forced HBM
    # materialization between preprocess and augment
    @jax.jit
    def fn(v):
        out, info = preprocess_batch(
            v, out_size=512, do_crop=True, do_rotate=True, use_pallas=use_pallas
        )
        out = augment_batch(out, keys, "legacy")
        return out, info
    # distinct inputs defeat any transport-level result caching; fetching a
    # scalar from the LAST output forces completion of the whole in-order
    # stream (block_until_ready alone is unreliable through the axon tunnel)
    variants = [jnp.clip(x + i, 0, 255) for i in range(4)]
    out, info = fn(variants[0])  # compile
    float(np.asarray(out[0, 0, 0, 0]))

    iters = 16 if platform == "tpu" else 3
    t0 = time.perf_counter()
    outs = [fn(variants[i % 4]) for i in range(iters)]
    float(np.asarray(outs[-1][0][0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / iters
    imgs_per_sec = batch / dt

    print(
        json.dumps(
            {
                "metric": "preproc_imgs_per_sec_512px",
                "value": round(float(imgs_per_sec), 1),
                "unit": "imgs/s/chip",
                "vs_baseline": round(float(imgs_per_sec) / 5000.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
