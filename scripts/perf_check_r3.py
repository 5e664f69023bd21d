#!/usr/bin/env python3
"""Round-3 on-chip perf A/B: sequential vs fused chain, fastmath LAB vs the
exact pow/cbrt forms, and solo stage timings at bench batch size.

Run on the TPU (ambient env): python scripts/perf_check_r3.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, variants, iters=8):
    out = fn(variants[0])
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1])))
    t0 = time.perf_counter()
    outs = [fn(variants[i % len(variants)]) for i in range(iters)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1])))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:44s} {dt:8.2f} ms")
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch

    sys.path.insert(0, str(_REPO))
    from bench import synth_batch
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.ops.color import lab_to_rgb, rgb_to_lab
    from mmtrs_tpu.ops.resize import crop_box_resize, crop_warp_fused
    from mmtrs_tpu.ops.warp import warp_affine_shear
    from mmtrs_tpu.preprocess import preprocess_augment_batch, preprocess_batch
    from mmtrs_tpu.utils.rng import keys_for_batch

    platform = jax.devices()[0].platform
    use_pallas = platform == "tpu"
    print(f"platform={platform} batch={B}")
    x = jnp.asarray(synth_batch(B))
    keys = keys_for_batch(42, np.arange(B), np.ones(B))
    variants = [jnp.clip(x + i, 0, 255).astype(jnp.float32) for i in range(4)]

    # chains
    @jax.jit
    def seq(v):
        out, info = preprocess_batch(
            v, out_size=512, do_crop=True, do_rotate=True, use_pallas=use_pallas
        )
        return A.augment_batch(out, keys, "legacy"), info

    @jax.jit
    def fused(v):
        return preprocess_augment_batch(
            v, keys, out_size=512, do_rotate=True, use_pallas=use_pallas
        )

    t_seq = timeit("sequential chain (preproc + legacy)", seq, variants)
    t_fused = timeit("fused chain (crop∘warp composed)", fused, variants)
    print(f"  -> fused vs sequential: {t_seq - t_fused:+.2f} ms")

    # LAB roundtrip: fastmath (current) vs exact pow/cbrt
    @jax.jit
    def lab_fast(v):
        return lab_to_rgb(rgb_to_lab(v))

    def exact_s2l(c):
        return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)

    def exact_l2s(y):
        y = jnp.maximum(y, 0.0)
        return jnp.where(y <= 0.0031308, 12.92 * y, 1.055 * y ** (1 / 2.4) - 0.055)

    import mmtrs_tpu.ops.color as C

    @jax.jit
    def lab_exact(v):
        # rebuild the roundtrip with exact transcendentals (monkeypatch-free:
        # call internals with the exact fns swapped in)
        old_s2l, old_l2s, old_cbrt = C._srgb_to_linear, C._linear_to_srgb, C._cbrt_fast
        try:
            C._srgb_to_linear = exact_s2l
            C._linear_to_srgb = exact_l2s
            C._cbrt_fast = jnp.cbrt
            return C.lab_to_rgb(C.rgb_to_lab(v))
        finally:
            C._srgb_to_linear, C._linear_to_srgb, C._cbrt_fast = old_s2l, old_l2s, old_cbrt

    timeit("LAB roundtrip fastmath", lab_fast, variants)
    timeit("LAB roundtrip exact pow/cbrt", lab_exact, variants)

    # solo resample stages
    boxes = jnp.tile(jnp.array([[80.0, 90.0, 430.0, 400.0]]), (B, 1))
    mats = A.legacy_geo_mats(keys, 512, 512)
    timeit("crop_box_resize solo", lambda v: crop_box_resize(v, boxes, 512), variants)
    timeit("warp_affine_shear solo", lambda v: warp_affine_shear(v, mats), variants)
    timeit("crop_warp_fused solo",
           lambda v: crop_warp_fused(v, boxes, mats, 512), variants)

    @jax.jit
    def phot(v):
        return A.legacy_photometrics(v, keys, 512)

    timeit("legacy photometrics solo", phot, variants)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
