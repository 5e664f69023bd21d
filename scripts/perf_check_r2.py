#!/usr/bin/env python3
"""Round-2 TPU perf/exactness check for the session's kernel changes:

1. CLAHE apply kernel — bit-exactness vs the XLA oracle
   (same assertion as tests/test_pallas_tpu.py) + timing;
2. Precision.HIGH interp matmuls — warp/resize timing + max error vs the
   HIGHEST path;
3. full preprocess+augment chain timing (the bench chain, single program).

Run on the TPU (ambient env): python scripts/perf_check_r2.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, variants, it=8):
    out = fn(variants[0])
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jnp.sum(leaf[(0,) * (leaf.ndim - 2)][:2, :2])))
    t0 = time.perf_counter()
    outs = [fn(variants[i % len(variants)]) for i in range(it)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(jnp.sum(leaf[(0,) * (leaf.ndim - 2)][:2, :2])))
    dt = (time.perf_counter() - t0) / it * 1000
    print(f"{name:36s} {dt:8.2f} ms/batch")
    return dt


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.ops.clahe import clahe as clahe_xla
    from mmtrs_tpu.ops.color import rgb_to_lab
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas
    from mmtrs_tpu.ops.resize import crop_box_resize
    from mmtrs_tpu.ops.warp import warp_affine_shear, hflip3
    from mmtrs_tpu.preprocess import preprocess_batch
    from mmtrs_tpu.utils.rng import keys_for_batch

    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    B = 32
    x0 = synth_batch(B)
    variants = [jnp.clip(jnp.asarray(x0, jnp.float32) + i, 0, 255) for i in range(4)]
    keys = keys_for_batch(42, np.arange(B), np.ones(B))

    # 1. CLAHE Pallas exactness (vs XLA oracle) + timing
    l = rgb_to_lab(variants[0])[..., 0]
    got = np.asarray(clahe_pallas(l))
    want = np.asarray(clahe_xla(l))
    diff = np.abs(got - want).max()
    print(f"CLAHE kernel max |diff| vs XLA oracle: {diff}")
    assert diff == 0.0, "CLAHE kernel broke bit-exactness"
    l_v = [rgb_to_lab(v)[..., 0] for v in variants]
    timeit("clahe_pallas (one-hot apply)", clahe_pallas, l_v)

    # 2. HIGH-precision warp/resize
    m = jnp.tile(hflip3(512.0)[None], (B, 1, 1))
    timeit("warp_affine_shear (HIGH)",
           jax.jit(lambda v: warp_affine_shear(v, m)), variants)
    boxes = jnp.tile(jnp.array([[40.0, 60.0, 460.0, 470.0]]), (B, 1))
    timeit("crop_box_resize (HIGH)",
           jax.jit(lambda v: crop_box_resize(v, boxes, 512)), variants)

    # 3. the bench chain as one program
    @jax.jit
    def chain(v):
        out, _ = preprocess_batch(v, out_size=512, do_crop=True,
                                  do_rotate=True, use_pallas=True)
        return A.augment_batch(out, keys, "legacy")

    dt = timeit("FULL CHAIN (one program)", chain, variants, it=16)
    print(f"=> {B / (dt / 1000):.0f} imgs/s/chip")

    timeit("preprocess only", lambda v: preprocess_batch(
        v, out_size=512, do_crop=True, do_rotate=True, use_pallas=True), variants)
    timeit("augment_legacy only",
           lambda v: A.augment_legacy(v, keys, img_size=512), variants)

    # bf16 VPU probe: is elementwise math 2x in bf16 on this chip, or
    # f32-native? Decides whether a bf16 fast path is worth plumbing.
    def burn(x):
        y = x
        for _ in range(8):
            y = jnp.sin(y) * 1.0001 + jnp.sqrt(jnp.abs(y))
        return y

    vb = [v.astype(jnp.bfloat16) for v in variants]
    timeit("VPU burn f32", jax.jit(burn), variants)
    timeit("VPU burn bf16", jax.jit(burn), vb)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
