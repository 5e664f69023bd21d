#!/usr/bin/env python3
"""Per-sub-op profile of the legacy photometrics stage at bench batch size.

The round-3 perf_check showed legacy_photometrics solo ≈ 36 ms of the
~80 ms b128 chain — the dominant stage. This breaks it down: each sub-op
solo at its subset cap, plus the subset_apply/cond plumbing overhead
itself (identity op), so optimization effort lands where the time is.

Run on the TPU (ambient env): python scripts/profile_photometrics.py
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
    print(f"{label:52s} {dt:8.2f} ms")
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch

    from bench import synth_batch
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.ops.clahe import clahe_rgb
    from mmtrs_tpu.utils.rng import keys_for_batch

    platform = jax.devices()[0].platform
    print(f"platform={platform} batch={B}")
    x = jnp.asarray(synth_batch(B)).astype(jnp.float32)
    keys = keys_for_batch(42, np.arange(B), np.ones(B))
    variants = [jnp.clip(x + i, 0, 255) for i in range(4)]

    cap16 = A._subset_cap(B, 0.5 / 3.0)
    cap20 = A._subset_cap(B, 0.2)
    cap10 = A._subset_cap(B, 0.1)
    print(f"caps: OneOf/3={cap16} noise={cap20} blur/elastic={cap10}")

    variants_u8 = [v.astype(jnp.uint8) for v in variants]
    timeit("photometrics FULL", jax.jit(lambda v: A.legacy_photometrics(v, keys, 512)), variants_u8)

    if platform == "tpu":
        from mmtrs_tpu.ops.pallas.photometric_kernel import photometrics_fused_pallas
        from mmtrs_tpu.ops.pallas.lab_kernels import clahe_lab_fused

        params, nk, _ = A.photometric_params_legacy(keys, 512, 512, 21)
        seeds = jax.vmap(
            lambda k: jax.random.bits(k, (), jnp.uint32).astype(jnp.int32)
        )(nk)
        timeit("fused pointwise kernel solo (u8 in/out)",
               jax.jit(lambda v: photometrics_fused_pallas(v, params, seeds, 21)),
               variants_u8)
        cap = A._subset_cap(B, 0.5 / 3.0)
        timeit(f"clahe_lab_fused sub[{cap}] (u8 planar)",
               jax.jit(lambda v: clahe_lab_fused(v[:cap], clip=2.0, tiles=(8, 8))),
               variants_u8)

    # plumbing overhead: subset_apply with an identity op, one gated stage
    on = jnp.arange(B) < (B // 6)
    timeit("subset_apply(identity) cond overhead x1",
           jax.jit(lambda v: A.subset_apply(lambda s: s, v, on, cap16)), variants)

    bvec = jnp.full((B,), 0.05)
    timeit("brightness_contrast full", jax.jit(lambda v: A.brightness_contrast(v, bvec, bvec)), variants)

    sub16 = [v[:cap16] for v in variants]
    dh = jnp.full((cap16,), 3.0)
    timeit(f"hsv_shift sub[{cap16}]", jax.jit(lambda v: A.hsv_shift(v, dh, dh, dh)), sub16)
    timeit(f"clahe_rgb sub[{cap16}]", jax.jit(lambda v: clahe_rgb(v, clip=2.0, tiles=(8, 8))), sub16)

    sub20 = [v[:cap20] for v in variants]
    nk = keys[:cap20]
    var = jnp.full((cap20,), 10.0)
    timeit(f"gauss_noise sub[{cap20}]", jax.jit(lambda v: A.gauss_noise(v, nk, var)), sub20)

    sub10 = [v[:cap10] for v in variants]
    bk = keys[:cap10]
    timeit(f"motion_blur sub[{cap10}]", jax.jit(lambda v: A.motion_blur(v, bk, 5)), sub10)
    timeit(f"elastic sub[{cap10}]", jax.jit(lambda v: A.elastic(v, bk, 10.0, 5.0)), sub10)

    dk = keys
    timeit("coarse_dropout full", jax.jit(lambda v: A.coarse_dropout(v, dk, 21)), variants)
    timeit("clip pass", jax.jit(lambda v: jnp.clip(v, 0.0, 255.0)), variants)

    # raw bandwidth yardsticks
    timeit("x+1 (1 rw pass)", jax.jit(lambda v: v + 1.0), variants)
    timeit("normal[B,512,512,3] threefry", jax.jit(
        lambda v: v + jax.random.normal(jax.random.PRNGKey(0), v.shape)), variants)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
