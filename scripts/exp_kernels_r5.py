#!/usr/bin/env python3
"""Round-5 kernel micro-profile #2: split the two biggest chain stages.

LAB stage (12.05 ms @b128): forward kernel vs CLAHE hist+apply vs backward
kernel — is the CLAHE apply's 256-compare one-hot the VPU hog?

photometrics (14.47): motion_blur grouped-conv vs direct 25-tap stencil;
elastic full-res field generation vs ¼-res field + bilinear upsample.

Run on the TPU:  python scripts/exp_kernels_r5.py [batch]
"""

from __future__ import annotations

import json
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


def _fetch_scalar(out):
    leaf = jax.tree.leaves(out)[0]
    if leaf.ndim >= 2:
        leaf = leaf[(0,) * (leaf.ndim - 2)][:2, :2]
    float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))


def timeit(name, fn, arg_sets, it=16):
    t0 = time.perf_counter()
    _fetch_scalar(fn(*arg_sets[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(it)]
    _fetch_scalar(outs[-1])
    dt = (time.perf_counter() - t0) / it * 1000
    print(f"{name:52s} {dt:8.2f} ms   [compile {compile_s:.0f}s]", flush=True)
    return dt


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.ops.pallas import lab_kernels as LK
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas
    from mmtrs_tpu.utils.rng import keys_for_batch

    assert jax.devices()[0].platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = 512
    x0 = jnp.asarray(synth_batch(B))
    variants = [jnp.clip(x0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
                for i in range(4)]
    args = [(v,) for v in variants]
    keys = keys_for_batch(42, np.arange(B), np.ones(B))
    res = {}

    # --- LAB stage splits ----------------------------------------------------
    def fwd_only(v):
        xp = v.transpose(0, 3, 1, 2)
        return LK._plane_call(
            LK._fwd_kernel, (xp[:, 0], xp[:, 1], xp[:, 2]),
            (jnp.int8, jnp.int8, jnp.uint8), S, S, B, False,
        )
    res["lab_fwd_only"] = timeit("L1 fwd kernel (planarize + fwd)",
                                 jax.jit(fwd_only), args)

    lq0 = jax.jit(fwd_only)(variants[0])[2]
    lqs = [jnp.clip(lq0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
           for i in range(4)]
    res["clahe_only"] = timeit(
        "L2 clahe_pallas u8 (hist + apply)",
        jax.jit(lambda l: clahe_pallas(l, out_dtype=jnp.uint8)),
        [(l,) for l in lqs])

    def full_fused(v):
        return LK.clahe_lab_fused(v, planar_out=True)
    res["lab_full"] = timeit("L3 clahe_lab_fused (fwd+clahe+bwd)",
                             jax.jit(full_fused), args)

    # --- motion blur: grouped conv vs direct stencil -------------------------
    from mmtrs_tpu.ops import augment as A

    sub = variants[0][:32].astype(jnp.float32)
    subs = [jnp.clip(sub + i, 0, 255) for i in range(4)]
    bkeys = keys[:32]
    res["blur_conv"] = timeit(
        "B1 motion_blur grouped-conv (32 rows f32)",
        jax.jit(lambda v: A.motion_blur(v, bkeys, 5)), [(s,) for s in subs])

    def blur_stencil(v):
        k = 5
        def kern(key):
            r = (k - 1) / 2.0
            theta = jax.random.uniform(key, (), minval=0.0, maxval=jnp.pi)
            t = jnp.linspace(-r, r, k)
            px = t * jnp.cos(theta) + r
            py = t * jnp.sin(theta) + r
            x0_ = jnp.floor(px).astype(jnp.int32)
            y0_ = jnp.floor(py).astype(jnp.int32)
            fx = px - x0_
            fy = py - y0_
            kernel = jnp.zeros((k + 1, k + 1))
            kernel = kernel.at[y0_, x0_].add((1 - fy) * (1 - fx))
            kernel = kernel.at[y0_, x0_ + 1].add((1 - fy) * fx)
            kernel = kernel.at[y0_ + 1, x0_].add(fy * (1 - fx))
            kernel = kernel.at[y0_ + 1, x0_ + 1].add(fy * fx)
            kernel = kernel[:k, :k]
            return kernel / jnp.sum(kernel)

        kernels = jax.vmap(kern)(bkeys)  # [b,k,k]
        p = (k - 1) // 2
        xpad = jnp.pad(v, ((0, 0), (p, k // 2), (p, k // 2), (0, 0)),
                       mode="edge")
        Hs, Ws = v.shape[1], v.shape[2]
        out = jnp.zeros_like(v)
        for dy in range(k):
            for dx in range(k):
                out = out + kernels[:, dy, dx][:, None, None, None] * \
                    xpad[:, dy:dy + Hs, dx:dx + Ws, :]
        return out
    res["blur_stencil"] = timeit("B2 motion_blur 25-tap stencil",
                                 jax.jit(blur_stencil), [(s,) for s in subs])

    # --- elastic: full-res fields vs quarter-res + upsample ------------------
    usub = variants[0][:32]
    usubs = [jnp.clip(usub.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
             for i in range(4)]
    res["elastic_full"] = timeit(
        "E1 elastic full-res fields (32 rows u8)",
        jax.jit(lambda v: A.elastic(v, bkeys, 10.0, 5.0)),
        [(s,) for s in usubs])

    def elastic_lowres(v, alpha=10.0, sigma=5.0):
        Bc, H, W, C = v.shape
        q = 4
        h, w = H // q, W // q
        radius = int(3 * sigma / q)
        xs = np.arange(-radius, radius + 1, dtype=np.float64)
        kk = np.exp(-(xs ** 2) / (2 * (sigma / q) ** 2))
        kk = (kk / kk.sum()).astype(np.float32)

        def band(n):
            i = np.arange(n)
            m = np.zeros((n, n), np.float32)
            for d in range(-radius, radius + 1):
                j = np.clip(i + d, 0, n - 1)
                m[i, j] += kk[d + radius]
            return jnp.asarray(m)

        my, mx = band(h), band(w)

        def raw(key):
            k1, k2 = jax.random.split(key)
            return (jax.random.uniform(k1, (h, w), minval=-1.0, maxval=1.0),
                    jax.random.uniform(k2, (h, w), minval=-1.0, maxval=1.0))

        rdx, rdy = jax.vmap(raw)(bkeys)
        smooth = lambda f: jnp.einsum("hi,biw->bhw", my, f) @ mx.T
        from mmtrs_tpu.ops.resize import resize_bilinear
        up = lambda f: resize_bilinear(
            (smooth(f) * alpha)[..., None], (H, W))[..., 0]
        dx, dy = up(rdx), up(rdy)
        win = int(np.ceil(alpha)) + 1
        from mmtrs_tpu.ops.warp import shift_axis_windowed
        out = shift_axis_windowed(v, dy, win, axis=1)
        return shift_axis_windowed(out, dx, win, axis=2)
    res["elastic_lowres"] = timeit("E2 elastic ¼-res fields + upsample",
                                   jax.jit(elastic_lowres), [(s,) for s in usubs])

    out_p = _REPO / "reports" / "exp_kernels_r5.json"
    out_p.write_text(json.dumps({k: round(v, 2) for k, v in res.items()},
                                indent=2))
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
