#!/usr/bin/env python3
"""Round-5 CLAHE *apply* kernel experiment: nibble-decomposed LUT matmul.

Production ``_apply_kernel_img`` (ops/pallas/clahe_kernel.py) evaluates the
9 candidate neighbour LUTs per tile as ``W[9,256] @ onehot[256,area]``:
256 one-hot compares per pixel on the VPU and a 9-row (7%-utilized) MXU
matmul. This experiment decomposes the pixel value v = hi·16 + lo (the
same trick the hist kernel already uses):

    result[d,p] = Σ_h oh_hi[h,p] · C[(h,d),p]
    C[(h,d),p]  = Σ_l W[d, h·16+l] · oh_lo[l,p]     (ONE [144,16]@[16,area])

so the one-hot build drops to 32 compares/pixel and the matmul fills 144
rows instead of 9. Arithmetic is exact: products are 0/1 × integers ≤ 255
(bf16-representable), accumulated in f32 — identical value set to the
production kernel, asserted bit-equal in interpret mode here and on-chip
before any timing is trusted.

Usage: python scripts/exp_apply_r5.py [--interpret]   (interpret = CPU parity only)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmtrs_tpu.ops.pallas.clahe_kernel import (
    N_BINS,
    _hist_lut_kernel_img,
    _quadrant_weight_variants,
    clahe_pallas,
)


def _apply_kernel_nibble(pix_ref, lutp_ref, wq_ref, out_ref, *, th, tw, ty, tx):
    """Nibble-decomposed apply: per tile ONE [144,16]@[16,area] matmul +
    a tile-repeated hi-mask reduction, instead of [9,256]@[256,area].

    lutp is the LUT pre-reshaped HOST-side to [1, n_tiles, 16, 16]
    (lutp[t, h, l] = lut[t, 16h+l]) so the kernel only concatenates
    full-width ref blocks — Mosaic supports neither 2D→3D shape casts nor
    lane-offset concatenation in-kernel."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    for i in range(ty):
        sel_i = 0 if i == 0 else (2 if i == ty - 1 else 1)
        for j in range(tx):
            blocks = []
            for dy in range(3):
                ci = min(max(i + dy - 1, 0), ty - 1)
                for dx in range(3):
                    cj = min(max(j + dx - 1, 0), tx - 1)
                    blocks.append(lutp_ref[0, ci * tx + cj, :, :])  # [16,16]
            # d-major: row d*16+h = LUT_d[16h : 16h+16]
            Wp = jnp.concatenate(blocks, axis=0).astype(jnp.bfloat16)  # [144,16]

            pix = pix_ref[0, i * tx + j, :, :].astype(jnp.int32)  # [1, area]
            oh_hi = ((pix >> 4) == sub).astype(jnp.float32)  # [16, area]
            oh_lo = ((pix & 15) == sub).astype(jnp.bfloat16)  # [16, area]
            C = jax.lax.dot_general(
                Wp, oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [144, area]: row d*16+h = LUT_d[16h + lo(pix)]
            # keep row d*16+h only where hi(pix)==h: the d-major mask is a
            # legal 9× tile-repeat of oh_hi (row r ↦ oh_hi[r mod 16])
            Cm = C * pltpu.repeat(oh_hi, 9, axis=0)  # [144, area]
            # Σ_h within each d block: 9 static 16-row slice sums
            G = jnp.stack(
                [jnp.sum(Cm[16 * d:16 * (d + 1), :], axis=0) for d in range(9)],
                axis=0,
            )  # [9, area] = LUT_d[pix]
            sel_j = 0 if j == 0 else (2 if j == tx - 1 else 1)
            wq = wq_ref[sel_i, sel_j]  # [9, area]
            res = jnp.sum(G * wq, axis=0, keepdims=True)
            if out_ref.dtype == jnp.uint8:
                res = (
                    jnp.clip(res, 0.0, 255.0) + 0.5
                ).astype(jnp.int32).astype(jnp.uint8)
            out_ref[0, i * tx + j, :, :] = res


@partial(jax.jit, static_argnames=("clip", "tiles", "interpret", "out_dtype"))
def clahe_pallas_nibble(l, clip=3.0, tiles=(8, 8), interpret=False,
                        out_dtype=jnp.float32):
    B, H, W = l.shape
    ty, tx = tiles
    th, tw = H // ty, W // tx
    area, n_tiles = th * tw, ty * tx
    pix = (
        l if l.dtype == jnp.uint8
        else jnp.clip(jnp.round(l), 0, N_BINS - 1).astype(jnp.uint8)
    )
    tiled = (
        pix.reshape(B, ty, th, tx, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, n_tiles, 1, area)
    )
    wq = jnp.asarray(_quadrant_weight_variants(th, tw, ty, tx))
    img_block = pl.BlockSpec(
        (1, n_tiles, 1, area), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    lut_block = pl.BlockSpec(
        (1, n_tiles, 1, N_BINS), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    lut = pl.pallas_call(
        partial(_hist_lut_kernel_img, area=area, clip=clip, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, N_BINS), jnp.float32),
        grid=(B,),
        in_specs=[img_block],
        out_specs=lut_block,
        scratch_shapes=[pltpu.VMEM((n_tiles, N_BINS), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tiled)
    # host-side (XLA) nibble relayout: lutp[b, t, h, l] = lut[b, t, 0, 16h+l]
    lutp = lut.reshape(B, n_tiles, 16, 16)
    lutp_block = pl.BlockSpec(
        (1, n_tiles, 16, 16), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_tiled = pl.pallas_call(
        partial(_apply_kernel_nibble, th=th, tw=tw, ty=ty, tx=tx),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, area), out_dtype),
        grid=(B,),
        in_specs=[
            img_block,
            lutp_block,
            pl.BlockSpec(
                (3, 3, 9, area), lambda b: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=img_block,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tiled, lutp, wq)
    return (
        out_tiled.reshape(B, ty, tx, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, H, W)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        os.environ["JAX_PLATFORMS"] = "cpu"

    B = 4 if interp else args.batch
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 256, (B, 512, 512), dtype=np.uint8))
    ls = [jnp.asarray(rng.integers(0, 256, (B, 512, 512), dtype=np.uint8))
          for _ in range(4)]

    prod = partial(clahe_pallas, clip=2.0, interpret=interp,
                   out_dtype=jnp.uint8)
    nib = partial(clahe_pallas_nibble, clip=2.0, interpret=interp,
                  out_dtype=jnp.uint8)

    a = np.asarray(prod(l))
    b = np.asarray(nib(l))
    exact = bool((a == b).all())
    print(f"bit-exact vs production: {exact} "
          f"(maxdiff {int(np.abs(a.astype(int)-b.astype(int)).max())})",
          flush=True)
    rec = {"bit_exact": exact, "batch": B, "interpret": interp}

    if not interp:
        def timeit(name, fn, it=16):
            t0 = time.perf_counter()
            float(np.asarray(fn(ls[0])[0, 0, 0].astype(jnp.float32)))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [fn(ls[i % 4]) for i in range(it)]
            float(np.asarray(outs[-1][0, 0, 0].astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / it * 1000
            print(f"{name:40s} {dt:7.2f} ms  [compile {tc:.0f}s]", flush=True)
            return dt

        rec["prod_ms"] = timeit("clahe_pallas production", prod)
        try:
            rec["nibble_ms"] = timeit("clahe_pallas nibble-apply", nib)
        except Exception as e:
            rec["nibble_ms"] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(f"nibble variant failed: {rec['nibble_ms']}", flush=True)

    out = Path("reports/exp_apply_r5.json")
    out.write_text(json.dumps(rec, indent=2) + "\n")
    print(f"wrote {out}", flush=True)
    return 0 if exact else 1


if __name__ == "__main__":
    raise SystemExit(main())
