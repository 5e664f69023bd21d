#!/usr/bin/env python3
"""CLAHE apply-kernel variants (round 5): the [256, area] one-hot build is
~8.6G VPU compares at b128 — the chain's single biggest compute block
(scripts/exp_kernels_r5.py: clahe_pallas 9.85 ms of the 12.05 ms LAB
stage). Variants probe what Mosaic actually vectorizes faster:

  A. current: i32 compares → bf16 one-hot → bf16 MXU matmul  (baseline)
  B. bf16 compares (pix/bins bf16; integers ≤255 exact in bf16)
  C. i8 one-hot + int8 MXU matmul (LUT split 128·a+b to fit i8)
  D. nibble one-hots (32 compares/px) + per-candidate VPU select-sum

All variants must be BIT-EXACT vs the oracle (integers throughout).
Run on the TPU:  python scripts/exp_clahe_r5.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmtrs_tpu.ops.pallas import clahe_kernel as CK

N_BINS = 256


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


def _apply_kernel_v(pix_ref, lut_ref, wq_ref, out_ref, *, th, tw, ty, tx, mode):
    i = pl.program_id(1)
    sel_i = jnp.where(i == 0, 0, jnp.where(i == ty - 1, 2, 1))
    area = th * tw

    for j in range(tx):
        cols = []
        for dy in range(3):
            ci = jnp.clip(i + dy - 1, 0, ty - 1)
            for dx in range(3):
                cj = min(max(j + dx - 1, 0), tx - 1)
                cols.append(lut_ref[0, ci * tx + cj, 0, :])
        Wf = jnp.stack(cols, axis=0)  # [9, 256] f32

        if mode == "bf16cmp":
            bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1), 0).astype(
                jnp.bfloat16)
            pix = pix_ref[0, j, :, :].astype(jnp.int32).astype(jnp.bfloat16)
            onehot = (pix == bins).astype(jnp.bfloat16)
            vals = jnp.dot(Wf.astype(jnp.bfloat16), onehot,
                           preferred_element_type=jnp.float32)
        elif mode == "i8":
            bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1), 0)
            pix = pix_ref[0, j, :, :].astype(jnp.int32)
            oh8 = (pix == bins).astype(jnp.int8)
            Wi = Wf.astype(jnp.int32)
            w_lo = (Wi & 127).astype(jnp.int8)
            w_hi = (Wi >> 7).astype(jnp.int8)  # 0/1 (LUT ≤ 255)
            v_lo = jax.lax.dot_general(
                w_lo, oh8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            v_hi = jax.lax.dot_general(
                w_hi, oh8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            vals = (v_lo + v_hi * 128).astype(jnp.float32)
        elif mode == "nibble":
            sub = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
            pix = pix_ref[0, j, :, :].astype(jnp.int32)
            oh_hi = ((pix >> 4) == sub).astype(jnp.bfloat16)  # [16, area]
            ol = ((pix & 15) == sub).astype(jnp.bfloat16)     # [16, area]
            # M2 [(9·16), 16]: candidate c, hi row h → LUT[c, h*16+lo]
            M2 = Wf.reshape(9 * 16, 16).astype(jnp.bfloat16)
            tmp = jnp.dot(M2, ol, preferred_element_type=jnp.float32)
            tmp = tmp.reshape(9, 16, area)
            vals = jnp.sum(tmp * oh_hi[None].astype(jnp.float32), axis=1)
        else:  # current
            bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1), 0)
            pix = pix_ref[0, j, :, :].astype(jnp.int32)
            onehot = (pix == bins).astype(jnp.bfloat16)
            vals = jnp.dot(Wf.astype(jnp.bfloat16), onehot,
                           preferred_element_type=jnp.float32)

        sel_j = 0 if j == 0 else (2 if j == tx - 1 else 1)
        wq = wq_ref[sel_i, sel_j]
        res = jnp.sum(vals * wq, axis=0, keepdims=True)
        res = (jnp.clip(res, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
        out_ref[0, j, :, :] = res


def apply_variant(l_u8, lut, wq, tiles, mode):
    B, H, W = l_u8.shape
    ty, tx = tiles
    th, tw = H // ty, W // tx
    area = th * tw
    n_tiles = ty * tx
    tiled = (
        l_u8.reshape(B, ty, th, tx, tw).transpose(0, 1, 3, 2, 4)
        .reshape(B, n_tiles, 1, area)
    )
    out_tiled = pl.pallas_call(
        partial(_apply_kernel_v, th=th, tw=tw, ty=ty, tx=tx, mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, area), jnp.uint8),
        grid=(B, ty),
        in_specs=[
            pl.BlockSpec((1, tx, 1, area), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, 1, N_BINS), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 9, area), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tx, 1, area), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(tiled, lut, wq)
    return (
        out_tiled.reshape(B, ty, tx, th, tw).transpose(0, 1, 3, 2, 4)
        .reshape(B, H, W)
    )


def main() -> int:
    from bench import synth_batch

    assert jax.devices()[0].platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S, tiles = 512, (8, 8)
    x0 = jnp.asarray(synth_batch(B))
    lq = (0.299 * x0[..., 0].astype(jnp.float32)
          + 0.587 * x0[..., 1].astype(jnp.float32)
          + 0.114 * x0[..., 2].astype(jnp.float32))
    lq = jnp.clip(jnp.round(lq), 0, 255).astype(jnp.uint8)
    lqs = [jnp.clip(lq.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
           for i in range(4)]

    # precompute LUTs once via the production hist kernel (shared)
    ty, tx = tiles
    th, tw = S // ty, S // tx
    area = th * tw
    tiled = (
        lq.reshape(B, ty, th, tx, tw).transpose(0, 1, 3, 2, 4)
        .reshape(B, ty * tx, 1, area)
    )
    lut = pl.pallas_call(
        partial(CK._hist_lut_kernel, area=area, clip=3.0, tiles_per_step=tx),
        out_shape=jax.ShapeDtypeStruct((B, ty * tx, 1, N_BINS), jnp.float32),
        grid=(B, ty),
        in_specs=[pl.BlockSpec((1, tx, 1, area), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tx, 1, N_BINS), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(tiled)
    wq = jnp.asarray(CK._quadrant_weight_variants(th, tw, ty, tx))

    res = {}
    res["hist_only"] = timeit(
        "H hist kernel only", jax.jit(
            lambda l: pl.pallas_call(
                partial(CK._hist_lut_kernel, area=area, clip=3.0,
                        tiles_per_step=tx),
                out_shape=jax.ShapeDtypeStruct((B, ty * tx, 1, N_BINS),
                                               jnp.float32),
                grid=(B, ty),
                in_specs=[pl.BlockSpec((1, tx, 1, area),
                                       lambda b, i: (b, i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, tx, 1, N_BINS),
                                       lambda b, i: (b, i, 0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(l.reshape(B, ty, th, tx, tw).transpose(0, 1, 3, 2, 4)
              .reshape(B, ty * tx, 1, area))),
        [(l,) for l in lqs])

    ref = None
    for mode in ["current", "bf16cmp", "i8", "nibble"]:
        try:
            fn = jax.jit(lambda l, m=mode: apply_variant(l, lut, wq, tiles, m))
            t = timeit(f"A[{mode}] apply kernel", fn, [(l,) for l in lqs])
            got = np.asarray(fn(lqs[0]))
            if ref is None:
                ref = got
                ok = True
            else:
                ok = bool((got == ref).all())
            res[f"apply_{mode}"] = {"ms": round(t, 2), "bit_equal": ok}
            print(f"   bit-equal vs current: {ok}", flush=True)
        except Exception as e:
            msg = "".join(c for c in str(e).splitlines()[0] if c.isprintable())
            res[f"apply_{mode}"] = {"error": type(e).__name__,
                                    "detail": msg[:120]}
            print(f"   FAILED: {type(e).__name__}: {msg[:120]}", flush=True)

    out_p = _REPO / "reports" / "exp_clahe_r5.json"
    out_p.write_text(json.dumps(res, indent=2, default=float))
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
