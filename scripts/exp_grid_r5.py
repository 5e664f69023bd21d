#!/usr/bin/env python3
"""Round-5 grid-granularity experiments for the hot Pallas kernels.

exp_scatter_r5 killed the two standing hypotheses for the chain's remaining
fat (subset scatter copies: XLA already optimal; CLAHE tile relayout:
1.68 ms roundtrip). What's left is per-grid-step overhead: the CLAHE pair
runs 2×(B·ty)=2048 steps at b128, the LAB pair 2×(B·4)=1024, photometrics
B·4=512 — each step a small DMA + semaphore handshake. If a step costs
~1-3 µs of fixed overhead, that's 3-10 ms of the 41.7 ms chain.

Probes (on-chip, b128@512²):
  P*  trivial copy kernel at 4 block granularities → the µs/step constant
  H*  hist kernel: tiles_per_step 8 (prod) vs 64 (grid (B,))
  A*  apply kernel: per-tile-row grid (prod) vs whole-image in-kernel loop
  F*  fused hist+apply: ONE kernel per image, LUTs in VMEM scratch
      (also saves the second pix HBM read + the LUT HBM roundtrip)

Every variant is asserted bit-exact vs production clahe_pallas before
timing. Winners get promoted into ops/pallas/clahe_kernel.py.

Run:  python scripts/exp_grid_r5.py [batch]   → reports/exp_grid_r5.json
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

from mmtrs_tpu.ops.pallas.clahe_kernel import (
    N_BINS,
    _hist_lut_kernel,
    _prefix_sum_lanes,
    _quadrant_weight_variants,
)


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
    print(f"{name:56s} {dt:8.2f} ms   [compile {compile_s:.0f}s]", flush=True)
    return dt


# --------------------------------------------------------------------------
# P: copy-kernel grid-overhead probe
# --------------------------------------------------------------------------


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def copy_variant(B, H, W, rows, batch_rows=1):
    def f(x):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
            grid=(B // batch_rows, H // rows),
            in_specs=[pl.BlockSpec((batch_rows, rows, W),
                                   lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((batch_rows, rows, W),
                                   lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(x)

    return jax.jit(f)


# --------------------------------------------------------------------------
# A: apply kernel, whole image per grid step (static clamp patterns)
# --------------------------------------------------------------------------


def _apply_kernel_img(pix_ref, lut_ref, wq_ref, out_ref, *, th, tw, ty, tx):
    bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1), 0)
    for i in range(ty):
        sel_i = 0 if i == 0 else (2 if i == ty - 1 else 1)
        for j in range(tx):
            cols = []
            for dy in range(3):
                ci = min(max(i + dy - 1, 0), ty - 1)
                for dx in range(3):
                    cj = min(max(j + dx - 1, 0), tx - 1)
                    cols.append(lut_ref[0, ci * tx + cj, 0, :])
            W_ = jnp.stack(cols, axis=0).astype(jnp.bfloat16)
            pix = pix_ref[0, i * tx + j, :, :].astype(jnp.int32)
            onehot = (pix == bins).astype(jnp.bfloat16)
            vals = jnp.dot(W_, onehot, preferred_element_type=jnp.float32)
            sel_j = 0 if j == 0 else (2 if j == tx - 1 else 1)
            wq = wq_ref[sel_i, sel_j]
            res = jnp.sum(vals * wq, axis=0, keepdims=True)
            res = (jnp.clip(res, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
                jnp.uint8)
            out_ref[0, i * tx + j, :, :] = res


# --------------------------------------------------------------------------
# F: fused hist+apply, one kernel per image, LUTs in VMEM scratch
# --------------------------------------------------------------------------


def _fused_kernel(pix_ref, wq_ref, out_ref, lut_sc, *, area, clip, ty, tx):
    n_tiles = ty * tx
    limit = max(int(clip * area / N_BINS), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    vbins = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 1)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 0)
    flat_mask = ((vbins >> 4) == hrows).astype(jnp.float32)
    for t in range(n_tiles):
        pix = pix_ref[0, t, :, :].astype(jnp.int32)
        oh = ((pix >> 4) == sub).astype(jnp.bfloat16)
        ol = ((pix & 15) == sub).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            oh, ol, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        hist = jnp.sum(
            pltpu.repeat(counts, 16, axis=1) * flat_mask, axis=0,
            keepdims=True)
        excess = jnp.sum(jnp.maximum(hist - limit, 0.0))
        hist = jnp.minimum(hist, float(limit))
        exc_i = excess.astype(jnp.int32)
        batch_add = exc_i // N_BINS
        resid = exc_i - batch_add * N_BINS
        step = jnp.maximum(N_BINS // jnp.maximum(resid, 1), 1)
        bins = jax.lax.broadcasted_iota(jnp.int32, (1, N_BINS), 1)
        bonus = ((bins % step) == 0) & ((bins // step) < resid)
        hist = hist + batch_add.astype(jnp.float32) + bonus.astype(jnp.float32)
        cdf = _prefix_sum_lanes(hist)
        lut_sc[t, :] = jnp.clip(
            jnp.round(cdf[0] * ((N_BINS - 1) / area)), 0, N_BINS - 1)

    bins_c = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, 1), 0)
    for i in range(ty):
        sel_i = 0 if i == 0 else (2 if i == ty - 1 else 1)
        for j in range(tx):
            cols = []
            for dy in range(3):
                ci = min(max(i + dy - 1, 0), ty - 1)
                for dx in range(3):
                    cj = min(max(j + dx - 1, 0), tx - 1)
                    cols.append(lut_sc[ci * tx + cj, :])
            W_ = jnp.stack(cols, axis=0).astype(jnp.bfloat16)
            pix = pix_ref[0, i * tx + j, :, :].astype(jnp.int32)
            onehot = (pix == bins_c).astype(jnp.bfloat16)
            vals = jnp.dot(W_, onehot, preferred_element_type=jnp.float32)
            sel_j = 0 if j == 0 else (2 if j == tx - 1 else 1)
            wq = wq_ref[sel_i, sel_j]
            res = jnp.sum(vals * wq, axis=0, keepdims=True)
            res = (jnp.clip(res, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
                jnp.uint8)
            out_ref[0, i * tx + j, :, :] = res


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

    assert jax.devices()[0].platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = 512
    ty = tx = 8
    th, tw = S // ty, S // tx
    area = th * tw
    n_tiles = ty * tx
    clip = 2.0

    x0 = jnp.asarray(synth_batch(B))  # [B,512,512,3] u8
    lplanes = [x0[..., i] for i in range(3)] + [x0[..., 0]]  # 4 distinct u8 L
    args = [(p,) for p in lplanes]

    res = {}

    # ---- P: copy probe ---------------------------------------------------
    for rows, br, tag in [(128, 1, "p0_copy_rows128"),
                          (512, 1, "p1_copy_rows512"),
                          (512, 2, "p2_copy_b2"),
                          (512, 4, "p3_copy_b4")]:
        steps = (B // br) * (S // rows)
        res[tag] = timeit(f"{tag} ({steps} steps)",
                          copy_variant(B, S, S, rows, br), args)

    # ---- baseline --------------------------------------------------------
    base = jax.jit(partial(clahe_pallas, clip=clip, tiles=(ty, tx),
                           out_dtype=jnp.uint8))
    res["g0_clahe_prod"] = timeit("G0 clahe_pallas production (u8 out)",
                                  base, args)
    want = np.asarray(base(lplanes[0]))

    def tile_fwd(l):
        return (l.reshape(B, ty, th, tx, tw).transpose(0, 1, 3, 2, 4)
                .reshape(B, n_tiles, 1, area))

    def tile_bwd(t):
        return (t.reshape(B, ty, tx, th, tw).transpose(0, 1, 3, 2, 4)
                .reshape(B, S, S))

    wq = jnp.asarray(_quadrant_weight_variants(th, tw, ty, tx))

    # ---- H: hist grid variants -------------------------------------------
    def hist_variant(tiles_per_step):
        def f(l):
            tiled = tile_fwd(l)
            return pl.pallas_call(
                partial(_hist_lut_kernel, area=area, clip=clip,
                        tiles_per_step=tiles_per_step),
                out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, N_BINS),
                                               jnp.float32),
                grid=(B, n_tiles // tiles_per_step),
                in_specs=[pl.BlockSpec((1, tiles_per_step, 1, area),
                                       lambda b, i: (b, i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, tiles_per_step, 1, N_BINS),
                                       lambda b, i: (b, i, 0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(tiled)

        return jax.jit(f)

    h0 = hist_variant(tx)
    lut_want = np.asarray(h0(lplanes[0]))
    res["h0_hist_tps8"] = timeit("H0 hist tiles_per_step=8 (prod, 1024 st)",
                                 h0, args)
    h1 = hist_variant(n_tiles)
    np.testing.assert_array_equal(np.asarray(h1(lplanes[0])), lut_want)
    res["h1_hist_tps64"] = timeit("H1 hist tiles_per_step=64 (128 steps)",
                                  h1, args)

    # ---- A: apply whole-image variant --------------------------------------
    def apply_img(l):
        tiled = tile_fwd(l)
        lut = h1(l)
        out_tiled = pl.pallas_call(
            partial(_apply_kernel_img, th=th, tw=tw, ty=ty, tx=tx),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, area), jnp.uint8),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_tiles, 1, area), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_tiles, 1, N_BINS), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, 9, area), lambda b: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_tiles, 1, area),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(tiled, lut, wq)
        return tile_bwd(out_tiled)

    a1 = jax.jit(apply_img)
    np.testing.assert_array_equal(np.asarray(a1(lplanes[0])), want)
    print("A1 bit-exact vs production: True", flush=True)
    res["a1_hist64_apply_img"] = timeit("A1 hist(tps64) + apply whole-image",
                                        a1, args)

    # ---- F: fused hist+apply single kernel ---------------------------------
    def fused(l):
        tiled = tile_fwd(l)
        out_tiled = pl.pallas_call(
            partial(_fused_kernel, area=area, clip=clip, ty=ty, tx=tx),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, area), jnp.uint8),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_tiles, 1, area), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, 9, area), lambda b: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_tiles, 1, area),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_tiles, N_BINS), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(tiled, wq)
        return tile_bwd(out_tiled)

    f1 = jax.jit(fused)
    np.testing.assert_array_equal(np.asarray(f1(lplanes[0])), want)
    print("F1 bit-exact vs production: True", flush=True)
    res["f1_fused_one_kernel"] = timeit("F1 fused hist+apply (128 steps)",
                                        f1, args)

    # ---- L/PH/SH: coarsen the OTHER hot kernels' grids ---------------------
    # (monkeypatch the row-block choosers; clear the jit caches between
    # variants — same static signature would otherwise reuse the old trace)
    from mmtrs_tpu.ops.pallas import lab_kernels as LK
    from mmtrs_tpu.ops.pallas import photometric_kernel as PK
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.utils.rng import keys_for_batch

    rgb_args = [(jnp.clip(x0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8),)
                for i in range(4)]

    lab_fn = lambda v: LK.clahe_lab_fused(v, clip=2.0, tiles=(8, 8))
    res["l0_lab_rows128"] = timeit("L0 clahe_lab_fused rows=128 (prod)",
                                   lab_fn, rgb_args)
    lab_want = np.asarray(lab_fn(rgb_args[0][0]))
    orig_plane_rows = LK._plane_rows
    try:
        LK._plane_rows = lambda H: H  # whole plane per grid step
        LK.clahe_lab_fused.clear_cache()
        np.testing.assert_array_equal(np.asarray(lab_fn(rgb_args[0][0])),
                                      lab_want)
        print("L1 bit-exact vs production: True", flush=True)
        res["l1_lab_rows512"] = timeit("L1 clahe_lab_fused rows=512 (B steps)",
                                       lab_fn, rgb_args)
    finally:
        LK._plane_rows = orig_plane_rows
        LK.clahe_lab_fused.clear_cache()

    keys = keys_for_batch(42, np.arange(B), np.ones(B))
    hole = max(1, S // 24)
    params, nk, _ = A.photometric_params_legacy(keys, S, S, hole)
    seeds = jax.vmap(
        lambda k: jax.random.bits(k, (), jnp.uint32).astype(jnp.int32))(nk)
    ph_fn = lambda v: PK.photometrics_fused_pallas(v, params, seeds, hole)
    res["ph0_rows_prod"] = timeit("PH0 photometrics_fused (prod rows)",
                                  ph_fn, rgb_args)
    orig_row_block = PK._row_block
    try:
        PK._row_block = lambda H: H
        PK.photometrics_fused_pallas.clear_cache()
        # PRNG draws depend on the row-block split → only shape/runtime
        # checked here (noise parity is covered statistically by the suite)
        res["ph1_rows512"] = timeit("PH1 photometrics_fused rows=512",
                                    ph_fn, rgb_args)
    finally:
        PK._row_block = orig_row_block
        PK.photometrics_fused_pallas.clear_cache()

    from mmtrs_tpu.ops.pallas.shift_kernel import shift_rows_pallas

    rows_flat = (x0.transpose(0, 3, 1, 2).reshape(B * 3 * S, S))
    offs = jnp.asarray(
        np.random.default_rng(3).uniform(-40, 40, (B * 3 * S,)).astype(
            np.float32))
    sh_args = [(jnp.clip(rows_flat.astype(jnp.int32) + i, 0, 255)
                .astype(jnp.uint8),) for i in range(4)]
    for br, tag in [(256, "sh0_block256"), (1024, "sh1_block1024"),
                    (4096, "sh2_block4096")]:
        steps = (B * 3 * S) // br
        res[tag] = timeit(
            f"SH shift_rows block_rows={br} ({steps} steps)",
            jax.jit(lambda r, _br=br: shift_rows_pallas(r, offs,
                                                        block_rows=_br)),
            sh_args)

    out_p = _REPO / "reports" / "exp_grid_r5.json"
    out_p.write_text(json.dumps({k: round(v, 2) for k, v in res.items()},
                                indent=2))
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
