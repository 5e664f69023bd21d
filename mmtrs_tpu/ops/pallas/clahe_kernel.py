"""Fused Pallas TPU kernels for CLAHE.

Semantics identical to the XLA reference implementation in
mmtrs_tpu.ops.clahe (the functional equivalent of cv2.createCLAHE(3.0, (8,8))
on the LAB L channel — normalise.py:10-16); tests assert elementwise
equality against it.

Layout: images are pre-tiled host-side to ``[B, ty·tx, 1, th·tw]`` (one XLA
transpose). Everything in-kernel is **lane-major**: a tile's pixels live
along the 4096-lane axis, so every vector op runs at full VPU width —
earlier kernel iterations used [pixels, small] layouts and wasted
127/128 lanes.

Grid granularity (round-5 lever, reports/exp_grid_r5.json): both kernels
run ONE image per grid step (grid ``(B,)``, 128 steps at b128) instead of
one tile-row per step (1024 steps). The copy-probe pinned ~3.5 µs of fixed
DMA/semaphore overhead per grid step, and the tile-row hist measured
19.7 ms vs 5.1 ms for the whole-image variant standalone. On top of that,
the per-tile LUT post-processing (clip → redistribute → 8-step prefix
scan, ~24 ops on a [1, 256] row = 2 of 8 VPU sublanes) is batched across
all 64 tiles into single [64, 256] ops via a VMEM scratch — exact, since
every value is an integer-valued f32 < 2^24.

Kernel 1 (``_hist_lut_kernel_img``), grid (B,):
    two-level one-hot histogram — bin v = hi·16 + lo; the 256-bin count
    matrix is ``OH @ OLᵀ`` with OH/OL the [16, area] nibble one-hots (one
    tiny MXU matmul); flatten via repeat+mask (Mosaic has no (16,16)→(1,256)
    shape cast) into a [n_tiles, 256] scratch; then ONE batched
    clip → OpenCV integer redistribution → log-roll prefix sum → LUT over
    all tiles.

Kernel 2 (``_apply_kernel_img``), grid (B,):
    CLAHE's per-pixel "gather from 4 neighbouring tile LUTs + bilinear
    blend" is ``W @ onehot``: the 9 candidate neighbour LUTs (3×3 clamped
    window) form W [9, 256]; pixels one-hot to [256, area]; the product
    [9, area] holds every pixel under every candidate LUT, combined by
    precomputed quadrant weights (exact k/tile fractions, host-computed per
    clamp pattern — 3×3 variants — selected by tile position, fully static
    now that the whole image is in one step). No gathers anywhere: TPU has
    no fast arbitrary gather, but it has a very fast MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 256


def _prefix_sum_lanes(x):
    """Inclusive prefix sum along the lane axis of [rows, N_BINS]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N_BINS), 1)
    s = 1
    while s < N_BINS:
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, axis=1), 0.0)
        s *= 2
    return x


def _tile_hist_rows(pix_ref, t, flat_mask, sub):
    """[1, 256] float histogram of tile ``t`` (integer-valued, exact)."""
    pix = pix_ref[0, t, :, :].astype(jnp.int32)  # [1, area] — lane-major
    oh = ((pix >> 4) == sub).astype(jnp.bfloat16)  # [16, area]
    ol = ((pix & 15) == sub).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        oh, ol, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [16, 16]: counts[hi, lo]
    return jnp.sum(
        pltpu.repeat(counts, 16, axis=1) * flat_mask, axis=0, keepdims=True
    )  # [1, 256]


def _hist_lut_kernel_img(pix_ref, lut_ref, hist_sc, *, area, clip, n_tiles):
    limit = max(int(clip * area / N_BINS), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    # flatten-mask: [16, 256] with mask[hi, v] = (v >> 4 == hi)
    vbins = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 1)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 0)
    flat_mask = ((vbins >> 4) == hrows).astype(jnp.float32)
    for t in range(n_tiles):
        hist_sc[t, :] = _tile_hist_rows(pix_ref, t, flat_mask, sub)[0]

    # batched post-processing over all tiles at once
    hist = hist_sc[...]  # [n_tiles, 256]
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, float(limit))
    # OpenCV integer redistribution (clahe.cpp calcLut): every bin gets
    # excess // nbins; first `residual` bins at spacing
    # max(nbins // residual, 1) get +1
    exc_i = excess.astype(jnp.int32)  # [n_tiles, 1]
    batch_add = exc_i // N_BINS
    resid = exc_i - batch_add * N_BINS
    step = jnp.maximum(N_BINS // jnp.maximum(resid, 1), 1)
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, N_BINS), 1)
    bonus = ((bins % step) == 0) & ((bins // step) < resid)  # [n_tiles, 256]
    hist = hist + batch_add.astype(jnp.float32) + bonus.astype(jnp.float32)
    cdf = _prefix_sum_lanes(hist)
    lut_ref[0, :, 0, :] = jnp.clip(
        jnp.round(cdf * ((N_BINS - 1) / area)), 0, N_BINS - 1
    )


def _hist_lut_kernel(pix_ref, lut_ref, *, area, clip, tiles_per_step):
    """Legacy per-tile-row hist+LUT (grid (B, ty)). Superseded in production
    by ``_hist_lut_kernel_img`` — kept as the measured baseline of the
    round-5 grid-granularity experiments (scripts/exp_grid_r5.py,
    scripts/exp_clahe_r5.py; reports/exp_grid_r5.json: 19.7 ms vs 5.1)."""
    limit = max(int(clip * area / N_BINS), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    vbins = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 1)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 0)
    flat_mask = ((vbins >> 4) == hrows).astype(jnp.float32)
    for j in range(tiles_per_step):  # one grid step owns a whole tile-row
        hist = _tile_hist_rows(pix_ref, j, flat_mask, sub)
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
        lut_ref[0, j, 0, :] = jnp.clip(
            jnp.round(cdf[0] * ((N_BINS - 1) / area)), 0, N_BINS - 1
        )


def _axis_weight_pattern(tile_idx: int, tile_size: int, n_tiles: int) -> np.ndarray:
    """[tile_size, 3] bilinear weights over the 3 candidate neighbour tiles
    for a given tile position (host-side, exact)."""
    pos = np.arange(tile_size, dtype=np.float64)
    # OpenCV tile coordinate: x·inv_tw − 0.5 (clahe.cpp interpolation)
    g = (tile_idx * tile_size + pos) / tile_size - 0.5
    t0 = np.clip(np.floor(g), 0, n_tiles - 1)
    t1 = np.minimum(t0 + 1, n_tiles - 1)
    w1 = np.clip(g - t0, 0.0, 1.0)
    out = np.zeros((tile_size, 3))
    d0 = (t0 - (tile_idx - 1)).astype(int)
    d1 = (t1 - (tile_idx - 1)).astype(int)
    for r in range(tile_size):
        out[r, d0[r]] += 1.0 - w1[r]
        out[r, d1[r]] += w1[r]
    return out


def _quadrant_weight_variants(th, tw, ty, tx) -> np.ndarray:
    """[3, 3, 9, th·tw] f32: quadrant weights for every (row-clamp-pattern,
    col-clamp-pattern) — first / interior / last tile along each axis."""

    def patterns(tile_size, n_tiles):
        idxs = [0, min(1, n_tiles - 1), n_tiles - 1]
        return [_axis_weight_pattern(i, tile_size, n_tiles) for i in idxs]

    wys = patterns(th, ty)
    wxs = patterns(tw, tx)
    out = np.zeros((3, 3, 9, th * tw), dtype=np.float32)
    for pi in range(3):
        for pj in range(3):
            for dy in range(3):
                for dx in range(3):
                    w = np.outer(wys[pi][:, dy], wxs[pj][:, dx])  # [th, tw]
                    out[pi, pj, dy * 3 + dx] = w.reshape(-1)
    return out


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
            # bf16 LUT/one-hot matmul is exact: products are 0/1 × integers
            # ≤ 255 (both exactly representable in bf16), accumulated in f32
            W = jnp.stack(cols, axis=0).astype(jnp.bfloat16)  # [9, 256]

            pix = pix_ref[0, i * tx + j, :, :].astype(jnp.int32)  # [1, area]
            onehot = (pix == bins).astype(jnp.bfloat16)  # [256, area]
            vals = jnp.dot(W, onehot, preferred_element_type=jnp.float32)

            sel_j = 0 if j == 0 else (2 if j == tx - 1 else 1)
            wq = wq_ref[sel_i, sel_j]  # [9, area] — exact k/tile fractions
            res = jnp.sum(vals * wq, axis=0, keepdims=True)
            if out_ref.dtype == jnp.uint8:
                # cv2's CLAHE returns uint8 L (clahe.cpp stores saturate_cast
                # <uchar> of the interpolated value) — the u8 store IS the
                # reference semantics, and ships 1 byte/px to the next stage
                res = (jnp.clip(res, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
                    jnp.uint8
                )
            out_ref[0, i * tx + j, :, :] = res


@partial(jax.jit, static_argnames=("clip", "tiles", "interpret", "out_dtype"))
def clahe_pallas(
    l: jnp.ndarray, clip: float = 3.0, tiles: tuple[int, int] = (8, 8),
    interpret: bool = False, out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Pallas CLAHE on [B, H, W] L-channel (0..255, f32 or uint8 input).
    out_dtype=uint8 stores cv2's saturate_cast<uchar> semantics (CLAHE's
    actual reference contract); f32 default keeps the interpolated float
    for oracles/tests."""
    B, H, W = l.shape
    ty, tx = tiles
    assert H % ty == 0 and W % tx == 0
    th, tw = H // ty, W // tx
    area = th * tw
    n_tiles = ty * tx

    # uint8 transport: the tile transpose is a strided relayout whose cost
    # scales with bytes — L quantizes to 8 bits anyway, so ship 1 byte/px
    # through HBM and widen to int32 inside the kernels (round-4 lever)
    pix = (
        l if l.dtype == jnp.uint8
        else jnp.clip(jnp.round(l), 0, N_BINS - 1).astype(jnp.uint8)
    )
    # b (ty th) (tx tw) -> b (ty tx) 1 (th tw)
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

    out_tiled = pl.pallas_call(
        partial(_apply_kernel_img, th=th, tw=tw, ty=ty, tx=tx),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, area), out_dtype),
        grid=(B,),
        in_specs=[
            img_block,
            lut_block,
            pl.BlockSpec(
                (3, 3, 9, area), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=img_block,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tiled, lut, wq)

    # b (ty tx) 1 (th tw) -> b (ty th) (tx tw)
    return (
        out_tiled.reshape(B, ty, tx, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, H, W)
    )
