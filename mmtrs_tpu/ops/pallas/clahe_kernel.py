"""Fused Pallas TPU kernels for CLAHE.

Semantics identical to the XLA reference implementation in
mmtrs_tpu.ops.clahe (the functional equivalent of cv2.createCLAHE(3.0, (8,8))
on the LAB L channel — normalise.py:10-16); tests assert elementwise
equality against it.

Layout: images are pre-tiled host-side to ``[B, ty·tx, 1, th·tw]`` (one XLA
transpose); in-kernel the only reshape is (1, area)→(area, 1), one of the
few shape-casts Mosaic supports (lane→sublane roll-up).

Kernel 1 (``_hist_lut_kernel``), grid (B, n_tiles):
    one tile's pixels [th·tw, 1] compare-sum against the 256-bin iota (VPU)
    → histogram; clip → even excess redistribution → prefix sum via
    log-step roll-adds (no Mosaic cumsum) → LUT [256].

Kernel 2 (``_apply_kernel``), grid (B, n_tiles):
    CLAHE's per-pixel "gather from 4 neighbouring tile LUTs and bilinear
    blend" recast as ONE MXU matmul per tile: the 9 candidate neighbour LUTs
    (3×3 clamped window) form a [256, 9] matrix W; the tile one-hot-encodes
    to [th·tw, 256]; ``onehot @ W`` evaluates every pixel under every
    candidate LUT and bilinear weights (zero outside each pixel's quadrant)
    combine them. No gathers — TPU has no fast arbitrary gather, but it has
    a very fast MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 256


def _prefix_sum_lanes(x):
    """Inclusive prefix sum along the lane axis of [1, N_BINS]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N_BINS), 1)
    s = 1
    while s < N_BINS:
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, axis=1), 0.0)
        s *= 2
    return x


def _hist_lut_kernel(pix_ref, lut_ref, *, area, clip, tiles_per_step):
    """Two-level one-hot histogram: bin v = hi·16 + lo. The 256-bin count
    matrix is ``OHᵀ @ OL`` where OH/OL are the [area, 16] hi/lo one-hots —
    one tiny MXU matmul instead of a [area, 256] VPU compare-sum (8× less
    vector work). Counts are exact: 0/1 products, f32 accumulation."""
    limit = max(int(clip * area / N_BINS), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
    # flatten-mask: [16, 256] with mask[hi, v] = (v >> 4 == hi); Mosaic has
    # no (16,16)→(1,256) shape cast, so the flatten is repeat+mask+reduce
    vbins = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 1)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (16, N_BINS), 0)
    flat_mask = ((vbins >> 4) == hrows).astype(jnp.float32)
    for j in range(tiles_per_step):  # one grid step owns a whole tile-row
        pix = pix_ref[0, j, :, :].reshape(area, 1)
        oh = ((pix >> 4) == sub).astype(jnp.bfloat16)  # [area, 16]
        ol = ((pix & 15) == sub).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            oh, ol, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [16, 16]: counts[hi, lo]
        hist = jnp.sum(
            pltpu.repeat(counts, 16, axis=1) * flat_mask, axis=0, keepdims=True
        )  # [1, 256]
        excess = jnp.sum(jnp.maximum(hist - limit, 0.0))
        hist = jnp.minimum(hist, float(limit)) + excess / N_BINS
        cdf = _prefix_sum_lanes(hist)
        lut_ref[0, j, 0, :] = jnp.clip(
            jnp.round(cdf[0] * ((N_BINS - 1) / area)), 0, N_BINS - 1
        )


def _axis_weights(pos, tile_idx, tile_size, n_tiles):
    """[area, 3] bilinear weights over the 3 candidate neighbour tiles.

    pos: [area, 1] float local coordinate along this axis."""
    g = (tile_idx * tile_size + pos + 0.5) / tile_size - 0.5
    t0 = jnp.clip(jnp.floor(g), 0, n_tiles - 1)
    t1 = jnp.minimum(t0 + 1, n_tiles - 1)
    w1 = jnp.clip(g - t0, 0.0, 1.0)
    d0 = (t0 - (tile_idx - 1)).astype(jnp.int32)  # ∈ {0,1,2}
    d1 = (t1 - (tile_idx - 1)).astype(jnp.int32)
    ds = jax.lax.broadcasted_iota(jnp.int32, (1, 3), 1)
    return (d0 == ds) * (1.0 - w1) + (d1 == ds) * w1


_APPLY_CHUNK = 512  # pixels per inner step — bounds VMEM temporaries.
# Known perf ceiling (round-2 target): the [ch, 1]/[ch, 9] temporaries use
# 1-9 of 128 lanes (~7% VPU utilization); a [*, 128]-major pixel layout for
# the weight/select stage is the next big win. Measured equal at ch=4096.


def _apply_kernel(pix_ref, lut_ref, out_ref, *, th, tw, ty, tx):
    i = pl.program_id(1)  # tile-row index; tiles within the row are static
    area = th * tw
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, N_BINS), 1)
    ch = min(_APPLY_CHUNK, area)

    for j in range(tx):
        cols = []
        for dy in range(3):
            ci = jnp.clip(i + dy - 1, 0, ty - 1)
            for dx in range(3):
                cj = min(max(j + dx - 1, 0), tx - 1)
                cols.append(lut_ref[0, ci * tx + cj, 0, :])
        # bf16 LUT/one-hot matmul is exact: products are 0/1 x integers
        # <= 255 (both exactly representable in bf16), accumulated in f32
        W = jnp.stack(cols, axis=1).astype(jnp.bfloat16)  # [256, 9]

        for c in range(area // ch):
            pixc = pix_ref[0, j, :, c * ch : (c + 1) * ch].reshape(ch, 1)
            onehot = (pixc == bins).astype(jnp.bfloat16)  # [ch, 256]
            vals = jnp.dot(onehot, W, preferred_element_type=jnp.float32)

            idx = c * ch + jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)
            row = (idx // tw).astype(jnp.float32)
            col = (idx % tw).astype(jnp.float32)
            wy = _axis_weights(row, i, th, ty)  # [ch, 3]
            wx = _axis_weights(col, j, tw, tx)  # [ch, 3]
            # quadrant weights for all 9 neighbours in one [ch, 9] product
            wq = jnp.concatenate(
                [wy[:, dy : dy + 1] * wx for dy in range(3)], axis=1
            )
            outc = jnp.sum(vals * wq, axis=1, keepdims=True)  # [ch, 1]
            out_ref[0, j, :, c * ch : (c + 1) * ch] = outc.reshape(1, ch)


@partial(jax.jit, static_argnames=("clip", "tiles"))
def clahe_pallas(
    l: jnp.ndarray, clip: float = 3.0, tiles: tuple[int, int] = (8, 8)
) -> jnp.ndarray:
    """Pallas CLAHE on [B, H, W] float32 L-channel (0..255)."""
    B, H, W = l.shape
    ty, tx = tiles
    assert H % ty == 0 and W % tx == 0
    th, tw = H // ty, W // tx
    area = th * tw
    n_tiles = ty * tx

    pix = jnp.clip(jnp.round(l), 0, N_BINS - 1).astype(jnp.int32)
    # b (ty th) (tx tw) -> b (ty tx) 1 (th tw)
    tiled = (
        pix.reshape(B, ty, th, tx, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, n_tiles, 1, area)
    )

    lut = pl.pallas_call(
        partial(_hist_lut_kernel, area=area, clip=clip, tiles_per_step=tx),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, N_BINS), jnp.float32),
        grid=(B, ty),
        in_specs=[
            pl.BlockSpec(
                (1, tx, 1, area), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, tx, 1, N_BINS), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(tiled)

    out_tiled = pl.pallas_call(
        partial(_apply_kernel, th=th, tw=tw, ty=ty, tx=tx),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, area), jnp.float32),
        grid=(B, ty),
        in_specs=[
            pl.BlockSpec(
                (1, tx, 1, area), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_tiles, 1, N_BINS),
                lambda b, i: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tx, 1, area), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(tiled, lut)

    # b (ty tx) 1 (th tw) -> b (ty th) (tx tw)
    return (
        out_tiled.reshape(B, ty, tx, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, H, W)
    )
