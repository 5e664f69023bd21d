"""Pallas TPU kernels for fractional row shifts — the HBM-bandwidth
workhorse of every gather-free geometric op.

The XLA fallback (`ops.warp._shift_rows_frac`) implements the log-shift
cascade as ~9 jnp.roll+select passes, each of which materializes the full
batch in HBM (~2 GB of traffic per shear at 512²×32). These kernels run
the SAME cascade inside VMEM: one read + one write of HBM per shift
(~200 MB) — the round-1 lesson (lane-major CLAHE, 36→3.8 ms) applied to
the shear/warp family. Semantics are identical to the XLA path (bilinear
fractional blend, replicate border, same binary decomposition); tests
assert elementwise closeness.

Layouts: callers pass PLANAR rows [M, W] (image batches are transposed
NHWC→(B·C·H, W) by the wrappers in ops.warp so the shifted axis owns the
lanes; C=3 on lanes would waste 125/128 of the VPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cascade(x, s, W):
    """Roll x [R, W] left by per-row integer s [R, 1] (wrap)."""
    bit = 1
    while bit < W:
        rolled = pltpu.roll(x, (W - bit) % W, axis=1)
        take = (s & bit) != 0
        x = jnp.where(take, rolled, x)
        bit *= 2
    return x


def _shift_rows_kernel(off_ref, img_ref, out_ref, *, W):
    x = img_ref[...]  # [R, W]
    if x.dtype == jnp.uint8:  # widen via int32 (Mosaic u8→f32 routing)
        x = x.astype(jnp.int32).astype(jnp.float32)
    off = off_ref[...]  # [R, 1] f32
    k = jnp.floor(off)
    f = off - k
    s = jax.lax.rem(k.astype(jnp.int32), W)
    s = jnp.where(s < 0, s + W, s)

    a = _cascade(x, s, W)
    b = pltpu.roll(a, W - 1, axis=1)  # one more left-shift
    out = (1.0 - f) * a + f * b

    # replicate border: source columns outside [0, W-1]
    # (TPU iota must be integer — Mosaic gap, NOTES_ROUND1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], W), 1).astype(
        jnp.float32
    )
    src = xx + off
    left = jax.lax.broadcast_in_dim(x[:, 0], (x.shape[0], W), (0,))
    right = jax.lax.broadcast_in_dim(x[:, W - 1], (x.shape[0], W), (0,))
    out = jnp.where(src < 0.0, left, out)
    out = jnp.where(src > W - 1.0, right, out)
    if out_ref.dtype == jnp.uint8:
        out = (jnp.clip(out, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
            jnp.uint8
        )
    out_ref[...] = out


@partial(jax.jit, static_argnames=("block_rows", "out_dtype", "interpret"))
def shift_rows_pallas(
    rows: jnp.ndarray, off: jnp.ndarray, block_rows: int = 256, out_dtype=None,
    interpret: bool = False,
):
    """rows [M, W] f32/uint8, off [M] f32 → out[m, x] = rows[m, x + off[m]]
    (bilinear frac, replicate border). M must divide by block_rows.
    out_dtype defaults to the input dtype (uint8 in → uint8 out with the
    chain's round-half-up quantiser)."""
    M, W = rows.shape
    R = min(block_rows, M)
    while M % R:
        R //= 2
    grid = (M // R,)
    return pl.pallas_call(
        partial(_shift_rows_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct(
            (M, W), rows.dtype if out_dtype is None else out_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(off[:, None], rows)


def _shift_rows_pp_kernel(img_ref, off_ref, out_ref, *, W, max_shift):
    """Per-pixel bounded shift: out[r,x] = in[r, x+off[r,x]], |off|≤max_shift.
    Windowed taps with in-VMEM rolls (replicate border via src clamping).

    NOTE a per-pixel log-cascade (roll+select by the bits of the shift
    amount) was tried and is WRONG: after the first data-dependent select,
    a uniform roll moves values whose partial shifts belong to OTHER
    destination pixels — the butterfly invariant only holds for row-uniform
    shifts (tests/test_pallas_tpu.py caught 60% mismatch). The 2m+2 tap
    window is the correct gather-free form."""
    x = img_ref[...]  # [R, W]
    if x.dtype == jnp.uint8:  # widen via int32 (Mosaic u8→f32 routing)
        x = x.astype(jnp.int32).astype(jnp.float32)
    off = off_ref[...]  # [R, W]
    xx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1).astype(jnp.float32)
    src = jnp.clip(xx + off, 0.0, W - 1.0)
    rel = src - xx  # ∈ [-m, m]
    out = jnp.zeros_like(x)
    m = max_shift
    for k in range(-m, m + 2):
        w = jnp.maximum(1.0 - jnp.abs(rel - k), 0.0)
        tap = pltpu.roll(x, (W - k) % W, axis=1)
        # wrap-around taps point at the other edge; src clamping keeps the
        # needed taps in range except at the first/last m columns, where
        # replicate is enforced below
        out = out + w * tap
    left = jax.lax.broadcast_in_dim(x[:, 0], x.shape, (0,))
    right = jax.lax.broadcast_in_dim(x[:, W - 1], x.shape, (0,))
    out = jnp.where(src <= 0.0, left, out)
    out = jnp.where(src >= W - 1.0, right, out)
    if out_ref.dtype == jnp.uint8:
        out = (jnp.clip(out, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
            jnp.uint8
        )
    out_ref[...] = out


@partial(jax.jit, static_argnames=("max_shift", "block_rows", "out_dtype"))
def shift_rows_windowed_pallas(
    rows: jnp.ndarray, off: jnp.ndarray, max_shift: int, block_rows: int = 256,
    out_dtype=None,
):
    """rows [M, W] f32/uint8, off [M, W] (|off| ≤ max_shift) → per-pixel
    shifted; out_dtype defaults to the input dtype (uint8 → round-half-up
    u8 store)."""
    M, W = rows.shape
    R = min(block_rows, M)
    while M % R:
        R //= 2
    return pl.pallas_call(
        partial(_shift_rows_pp_kernel, W=W, max_shift=int(max_shift)),
        out_shape=jax.ShapeDtypeStruct(
            (M, W), rows.dtype if out_dtype is None else out_dtype
        ),
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(rows, off)


# ---------------------------------------------------------------------------
# Fused resample: butterfly shift + interpolation MATMUL in one VMEM
# residency — the per-axis building block of the gather-free affine warp
# (ops.warp._resample_rows_affine) without its separate shift-output and
# matmul-input HBM round-trips. Reads uint8 (or f32) planar rows, writes
# f32 resampled rows. Round-4 lever: the warp family is layout/HBM-bound.
# ---------------------------------------------------------------------------


def _resample_rows_kernel(off_ref, al_ref, r_ref, img_ref, out_ref, *, W):
    quant_u8 = out_ref.dtype == jnp.uint8
    x = img_ref[...]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32).astype(jnp.float32)
    off = off_ref[...]  # [R, 1] f32 (β(y) − r, per row)
    k = jnp.floor(off)
    f = off - k
    s = jax.lax.rem(k.astype(jnp.int32), W)
    s = jnp.where(s < 0, s + W, s)
    a = _cascade(x, s, W)
    b = pltpu.roll(a, W - 1, axis=1)
    tmp = (1.0 - f) * a + f * b
    # replicate border for the shift (source col of the SHIFT leaves range)
    xx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1).astype(jnp.float32)
    src = xx + off
    left = jax.lax.broadcast_in_dim(x[:, 0], x.shape, (0,))
    right = jax.lax.broadcast_in_dim(x[:, W - 1], x.shape, (0,))
    tmp = jnp.where(src < 0.0, left, tmp)
    tmp = jnp.where(src > W - 1.0, right, tmp)

    # interpolation matmul: out[y, xo] = Σ_x tmp[y, x] · max(0, 1−|c(xo)−x|)
    # with c(xo) = clip(α·xo + r, 0, W−1) — α, r constant within the block
    # (blocks never span images: block rows divide H)
    alpha = al_ref[0, 0]
    r = r_ref[0, 0]
    xs = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)
    xo = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1).astype(jnp.float32)
    coord = jnp.clip(alpha * xo + r, 0.0, W - 1.0)
    M = jnp.maximum(1.0 - jnp.abs(coord - xs), 0.0)  # [W(src), W(out)]
    res = jax.lax.dot_general(
        tmp, M, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if quant_u8:
        # u8 store (round-half-up) — the uint8-staged chain's quantiser;
        # used for the inter-pass intermediate of the two-pass warp, where
        # it quarters the transpose + second-pass-read HBM traffic for
        # ≤0.5 level of added interpolation error (cv2's own INTER_LINEAR
        # is 5-bit fixed point — coarser than this)
        res = (jnp.clip(res, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(
            jnp.uint8
        )
    out_ref[...] = res


@partial(jax.jit, static_argnames=("block_rows", "interpret", "out_dtype"))
def resample_rows_pallas(
    rows: jnp.ndarray,
    off: jnp.ndarray,
    alpha: jnp.ndarray,
    r: jnp.ndarray,
    block_rows: int = 128,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    """rows [M, W] uint8/f32, off/alpha/r [M] f32 →
    out[m, xo] = shifted(m)[clip(α_m·xo + r_m)] with bilinear taps — the
    exact per-axis semantics of ops.warp._resample_rows_affine, one HBM
    read + one write. Blocks must not span rows with different α/r: the
    caller aligns block_rows to divide H. out_dtype=uint8 stores the
    round-half-up quantisation (the chain's uint8-staging quantiser)."""
    M, W = rows.shape
    R = min(block_rows, M)
    while M % R:
        R //= 2
    grid = (M // R,)
    vec = lambda v: v[:, None]
    return pl.pallas_call(
        partial(_resample_rows_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct((M, W), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(vec(off), vec(alpha), vec(r), rows)
