"""Fused LAB↔RGB Pallas kernels around CLAHE — the round-4 "mega-fusion".

The XLA chain materializes a full f32 LAB image between rgb_to_lab, the
CLAHE kernels, and lab_to_rgb (plus a concat), and re-runs the conversion
math per consumer. These kernels restructure the stage as PLANAR
elementwise passes:

    interleaved u8 RGB
      → (XLA) one u8 transpose to planes r,g,b
      → kernel A: gamma-decode + XYZ + f_lab per plane → (fx−fy),(fz−fy)
        i16 fixed-point planes + quantized-L u8 plane (transcendentals run
        ONCE; fy cancels in the backward identity so only the two deltas
        travel — 4 B/px of inter-kernel traffic instead of 24)
      → (XLA) u8 tile transpose → existing CLAHE hist/apply kernels
        (mmtrs_tpu.ops.pallas.clahe_kernel, unchanged + exactness-tested)
      → kernel B: ΔfY identity — a=500(fx−fy), b=200(fy−fz) are UNCHANGED
        by CLAHE, so fx'=fy'+(fx−fy), fy'=f(L'), fz'=fy'+(fz−fy) —
        cube/linear inverse + XYZ→RGB + gamma-encode → r',g',b' u8 planes
      → (XLA) one u8 interleave back to [B,H,W,3].

Planar layout means every kernel is pure elementwise [rows, W] work: no
channel rolls, no stride-3 relayouts, no redundant per-lane transcendental
work, and every HBM transpose moves 1-byte pixels.

Numerics: pow/cbrt are written as exp/log compositions (Mosaic has no
direct pow lowering); quantization is round-half-up like the rest of the
uint8-staged chain. Parity with the XLA composition
(rgb_to_lab → clahe → lab_to_rgb → quantize) is ≤1 level with ≥99.5%
bit-equality — f32 exp/log ULP straddles at the quantizer plus ~0.3%
single-level flips from the i16 delta transport (step 2^-15 → ≤~0.02
output levels of perturbation, visible only within that distance of a
.5 rounding boundary) — pinned by tests/test_pallas_tpu.py on-chip and
interpret-mode on CPU.

Reference contract: normalise.py:10-16 (CLAHE on the LAB L channel of a
uint8 image, cv2 conventions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

_LAB_DELTA = 0.008856  # (6/29)^3
_LAB_K = 7.787
_W_X, _W_Y, _W_Z = 0.950456, 1.0, 1.088754


def _pow(x, p):
    """x**p for x>0 via exp/log (Mosaic-lowerable); caller guards domain."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-12)))


def _gamma_decode(u):  # sRGB channel 0..1 → linear
    return jnp.where(u <= 0.04045, u / 12.92, _pow((u + 0.055) / 1.055, 2.4))


def _gamma_encode(y):  # linear → sRGB 0..1
    y = jnp.maximum(y, 0.0)
    return jnp.where(y <= 0.0031308, 12.92 * y, 1.055 * _pow(y, 1.0 / 2.4) - 0.055)


def _f_lab(t):
    return jnp.where(
        t > _LAB_DELTA, _pow(t, 1.0 / 3.0), _LAB_K * t + 16.0 / 116.0
    )


def _u8f(ref):
    return ref[...].astype(jnp.int32).astype(jnp.float32)


def _q_u8(v):
    return (jnp.clip(v, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)


# Inter-kernel transport: the backward pass only ever uses fx+d and fz+d
# with d = fy' − fy, i.e. fx' = fy' + (fx−fy) and fz' = fy' + (fz−fy) — fy
# itself CANCELS. So the forward kernel emits just the two deltas, in i16
# fixed point (|fx−fy| ≤ 0.862 < 1; step 2^-15 ≈ 3e-5 → ≪ 0.5 output
# level), cutting the inter-kernel HBM traffic from three f32 planes
# (24 B/px round-trip) to two i16 planes (4 B/px) plus the u8 L plane.
_DELTA_SCALE = 32768.0


def _q_i16(v):
    return jnp.clip(
        jnp.floor(v * _DELTA_SCALE + 0.5), -32767.0, 32767.0
    ).astype(jnp.int16)


def _i16f(ref):
    return ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / _DELTA_SCALE)


def _fwd_kernel(r_ref, g_ref, b_ref, dx_ref, dz_ref, lq_ref):
    r = _gamma_decode(_u8f(r_ref) / 255.0)
    g = _gamma_decode(_u8f(g_ref) / 255.0)
    b = _gamma_decode(_u8f(b_ref) / 255.0)
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    xn, yn, zn = X / _W_X, Y / _W_Y, Z / _W_Z
    fx, fy, fz = _f_lab(xn), _f_lab(yn), _f_lab(zn)
    L = jnp.where(yn > _LAB_DELTA, 116.0 * fy - 16.0, 903.3 * yn)
    dx_ref[...] = _q_i16(fx - fy)
    dz_ref[...] = _q_i16(fz - fy)
    lq_ref[...] = _q_u8(L * (255.0 / 100.0))


def _bwd_kernel(l2_ref, dx_ref, dz_ref, r_ref, g_ref, b_ref):
    # l2 arrives as uint8 — cv2's CLAHE output dtype (saturate_cast<uchar>)
    fyp = (_u8f(l2_ref) * (100.0 / 255.0) + 16.0) / 116.0
    fx = fyp + _i16f(dx_ref)
    fz = fyp + _i16f(dz_ref)

    def inv_f(f):
        t3 = f * f * f
        return jnp.where(t3 > _LAB_DELTA, t3, (f - 16.0 / 116.0) / _LAB_K)

    X = inv_f(fx) * _W_X
    Y = inv_f(fyp) * _W_Y
    Z = inv_f(fz) * _W_Z
    r = 3.240479 * X - 1.537150 * Y - 0.498535 * Z
    g = -0.969256 * X + 1.875992 * Y + 0.041556 * Z
    b = 0.055648 * X - 0.204043 * Y + 1.057311 * Z
    r_ref[...] = _q_u8(_gamma_encode(r) * 255.0)
    g_ref[...] = _q_u8(_gamma_encode(g) * 255.0)
    b_ref[...] = _q_u8(_gamma_encode(b) * 255.0)


def _plane_rows(H: int) -> int:
    # 16-aligned: the i16 delta planes need 16-row sublane tiles (f32 needs
    # 8, u8 is masked fine at 16). supports() guarantees existence (16 | H).
    for rows in range(min(128, H // 16 * 16), 15, -16):
        if H % rows == 0:
            return rows
    raise ValueError(f"no 16-aligned row block for H={H}")


def supports(H: int, W: int, tiles=(8, 8)) -> bool:
    if not (
        W % 128 == 0 and H % 16 == 0 and H % tiles[0] == 0 and W % tiles[1] == 0
    ):
        return False
    # u8/i16 plane stores are only validated on native 32-row tile blocks
    # (the production 512² geometry); odd serve-bucketed heights fall back
    # to the XLA composition
    try:
        return _plane_rows(H) % 32 == 0
    except ValueError:  # pragma: no cover
        return False


def _plane_call(kernel, ins, out_dtypes, H, W, B, interpret=False):
    rows = _plane_rows(H)
    spec = pl.BlockSpec((1, rows, W), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((B, H, W), d) for d in out_dtypes],
        grid=(B, H // rows),
        in_specs=[spec] * len(ins),
        out_specs=[spec] * len(out_dtypes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


@partial(jax.jit, static_argnames=("clip", "tiles", "interpret"))
def clahe_lab_fused(
    imgs: jnp.ndarray,
    clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    interpret: bool = False,
) -> jnp.ndarray:
    """[B,H,W,3] uint8/float RGB 0..255 → CLAHE-on-LAB-L → uint8 RGB.

    Drop-in for rgb_to_lab → clahe(L) → lab_to_rgb → uint8-stage on TPU
    (parity ≤1 level vs that composition; see module docstring)."""
    B, H, W, C = imgs.shape
    assert C == 3 and supports(H, W, tiles)
    xq = (
        imgs
        if imgs.dtype == jnp.uint8
        else (jnp.clip(imgs, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    xp = xq.transpose(0, 3, 1, 2)  # ONE u8 transpose to planes
    r, g, b = xp[:, 0], xp[:, 1], xp[:, 2]

    dx, dz, lq = _plane_call(
        _fwd_kernel, (r, g, b),
        (jnp.int16, jnp.int16, jnp.uint8),
        H, W, B, interpret,
    )
    # existing exactness-tested CLAHE kernels — u8 in AND u8 out (cv2's
    # CLAHE contract; also 1 byte/px through the tile transposes)
    l2 = clahe_pallas(lq, clip=clip, tiles=tiles, interpret=interpret,
                      out_dtype=jnp.uint8)
    r2, g2, b2 = _plane_call(
        _bwd_kernel, (l2, dx, dz),
        (jnp.uint8, jnp.uint8, jnp.uint8),
        H, W, B, interpret,
    )
    return jnp.stack([r2, g2, b2], axis=-1)  # ONE u8 interleave back
