"""Fused LAB↔RGB Pallas kernels around CLAHE — the round-4 "mega-fusion".

The XLA chain materializes a full f32 LAB image between rgb_to_lab, the
CLAHE kernels, and lab_to_rgb (plus a concat), and re-runs the conversion
math per consumer. These kernels restructure the stage as PLANAR
elementwise passes:

    interleaved u8 RGB
      → (XLA) one u8 transpose to planes r,g,b
      → kernel A: gamma-decode + XYZ + f_lab per plane → cv2-lattice
        chroma planes a−128 = round(500(fx−fy)), b−128 = round(200(fy−fz))
        as int8 + quantized-L u8 plane (transcendentals run ONCE; fy
        cancels in the backward identity so only the chroma offsets
        travel — 2 B/px of inter-kernel traffic instead of 24)
      → (XLA) u8 tile transpose → existing CLAHE hist/apply kernels
        (mmtrs_tpu.ops.pallas.clahe_kernel, unchanged + exactness-tested)
      → kernel B: ΔfY identity — a,b are UNCHANGED by CLAHE, so
        fx'=fy'+(a−128)/500, fy'=f(L'), fz'=fy'−(b−128)/200 —
        cube/linear inverse + XYZ→RGB + gamma-encode → r',g',b' u8 planes
      → (XLA) one u8 interleave back to [B,H,W,3].

Planar layout means every kernel is pure elementwise [rows, W] work: no
channel rolls, no stride-3 relayouts, no redundant per-lane transcendental
work, and every HBM transpose moves 1-byte pixels.

Numerics: pow/cbrt are written as exp/log compositions (Mosaic has no
direct pow lowering), and — round 4 — the XLA path (ops/color.py) uses the
SAME compositions, imported from one place. diag_lab_r4.py measured on
real hardware that Mosaic and XLA:TPU evaluate these forms bit-identically
for the quantized L plane (the earlier max-6-level / 98.95% gap was
entirely XLA's dedicated cbrt/pow lowerings, amplified through the CLAHE
LUT). The chroma transport is the cv2 u8 LAB lattice itself — the XLA
oracle (ops.clahe.clahe_rgb) rounds a,b to integers per the reference's
uint8 cv2 data path (normalise.py:10-16 runs on a u8 image), and the
forward kernel stores exactly those integers (round-half-even, matching
jnp.round; valid sRGB keeps a−128 ∈ [−87,99], b−128 ∈ [−108,95], inside
i8). With L quantization and the chroma lattice bit-shared, the only
residual vs the oracle (clahe_rgb quant_l=True) is 1-ULP Mosaic-vs-XLA:TPU
ties exactly AT a rounding boundary (~2e-5 of pixels, diag_lab_r4),
which the CLAHE LUT can amplify to ~12 levels. Contract on ARBITRARY
inputs: ≥99.9% bit-equal, >1-level flips ≤1e-4, max ≤32 (the retired i16
fixed-point transport — which skipped the oracle's integer a/b rounding —
measured bit-equal 0.651 / max 20 on saturated random pixels; the cbrt
lowering bug 0.989: both far outside these bars). Pinned by
tests/test_pallas_tpu.py on-chip and interpret-mode on CPU (same
compiler → ≤1 level there).

Reference contract: normalise.py:10-16 (CLAHE on the LAB L channel of a
uint8 image, cv2 conventions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmtrs_tpu.ops.color import (  # ONE transcendental composition everywhere:
    _f_lab,  # the XLA fallback chain and these kernels must quantize L
    _linear_to_srgb,  # identically (diag_lab_r4: Mosaic == XLA:TPU bit-exact
    _pow_el,  # on the shared exp/log forms; XLA cbrt/pow ULP-differs)
    _srgb_to_linear,
)
from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

_LAB_DELTA = 0.008856  # (6/29)^3
_LAB_K = 7.787
_W_X, _W_Y, _W_Z = 0.950456, 1.0, 1.088754


# Shared with ops/color.py (imported above) so the fused kernels and the
# XLA fallback quantize L bit-identically on every platform. Module-level
# aliases kept for callers/diagnostics that reach in by the kernel names.
_pow = _pow_el
_gamma_decode = _srgb_to_linear  # sRGB channel 0..1 → linear
_gamma_encode = _linear_to_srgb  # linear → sRGB 0..1


def _u8f(ref):
    return ref[...].astype(jnp.int32).astype(jnp.float32)


def _q_u8(v):
    return (jnp.clip(v, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)


# Inter-kernel transport: the backward pass only ever uses fx and fz
# rebuilt around fy' = f(L'), i.e. fx' = fy' + (a−128)/500 and
# fz' = fy' − (b−128)/200 — fy itself CANCELS. The forward kernel emits
# the cv2-u8-lattice chroma offsets a−128, b−128 as int8 (the SAME
# integers the XLA oracle's jnp.round(rgb_to_lab) produces — the
# reference's uint8 cv2 data path), cutting the inter-kernel HBM traffic
# from three f32 planes (24 B/px round-trip) to two i8 planes (2 B/px)
# plus the u8 L plane.


def _q_i8_lattice(v):
    # round-half-even like jnp.round in the XLA oracle; clip before the
    # int cast (int32→int8 wraps on overflow, it does not saturate)
    return jnp.clip(jnp.round(v), -128.0, 127.0).astype(jnp.int32).astype(
        jnp.int8
    )


def _i8f(ref):
    return ref[...].astype(jnp.int32).astype(jnp.float32)


def _fwd_kernel(r_ref, g_ref, b_ref, da_ref, db_ref, lq_ref):
    r = _gamma_decode(_u8f(r_ref) / 255.0)
    g = _gamma_decode(_u8f(g_ref) / 255.0)
    b = _gamma_decode(_u8f(b_ref) / 255.0)
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    xn, yn, zn = X / _W_X, Y / _W_Y, Z / _W_Z
    fx, fy, fz = _f_lab(xn), _f_lab(yn), _f_lab(zn)
    L = jnp.where(yn > _LAB_DELTA, 116.0 * fy - 16.0, 903.3 * yn)
    da_ref[...] = _q_i8_lattice(500.0 * (fx - fy))
    db_ref[...] = _q_i8_lattice(200.0 * (fy - fz))
    # round-half-even to match the oracle's jnp.round(rgb_to_lab) L plane
    lq_ref[...] = (
        jnp.clip(jnp.round(L * (255.0 / 100.0)), 0.0, 255.0)
        .astype(jnp.int32)
        .astype(jnp.uint8)
    )


def _bwd_kernel(l2_ref, da_ref, db_ref, r_ref, g_ref, b_ref):
    # l2 arrives as uint8 — cv2's CLAHE output dtype (saturate_cast<uchar>)
    fyp = (_u8f(l2_ref) * (100.0 / 255.0) + 16.0) / 116.0
    fx = fyp + _i8f(da_ref) * (1.0 / 500.0)
    fz = fyp - _i8f(db_ref) * (1.0 / 200.0)

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
    # 16-aligned (all planes are now 1-byte — u8 L + i8 chroma — whose
    # native tile is 32 rows; supports() additionally demands %32 below)
    for rows in range(min(128, H // 16 * 16), 15, -16):
        if H % rows == 0:
            return rows
    raise ValueError(f"no 16-aligned row block for H={H}")


def supports(H: int, W: int, tiles=(8, 8)) -> bool:
    if not (
        W % 128 == 0 and H % 16 == 0 and H % tiles[0] == 0 and W % tiles[1] == 0
    ):
        return False
    # u8/i8 plane stores are only validated on native 32-row tile blocks
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


@partial(jax.jit, static_argnames=("clip", "tiles", "interpret", "planar_in",
                                   "planar_out"))
def clahe_lab_fused(
    imgs: jnp.ndarray,
    clip: float = 3.0,
    tiles: tuple[int, int] = (8, 8),
    interpret: bool = False,
    planar_in: bool = False,
    planar_out: bool = False,
):
    """RGB 0..255 → CLAHE-on-LAB-L → uint8 RGB.

    Default layout is interleaved [B,H,W,3] in/out. ``planar_in`` accepts a
    3-tuple of u8 planes (r, g, b) each [B,H,W]; ``planar_out`` returns one
    — the planar-chain contract (round 5): stages exchange separate plane
    arrays so NO stack/transpose pass exists between Pallas stages, only
    one planarize at chain entry and one interleave at exit.

    Drop-in for rgb_to_lab → clahe(L) → lab_to_rgb → uint8-stage on TPU.
    Parity vs that composition is distribution-shaped (≥99.9% bit-equal,
    >1-level flips ≤1e-3, max ≤32 from LUT-amplified 1-ULP compiler ties
    at a rounding boundary) — see the module docstring for the contract
    and tests/test_pallas_tpu.py for its enforcement."""
    if planar_in:
        r, g, b = imgs
        assert r.dtype == jnp.uint8
        B, H, W = r.shape
        assert supports(H, W, tiles)
    else:
        B, H, W, C = imgs.shape
        assert C == 3 and supports(H, W, tiles)
        xq = (
            imgs
            if imgs.dtype == jnp.uint8
            else (jnp.clip(imgs, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
        )
        xp = xq.transpose(0, 3, 1, 2)  # ONE u8 transpose to planes
        r, g, b = xp[:, 0], xp[:, 1], xp[:, 2]

    da, db, lq = _plane_call(
        _fwd_kernel, (r, g, b),
        (jnp.int8, jnp.int8, jnp.uint8),
        H, W, B, interpret,
    )
    # existing exactness-tested CLAHE kernels — u8 in AND u8 out (cv2's
    # CLAHE contract; also 1 byte/px through the tile transposes)
    l2 = clahe_pallas(lq, clip=clip, tiles=tiles, interpret=interpret,
                      out_dtype=jnp.uint8)
    r2, g2, b2 = _plane_call(
        _bwd_kernel, (l2, da, db),
        (jnp.uint8, jnp.uint8, jnp.uint8),
        H, W, B, interpret,
    )
    if planar_out:
        return (r2, g2, b2)
    return jnp.stack([r2, g2, b2], axis=-1)  # ONE u8 interleave back
