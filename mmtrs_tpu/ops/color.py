"""Color-space conversions, batched and jit-able.

OpenCV 8-bit conventions (the reference pipeline operates on uint8 BGR via
cv2 — normalise.py:10-16, segment.py:37-39):
- LAB: L scaled to [0,255] (L*255/100), a/b offset by +128. cv2's Lab
  conversion applies the sRGB gamma (color_lab.cpp applyGamma) for BOTH 8U
  and 32F inputs — verified against cv2 5.0 (L of mid-gray = 53.6, not the
  linear-RGB 76.2; pinned in tests/test_cv2_goldens.py). Round 1 assumed
  linear RGB; the real-cv2 goldens caught it.
- HSV: H in [0,180), S,V in [0,255].
- GRAY: 0.299 R + 0.587 G + 0.114 B.

All functions take/return float32 arrays in the 0..255 range, channel-last,
any leading batch dims. We standardize on RGB channel order internally (the
host decode layer provides RGB); cv2's BGR is a view concern only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# D65 white point, sRGB primaries (OpenCV constants). The 3×3 transforms are
# applied as unrolled elementwise FMAs (VPU) rather than matmuls — tiny
# contractions would hit the MXU in bf16 and lose precision.
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XYZ2RGB = (
    (3.240479, -1.537150, -0.498535),
    (-0.969256, 1.875992, 0.041556),
    (0.055648, -0.204043, 1.057311),
)


def _mat3(m, a, b, c):
    return tuple(m[i][0] * a + m[i][1] * b + m[i][2] * c for i in range(3))
_WHITE = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)
_LAB_DELTA = 0.008856  # (6/29)^3
_LAB_K = 7.787


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


# ---------------------------------------------------------------------------
# Transcendentals. Round 2 replaced pow/cbrt with a Chebyshev x^2.4 poly and
# a bit-hack+Halley cube root; after the round-3 uint8 staging the chain is
# memory-lean enough that the VPU pow lowering WINS (measured b128: exact
# 9.5 ms vs poly 12.8 ms LAB round-trip — the deep Horner/Halley dependency
# chains serialize on the VPU while exp/log pipelines).
#
# Round 4: these are the ONE set of compositions shared by the XLA path and
# the Pallas LAB kernels (ops/pallas/lab_kernels.py imports them). The
# fused-LAB on-chip parity gap (perf_check_r4: max 6 levels, 98.95%
# bit-equal) was entirely XLA's dedicated cbrt/pow lowerings ULP-differing
# from the kernels' exp/log compositions at the L quantizer, amplified
# through the CLAHE LUT — measured by scripts/diag_lab_r4.py: Mosaic and
# XLA:TPU evaluate the SAME exp/log composition bit-identically for L
# (stage 1b: 0 mismatches), while XLA cbrt-vs-exp/log reproduces the whole
# gap (stage 1c). One composition everywhere ⇒ the quantized L plane is
# bit-equal across the fused kernels, the XLA fallback chain, and every
# platform.
# ---------------------------------------------------------------------------


def _pow_el(x, p):
    """x**p for x>0 via exp/log — Mosaic-lowerable AND bit-stable across
    XLA:TPU/Mosaic (diag_lab_r4 stage 1b); caller guards the domain."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-12)))


def _cbrt_fast(x):
    return _pow_el(jnp.maximum(x, 0.0), 1.0 / 3.0)


def _f_lab(t):
    return jnp.where(t > _LAB_DELTA, _cbrt_fast(t), _LAB_K * t + 16.0 / 116.0)


def _srgb_to_linear(x):
    xc = jnp.clip(x, 0.0, 1.0)
    return jnp.where(xc <= 0.04045, xc / 12.92, _pow_el((xc + 0.055) / 1.055, 2.4))


def _linear_to_srgb(y):
    y = jnp.maximum(y, 0.0)
    return jnp.where(
        y <= 0.0031308, 12.92 * y, 1.055 * _pow_el(y, 1.0 / 2.4) - 0.055
    )


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """float32 RGB 0..255 → OpenCV-8U-scaled LAB (L,a,b all 0..255-ish)."""
    x = _srgb_to_linear(rgb.astype(jnp.float32) / 255.0)
    X, Y, Z = _mat3(_RGB2XYZ, x[..., 0], x[..., 1], x[..., 2])
    xn, yn, zn = X / _WHITE[0], Y / _WHITE[1], Z / _WHITE[2]
    fx, fy, fz = _f_lab(xn), _f_lab(yn), _f_lab(zn)
    L = jnp.where(yn > _LAB_DELTA, 116.0 * fy - 16.0, 903.3 * yn)
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    return jnp.stack([L * 255.0 / 100.0, a, b], axis=-1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def inv_f(f):
        t3 = f**3
        return jnp.where(t3 > _LAB_DELTA, t3, (f - 16.0 / 116.0) / _LAB_K)

    X = inv_f(fx) * _WHITE[0]
    Y = inv_f(fy) * _WHITE[1]
    Z = inv_f(fz) * _WHITE[2]
    r, g, b2 = _mat3(_XYZ2RGB, X, Y, Z)
    srgb = _linear_to_srgb(jnp.stack([r, g, b2], axis=-1))
    return jnp.clip(srgb * 255.0, 0.0, 255.0)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """float32 RGB 0..255 → OpenCV-scaled HSV: H∈[0,180), S,V∈[0,255]."""
    x = rgb.astype(jnp.float32) / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r,
        (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, (h * 60.0) % 360.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h / 2.0, s * 255.0, v * 255.0], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h = (hsv[..., 0] * 2.0) % 360.0
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2] / 255.0
    c = v * s
    hp = h / 60.0
    xcomp = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select(
        [idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
        [c, xcomp, z, z, xcomp, c],
    )
    g = jnp.select(
        [idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
        [xcomp, c, c, xcomp, z, z],
    )
    b = jnp.select(
        [idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
        [z, z, xcomp, c, c, xcomp],
    )
    m = v - c
    return jnp.clip(jnp.stack([r + m, g + m, b + m], axis=-1) * 255.0, 0.0, 255.0)
