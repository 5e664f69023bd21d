"""Fused Pallas TPU kernel for the pointwise photometric augment stretch.

The ``legacy`` preset's pointwise members — RandomBrightnessContrast,
HueSaturationValue, GaussNoise, CoarseDropout (augment_records.py:94-130)
— each cost a full-batch HBM read+write as separate XLA stages (~3.2 ms
per pass at [128,512,512,3] f32; the round-3 profile put the stage at
~34 ms of an ~80 ms chain). This kernel fuses them into ONE HBM
read+write with **per-image scalar predication**: parameters live in
SMEM, each `pl.when` branch is skipped entirely for images whose gate
didn't fire, and GaussNoise uses the on-core hardware PRNG
(`pltpu.prng_seed`/`prng_random_bits` + Box–Muller) instead of a
materialized threefry tensor.

Layout: the [B, H, W, 3] image is viewed as [B, H, W·3] (free reshape —
channels are already lane-adjacent in memory), so lanes = W·3 and every
vector op runs at full VPU width. The HSV round-trip needs the 3
channels of a pixel together: they sit in adjacent lanes, so r/g/b are
assembled with two lane-rolls and results broadcast back with two more —
no gathers, no relayouts.

Semantics (shared with the XLA oracle ``photometrics_pointwise_ref`` in
mmtrs_tpu.ops.augment, which tests pin): bc → hsv → noise → dropout,
each exactly matching the standalone ops in ops/augment.py. Only the
noise BITS differ between kernel and oracle (hardware PRNG vs threefry)
— noise parity is statistical, like the albumentations parity itself
(SURVEY §7 hard-part 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# params column layout (f32): see photometric_params_legacy in ops/augment.py
P_BRIGHT, P_CONTRAST, P_DH, P_DS, P_DV, P_USE_HSV, P_SIGMA, P_DROP, P_Y0, P_X0 = (
    range(10)
)
N_PARAMS = 10


def _hsv_shift_interleaved(x, dh, ds, dv, ch):
    """HueSaturationValue on a [rows, W·3] interleaved-RGB block.

    Matches ops.augment.hsv_shift (rgb_to_hsv → +shift → hsv_to_rgb,
    OpenCV scales H∈[0,180), S,V∈[0,255]) elementwise.
    """
    # channels of one pixel sit at lanes 3k, 3k+1, 3k+2 (pltpu.roll is
    # circular and takes non-negative shifts: W3-k ≡ -k)
    W3 = x.shape[1]
    y1 = pltpu.roll(x, W3 - 1, axis=1)
    y2 = pltpu.roll(x, W3 - 2, axis=1)
    # valid at ch==0 lanes only (garbage elsewhere, masked before broadcast)
    r, g, b = x / 255.0, y1 / 255.0, y2 / 255.0
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r,
        (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, (h * 60.0) % 360.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)

    hh = ((h / 2.0 + dh) % 180.0) * 2.0
    ss = jnp.clip(s * 255.0 + ds, 0.0, 255.0) / 255.0
    vv = jnp.clip(v * 255.0 + dv, 0.0, 255.0) / 255.0

    cc = vv * ss
    hp = hh / 60.0
    xcomp = cc * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    z = jnp.zeros_like(cc)

    def pick(t0, t1, t2, t3, t4, t5):
        # jnp.select lowers to an unsupported argmax reduce in Mosaic —
        # nested where chains are pure VPU selects
        return jnp.where(
            idx == 0, t0,
            jnp.where(idx == 1, t1,
                      jnp.where(idx == 2, t2,
                                jnp.where(idx == 3, t3,
                                          jnp.where(idx == 4, t4, t5)))),
        )

    rp = pick(cc, xcomp, z, z, xcomp, cc)
    gp = pick(xcomp, cc, cc, xcomp, z, z)
    bp = pick(z, z, xcomp, cc, cc, xcomp)
    m = vv - cc
    is0 = ch == 0
    r_out = jnp.where(is0, jnp.clip((rp + m) * 255.0, 0.0, 255.0), 0.0)
    g_out = jnp.where(is0, jnp.clip((gp + m) * 255.0, 0.0, 255.0), 0.0)
    b_out = jnp.where(is0, jnp.clip((bp + m) * 255.0, 0.0, 255.0), 0.0)
    # broadcast each pixel's (r,g,b) from its ch-0 lane to lanes +1/+2
    return r_out + pltpu.roll(g_out, 1, axis=1) + pltpu.roll(b_out, 2, axis=1)


def _normal_bits(shape):
    """Standard normals from one hardware-PRNG draw: 16-bit u1/u2 halves →
    Box–Muller. 16-bit uniforms bound the tails at ~4.7σ — irrelevant for
    noise whose σ ≤ √15 intensity levels."""
    bits = pltpu.prng_random_bits(shape).astype(jnp.int32)
    # uint32->f32 is unsupported in Mosaic; both 16-bit halves fit in int32
    u1 = (bits & 0xFFFF).astype(jnp.float32) * (1.0 / 65536.0)
    u2 = (
        jax.lax.shift_right_logical(bits, 16) & 0xFFFF
    ).astype(jnp.float32) * (1.0 / 65536.0)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _quant_u8(v):
    """round-half-up → uint8 (uint8 staging after every op, like the
    reference's albumentations chain; must match ``_qf`` in ops/augment)."""
    return (jnp.clip(v, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)


def _photometric_kernel(
    par_ref, seed_ref, x_ref, out_ref, *, rows, W3, hole, with_noise=True
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, W3), 1)
    ch = lane % 3

    def load():
        # uint8→f32 must route through int32 in Mosaic
        return out_ref[0].astype(jnp.int32).astype(jnp.float32)

    br = par_ref[b, P_BRIGHT]
    ct = par_ref[b, P_CONTRAST]
    # RandomBrightnessContrast; the store quantises to uint8 — every stage
    # boundary is uint8, exactly like the reference's albumentations chain.
    # x_ref is uint8 (¼ the HBM read traffic of the former f32 input);
    # the widen must route through int32 in Mosaic.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    out_ref[0] = _quant_u8(x * (1.0 + ct) + br * 255.0)

    @pl.when(par_ref[b, P_USE_HSV] > 0.0)
    def _():
        out_ref[0] = _quant_u8(_hsv_shift_interleaved(
            load(), par_ref[b, P_DH], par_ref[b, P_DS], par_ref[b, P_DV], ch
        ))

    if with_noise:  # pltpu.prng_* has no CPU interpret lowering
        @pl.when(par_ref[b, P_SIGMA] > 0.0)
        def _():
            pltpu.prng_seed(seed_ref[b] + i)
            n = _normal_bits((rows, W3))
            out_ref[0] = _quant_u8(load() + n * par_ref[b, P_SIGMA])

    @pl.when(par_ref[b, P_DROP] > 0.0)
    def _():
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, W3), 0) + i * rows
        ).astype(jnp.float32)
        col = (lane // 3).astype(jnp.float32)
        y0 = par_ref[b, P_Y0]
        x0 = par_ref[b, P_X0]
        in_hole = (
            (row >= y0) & (row < y0 + hole) & (col >= x0) & (col < x0 + hole)
        )
        out_ref[0] = jnp.where(in_hole, jnp.uint8(0), out_ref[0])


def _row_block(H: int) -> int:
    """Largest 8-aligned divisor of H that is <=128 (sublane tile height).
    H % 8 == 0 guarantees rows=8 qualifies, so this never fails under
    supports()."""
    for rows in range(min(128, H // 8 * 8), 7, -8):
        if H % rows == 0:
            return rows
    raise ValueError(f"no 8-aligned row block for H={H}")


def supports(H: int, W: int) -> bool:
    """Mosaic constraints: lanes (W·3) must tile into full 128-lane vregs so
    the channel rolls stay exact; sublane blocks need f32 8-row tiles (the
    row block is always an 8-aligned divisor of H, see _row_block)."""
    return (W * 3) % 128 == 0 and H % 8 == 0


@partial(jax.jit, static_argnames=("hole", "interpret"))
def photometrics_fused_pallas(
    imgs: jnp.ndarray, params: jnp.ndarray, seeds: jnp.ndarray, hole: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """imgs [B,H,W,3] **uint8**, params [B,10] f32, seeds [B] int32 →
    bc→hsv→noise→dropout in one HBM pass, uint8 in AND out (¼ the
    read+write traffic of the former f32 input, and the contract the
    reference's uint8 chain has anyway)."""
    B, H, W, C = imgs.shape
    assert C == 3 and supports(H, W)
    assert imgs.dtype == jnp.uint8, "uint8-staged input required"
    W3 = W * 3
    rows = _row_block(H)
    x = imgs.reshape(B, H, W3)

    out = pl.pallas_call(
        partial(_photometric_kernel, rows=rows, W3=W3, hole=float(hole),
                with_noise=not interpret),
        out_shape=jax.ShapeDtypeStruct((B, H, W3), jnp.uint8),
        grid=(B, H // rows),
        in_specs=[
            pl.BlockSpec((B, N_PARAMS), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B,), lambda b, i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, W3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, W3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params, seeds.astype(jnp.int32), x)
    return out.reshape(B, H, W, 3)
