#!/usr/bin/env python3
"""Localize the on-chip fused-LAB parity gap (perf_check_r4 saw max diff 6,
bit-equal 0.98949 vs the ≤1 / ≥0.995 contract; interpret mode passes).

Stages compared, fused vs the XLA oracle, each isolated:
  1. forward: lq (quantized u8 L), dx/dz (i16 deltas) from the Pallas
     forward kernel vs the same quantities computed with ops.color math;
  2. clahe: clahe_pallas(u8 in/u8 out) on the ORACLE's lq vs the XLA clahe
     on the same input — removes forward-kernel error from the CLAHE stage;
  3. backward: Pallas backward kernel fed the ORACLE's (l2, dx, dz) vs
     lab_to_rgb on the same inputs — isolates backward-kernel numerics;
  4. end-to-end, and end-to-end with fused-forward + XLA-rest (hybrid) to
     attribute the total.

Run on the TPU: python scripts/diag_lab_r4.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np


def stat(name, a, b):
    d = np.abs(np.asarray(a).astype(np.float64) - np.asarray(b).astype(np.float64))
    print(
        f"{name:34s} max {d.max():9.4f}  mean {d.mean():.6f}  "
        f"frac!=0 {(d != 0).mean():.5f}",
        flush=True,
    )
    return d


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.ops import pallas as _  # noqa: F401
    from mmtrs_tpu.ops.clahe import clahe as clahe_xla
    from mmtrs_tpu.ops.color import lab_to_rgb, rgb_to_lab
    from mmtrs_tpu.ops.pallas import lab_kernels as LK
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

    B = 32
    xu = jnp.asarray(synth_batch(B))
    xf = xu.astype(jnp.float32)

    # ---- oracle quantities (XLA) ----
    lab = rgb_to_lab(xf)
    L = lab[..., 0]
    # the fused forward quantizes L round-half-up before CLAHE
    lq_o = np.asarray(
        (jnp.clip(L, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    # deltas as the kernel defines them: fx−fy, fz−fy (f-space); color.py
    # stores a = 500(fx−fy)+128, b = 200(fy−fz)+128
    a_ = (lab[..., 1] - 128.0) / 500.0  # fx − fy
    b_ = (lab[..., 2] - 128.0) / 200.0  # fy − fz
    dx_o = np.asarray(jnp.clip(jnp.floor(a_ * 32768.0 + 0.5), -32767, 32767))
    dz_o = np.asarray(jnp.clip(jnp.floor(-b_ * 32768.0 + 0.5), -32767, 32767))

    # ---- 1. forward kernel in isolation ----
    xp = xu.transpose(0, 3, 1, 2)
    dx_f, dz_f, lq_f = LK._plane_call(
        LK._fwd_kernel,
        (xp[:, 0], xp[:, 1], xp[:, 2]),
        (jnp.int16, jnp.int16, jnp.uint8),
        512,
        512,
        B,
    )
    print("== stage 1: forward kernel vs XLA ==", flush=True)
    dlq = stat("lq (u8 L)", lq_f, lq_o)
    stat("dx (i16)", dx_f, dx_o)
    stat("dz (i16)", dz_f, dz_o)
    # where does lq disagree — near .5 boundaries?
    idx = np.argwhere(np.asarray(dlq) != 0)
    if len(idx):
        Ln = np.asarray(L)
        samples = [tuple(i) for i in idx[:8]]
        for s in samples:
            print(
                f"   lq mismatch at {s}: L_xla={Ln[s]:.6f} "
                f"lq_xla={lq_o[s]} lq_fused={np.asarray(lq_f)[s]}",
                flush=True,
            )

    # ---- 1b. does XLA:TPU exp/log == Mosaic exp/log? Reuse the kernel's own
    # plain-jnp helpers under XLA jit and compare against the kernel output.
    @jax.jit
    def fwd_xla(r, g, b):
        rl = LK._gamma_decode(r.astype(jnp.int32).astype(jnp.float32) / 255.0)
        gl = LK._gamma_decode(g.astype(jnp.int32).astype(jnp.float32) / 255.0)
        bl = LK._gamma_decode(b.astype(jnp.int32).astype(jnp.float32) / 255.0)
        X = 0.412453 * rl + 0.357580 * gl + 0.180423 * bl
        Y = 0.212671 * rl + 0.715160 * gl + 0.072169 * bl
        Z = 0.019334 * rl + 0.119193 * gl + 0.950227 * bl
        xn, yn, zn = X / LK._W_X, Y / LK._W_Y, Z / LK._W_Z
        fx, fy, fz = LK._f_lab(xn), LK._f_lab(yn), LK._f_lab(zn)
        Lk = jnp.where(yn > LK._LAB_DELTA, 116.0 * fy - 16.0, 903.3 * yn)
        return LK._q_i16(fx - fy), LK._q_i16(fz - fy), LK._q_u8(Lk * (255.0 / 100.0))

    dx_e, dz_e, lq_e = fwd_xla(xp[:, 0], xp[:, 1], xp[:, 2])
    print("== stage 1b: Mosaic vs XLA running the SAME exp/log math ==", flush=True)
    stat("lq  (same-math)", lq_f, lq_e)
    stat("dx  (same-math)", dx_f, dx_e)
    stat("dz  (same-math)", dz_f, dz_e)
    print("== stage 1c: XLA same-math vs XLA color.py (cbrt/pow) ==", flush=True)
    stat("lq  (exp/log vs cbrt)", lq_e, lq_o)

    # ---- 2. CLAHE stage on identical input ----
    print("== stage 2: clahe_pallas(u8->u8) vs XLA clahe on SAME lq ==", flush=True)
    lq_dev = jnp.asarray(lq_o)
    l2_p = clahe_pallas(lq_dev, out_dtype=jnp.uint8)
    l2_x = clahe_xla(lq_dev.astype(jnp.float32))
    l2_xq = (jnp.clip(l2_x, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    stat("l2 (u8 CLAHE out)", l2_p, l2_xq)

    # ---- 3. backward kernel on identical inputs ----
    print("== stage 3: backward kernel vs lab_to_rgb on SAME (l2,dx,dz) ==", flush=True)
    l2 = np.asarray(l2_xq)
    r2, g2, b2 = LK._plane_call(
        LK._bwd_kernel,
        (jnp.asarray(l2), jnp.asarray(dx_o, jnp.int16), jnp.asarray(dz_o, jnp.int16)),
        (jnp.uint8, jnp.uint8, jnp.uint8),
        512,
        512,
        B,
    )
    got_b = np.stack([np.asarray(r2), np.asarray(g2), np.asarray(b2)], axis=-1)
    # XLA equivalent from the SAME transported quantities (i16-dequantized)
    fx_d = jnp.asarray(dx_o, jnp.float32) / 32768.0
    fz_d = jnp.asarray(dz_o, jnp.float32) / 32768.0
    fyp = (jnp.asarray(l2, jnp.float32) * (100.0 / 255.0) + 16.0) / 116.0
    lab2 = jnp.stack(
        [
            jnp.asarray(l2, jnp.float32),
            500.0 * fx_d,
            200.0 * (-fz_d),
        ],
        axis=-1,
    )
    rgb_x = lab_to_rgb(lab2)
    want_b = np.asarray(
        (jnp.clip(rgb_x, 0, 255) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    db = stat("bwd RGB (u8)", got_b, want_b)
    if (db != 0).any():
        idx = np.argwhere(db != 0)
        for s in [tuple(i) for i in idx[:8]]:
            print(
                f"   bwd mismatch at {s}: fused={got_b[s]} xla={want_b[s]} "
                f"l2={l2[s[:-1]]}",
                flush=True,
            )

    # ---- 4. end-to-end attribution ----
    print("== stage 4: end-to-end ==", flush=True)
    got = np.asarray(LK.clahe_lab_fused(xu))
    l2o = clahe_xla(L)
    l2o = jnp.floor(jnp.clip(l2o, 0.0, 255.0) + 0.5)
    rgb = lab_to_rgb(jnp.concatenate([l2o[..., None], lab[..., 1:]], axis=-1))
    want = np.asarray(
        (jnp.clip(rgb, 0, 255) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    stat("fused vs oracle (perf_check #1)", got, want)
    # oracle-with-quantized-L: remove the quantize-before/after asymmetry
    l2q = clahe_xla(jnp.asarray(lq_o, jnp.float32))
    l2q = jnp.floor(jnp.clip(l2q, 0.0, 255.0) + 0.5)
    rgbq = lab_to_rgb(jnp.concatenate([l2q[..., None], lab[..., 1:]], axis=-1))
    wantq = np.asarray(
        (jnp.clip(rgbq, 0, 255) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    stat("fused vs oracle(quantized-L-in)", got, wantq)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
