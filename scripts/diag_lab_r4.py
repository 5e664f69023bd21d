#!/usr/bin/env python3
"""Localize fused-LAB parity gaps stage by stage (round-4 diagnostic).

History: the first on-chip run of perf_check_r4 saw max diff 6 / bit-equal
0.98949 vs the ≤1 / ≥0.995 contract while interpret mode passed; stage 1b/1c
here proved Mosaic and XLA:TPU evaluate the SAME exp/log composition
bit-identically and the gap was entirely XLA's dedicated cbrt/pow lowerings
— fixed by sharing one composition (ops/color.py). A second gap appeared on
RANDOM (saturated-color) inputs: the i16 fixed-point chroma transport
skipped the oracle's integer a/b rounding (cv2's u8 LAB lattice,
ops.clahe.clahe_rgb does jnp.round(rgb_to_lab)) and diverged up to ~20
levels — fixed by transporting the cv2 lattice itself as i8.

Stages compared, fused vs the XLA oracle, each isolated:
  1. forward: lq (quantized u8 L), da/db (i8 cv2-lattice chroma) from the
     Pallas forward kernel vs the same quantities from ops.color math;
  1b. Mosaic vs XLA running the SAME exp/log composition (lowering ULP);
  2. clahe: clahe_pallas(u8 in/u8 out) on the ORACLE's lq vs the XLA clahe
     on the same input — removes forward-kernel error from the CLAHE stage;
  3. backward: Pallas backward kernel fed the ORACLE's (l2, da, db) vs
     lab_to_rgb on the same inputs — isolates backward-kernel numerics;
  4. end-to-end vs the production oracle (clahe_rgb quant_l=True — what
     tests/test_pallas_tpu.py::test_legacy_photometrics_fused_vs_ref_wiring
     pins), on BOTH smooth synth images and saturated random ones.

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


def run(xu, tag):
    from mmtrs_tpu.ops.clahe import clahe as clahe_xla
    from mmtrs_tpu.ops.clahe import clahe_rgb
    from mmtrs_tpu.ops.color import lab_to_rgb, rgb_to_lab
    from mmtrs_tpu.ops.pallas import lab_kernels as LK
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

    B, H, W, _ = xu.shape
    xf = xu.astype(jnp.float32)
    print(f"\n######## input: {tag} ########", flush=True)

    # ---- oracle quantities (XLA): the cv2-u8 lattice (clahe_rgb's round) ----
    lab = jnp.round(rgb_to_lab(xf))
    lq_o = np.asarray(jnp.clip(lab[..., 0], 0, 255).astype(jnp.uint8))
    da_o = np.asarray(lab[..., 1] - 128.0).astype(np.int32)  # round(500(fx−fy))
    db_o = np.asarray(lab[..., 2] - 128.0).astype(np.int32)  # round(200(fy−fz))

    # ---- 1. forward kernel in isolation ----
    xp = xu.transpose(0, 3, 1, 2)
    da_f, db_f, lq_f = LK._plane_call(
        LK._fwd_kernel,
        (xp[:, 0], xp[:, 1], xp[:, 2]),
        (jnp.int8, jnp.int8, jnp.uint8),
        H, W, B,
    )
    print("== stage 1: forward kernel vs XLA cv2-lattice ==", flush=True)
    dlq = stat("lq (u8 L)", lq_f, lq_o)
    stat("da (i8 a-128)", np.asarray(da_f, np.int32), da_o)
    stat("db (i8 b-128)", np.asarray(db_f, np.int32), db_o)
    idx = np.argwhere(np.asarray(dlq) != 0)
    if len(idx):
        Ln = np.asarray(rgb_to_lab(xf)[..., 0])
        for s in [tuple(i) for i in idx[:6]]:
            print(
                f"   lq mismatch at {s}: L_xla={Ln[s]:.6f} "
                f"lq_xla={lq_o[s]} lq_fused={np.asarray(lq_f)[s]}",
                flush=True,
            )

    # ---- 1b. Mosaic vs XLA running the SAME exp/log math ----
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
        return (
            LK._q_i8_lattice(500.0 * (fx - fy)),
            LK._q_i8_lattice(200.0 * (fy - fz)),
            jnp.clip(jnp.round(Lk * (255.0 / 100.0)), 0.0, 255.0)
            .astype(jnp.int32).astype(jnp.uint8),
        )

    da_e, db_e, lq_e = fwd_xla(xp[:, 0], xp[:, 1], xp[:, 2])
    print("== stage 1b: Mosaic vs XLA running the SAME exp/log math ==", flush=True)
    stat("lq  (same-math)", lq_f, lq_e)
    stat("da  (same-math)", np.asarray(da_f, np.int32), np.asarray(da_e, np.int32))
    stat("db  (same-math)", np.asarray(db_f, np.int32), np.asarray(db_e, np.int32))

    # ---- 2. CLAHE stage on identical input ----
    print("== stage 2: clahe_pallas(u8->u8) vs XLA clahe on SAME lq ==", flush=True)
    lq_dev = jnp.asarray(lq_o)
    l2_p = clahe_pallas(lq_dev, out_dtype=jnp.uint8)
    l2_x = clahe_xla(lq_dev.astype(jnp.float32))
    l2_xq = (jnp.clip(l2_x, 0.0, 255.0) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    stat("l2 (u8 CLAHE out)", l2_p, l2_xq)

    # ---- 3. backward kernel on identical inputs ----
    print("== stage 3: backward kernel vs lab_to_rgb on SAME (l2,da,db) ==", flush=True)
    l2 = np.asarray(l2_xq)
    r2, g2, b2 = LK._plane_call(
        LK._bwd_kernel,
        (
            jnp.asarray(l2),
            jnp.asarray(np.clip(da_o, -128, 127), jnp.int8),
            jnp.asarray(np.clip(db_o, -128, 127), jnp.int8),
        ),
        (jnp.uint8, jnp.uint8, jnp.uint8),
        H, W, B,
    )
    got_b = np.stack([np.asarray(r2), np.asarray(g2), np.asarray(b2)], axis=-1)
    lab2 = jnp.stack(
        [
            jnp.asarray(l2, jnp.float32),
            jnp.asarray(da_o + 128.0, jnp.float32),
            jnp.asarray(db_o + 128.0, jnp.float32),
        ],
        axis=-1,
    )
    rgb_x = lab_to_rgb(lab2)
    want_b = np.asarray(
        (jnp.clip(rgb_x, 0, 255) + 0.5).astype(jnp.int32).astype(jnp.uint8)
    )
    db_ = stat("bwd RGB (u8)", got_b, want_b)
    if (db_ != 0).any():
        for s in [tuple(i) for i in np.argwhere(db_ != 0)[:6]]:
            print(
                f"   bwd mismatch at {s}: fused={got_b[s]} xla={want_b[s]} "
                f"l2={l2[s[:-1]]}",
                flush=True,
            )

    # ---- 4. end-to-end vs the PRODUCTION oracle (what the wiring test pins) ----
    print("== stage 4: end-to-end vs clahe_rgb(quant_l=True) ==", flush=True)
    got = np.asarray(LK.clahe_lab_fused(xu))
    want = np.asarray(
        (jnp.clip(clahe_rgb(xf, quant_l=True), 0, 255) + 0.5)
        .astype(jnp.int32).astype(jnp.uint8)
    )
    d = stat("fused vs clahe_rgb oracle", got, want)
    return d.max(), (d == 0).mean()


def main() -> int:
    from bench import synth_batch

    B = 16
    rng = np.random.default_rng(5)
    worst = []
    for tag, arr in (
        ("smooth synth 512²", synth_batch(B)),
        ("random uniform 512²", rng.uniform(0, 255, (B, 512, 512, 3)).astype(np.float32)),
        ("random uniform 128²", rng.uniform(0, 255, (8, 128, 128, 3)).astype(np.float32)),
    ):
        xu = jnp.clip(jnp.asarray(arr).astype(jnp.float32) + 0.5, 0, 255).astype(jnp.uint8)
        worst.append((tag, *run(xu, tag)))
    print(
        "\n==== summary (contract: bit-equal>=0.999, max<=32 — residual is"
        " 1-ULP compiler ties at the L quantizer, LUT-amplified) ====",
        flush=True,
    )
    ok = True
    for tag, mx, be in worst:
        flag = "OK " if (mx <= 32 and be >= 0.999) else "FAIL"
        ok &= mx <= 32 and be >= 0.999
        print(f"  [{flag}] {tag}: max {mx:.0f}  bit-equal {be:.5f}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
