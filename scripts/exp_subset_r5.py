#!/usr/bin/env python3
"""Micro-experiments for the round-5 glue hunt (run AFTER perf_check_r5):

Where does the ~6 ms of subset_apply overhead (3 photometric subsets) and
deskew's ~3 ms no-op cost actually live — the nested lax.cond structure,
the scatter-back, or the capped op itself? And what does crop_warp_fused's
final combined-mask `where` pass cost?

Run on the TPU:  python scripts/exp_subset_r5.py [batch]
Prints a table; writes reports/exp_subset_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np


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
    print(f"{name:52s} {dt:8.2f} ms   [compile {compile_s:.0f}s]", flush=True)
    return dt


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.ops import augment as A
    from mmtrs_tpu.ops.pallas.lab_kernels import clahe_lab_fused
    from mmtrs_tpu.utils.rng import keys_for_batch

    assert jax.devices()[0].platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = 512
    x0 = jnp.asarray(synth_batch(B))
    variants = [jnp.clip(x0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
                for i in range(4)]
    args = [(v,) for v in variants]
    keys = keys_for_batch(42, np.arange(B), np.ones(B))

    # clahe-subset gates exactly as legacy_photometrics derives them
    hole = max(1, S // 24)
    params, nk, use_clahe = A.photometric_params_legacy(keys, S, S, hole)
    cap = A._subset_cap(B, 0.5 / 3.0)
    print(f"B={B} cap(clahe)={cap} expected-firing={B/6:.0f}", flush=True)

    res = {}

    def op(s):
        return clahe_lab_fused(s, clip=2.0, tiles=(8, 8))

    # V0: production subset_apply (outer ==0 cond + inner <=cap cond)
    res["v0_current"] = timeit(
        "V0 subset_apply (nested conds, production)",
        jax.jit(lambda v: A.subset_apply(op, v, use_clahe, cap)), args)

    # V1: single cond (<=cap vs full), no ==0 short-circuit
    def v1(v):
        count = jnp.sum(use_clahe.astype(jnp.int32))
        def subset_path(_):
            idx = jnp.argsort(~use_clahe, stable=True)[:cap]
            sub = jnp.take(v, idx, axis=0)
            sub_out = op(sub)
            keep = use_clahe[idx][:, None, None, None]
            return v.at[idx].set(jnp.where(keep, sub_out, sub))
        def full_path(_):
            return jnp.where(use_clahe[:, None, None, None], op(v), v)
        return jax.lax.cond(count <= cap, subset_path, full_path, None)
    res["v1_single_cond"] = timeit("V1 single cond (<=cap | full)",
                                   jax.jit(v1), args)

    # V2: no cond at all — subset always, overflow rows silently unprocessed
    def v2(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        sub_out = op(sub)
        keep = use_clahe[idx][:, None, None, None]
        return v.at[idx].set(jnp.where(keep, sub_out, sub))
    res["v2_no_cond"] = timeit("V2 no cond (subset always)", jax.jit(v2), args)

    # V3: gather + op only (no scatter-back) — lower bound on the op side
    def v3(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        return op(jnp.take(v, idx, axis=0))
    res["v3_gather_op_only"] = timeit("V3 gather+op only (no scatter)",
                                      jax.jit(v3), args)

    # V4: scatter only (no op) — the scatter's own cost
    def v4(v):
        idx = jnp.argsort(~use_clahe, stable=True)[:cap]
        sub = jnp.take(v, idx, axis=0)
        return v.at[idx].set(sub)
    res["v4_scatter_only"] = timeit("V4 gather+scatter only (no op)",
                                    jax.jit(v4), args)

    # --- deskew: the never-fires case ---------------------------------------
    from mmtrs_tpu.ops.deskew import deskew_batch, estimate_skew_angle

    res["d0_deskew_current"] = timeit("D0 deskew_batch (production)",
                                      jax.jit(lambda v: deskew_batch(v)[0]), args)
    res["d1_estimate_only"] = timeit("D1 estimate_skew_angle only",
                                     jax.jit(estimate_skew_angle), args)

    # D2: pooled-first gray estimate (pool u8 4x4 then luma — linear ops
    # commute; 16x less gray-stage traffic)
    def d2(v):
        B_, H, W, _ = v.shape
        h4, w4 = (H // 4) * 4, (W // 4) * 4
        g = v[:, :h4, :w4].astype(jnp.float32).reshape(B_, h4 // 4, 4, w4 // 4, 4, 3)
        pooled = g.mean(axis=(2, 4))  # [B,128,128,3]
        gray = (0.299 * pooled[..., 0] + 0.587 * pooled[..., 1]
                + 0.114 * pooled[..., 2])
        # estimate_skew_angle's downsample flag is static; replicate its
        # canny+moments on the pre-pooled gray directly
        from mmtrs_tpu.ops import deskew as D
        m = D.canny_lite(gray, 50.0, 150.0).astype(jnp.float32)
        Bq, H2, W2 = m.shape
        ys = jnp.arange(H2, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(W2, dtype=jnp.float32)[None, None, :]
        n = jnp.sum(m, axis=(1, 2))
        safe_n = jnp.maximum(n, 1.0)
        my = jnp.sum(m * ys, axis=(1, 2)) / safe_n
        mx = jnp.sum(m * xs, axis=(1, 2)) / safe_n
        dy = ys - my[:, None, None]
        dx = xs - mx[:, None, None]
        denom = jnp.maximum(n - 1.0, 1.0)
        vyy = jnp.sum(m * dy * dy, axis=(1, 2)) / denom
        vxx = jnp.sum(m * dx * dx, axis=(1, 2)) / denom
        vyx = jnp.sum(m * dy * dx, axis=(1, 2)) / denom
        return jnp.rad2deg(0.5 * jnp.arctan2(2.0 * vyx, vxx - vyy))
    res["d2_pool_first"] = timeit("D2 estimate, pool-before-gray", jax.jit(d2), args)

    # --- crop_warp_fused: mask pass cost ------------------------------------
    from mmtrs_tpu.models.segmenter import SaliencySegmenter
    from mmtrs_tpu.ops.resize import crop_warp_fused
    from mmtrs_tpu.ops.warp import warp_affine_shear
    from mmtrs_tpu.ops.resize import _crop_affine_params
    from mmtrs_tpu.ops.warp import _to_3x3

    seg = SaliencySegmenter()
    boxes, _ = seg.propose_boxes(variants[0])
    mats = A.legacy_geo_mats(keys, S, S)
    res["c0_crop_warp_full"] = timeit(
        "C0 crop_warp_fused (warp + mask)",
        jax.jit(lambda v: crop_warp_fused(v, boxes, mats, S)), args)

    def c1(v):  # warp only, no combined mask where-pass
        scale, ty, tx, y0, x0, y1, x1 = _crop_affine_params(boxes, S, S, S, 15.0)
        m_aug = _to_3x3(mats.astype(jnp.float32))
        z = jnp.zeros_like(scale); one = jnp.ones_like(scale)
        inv_s = 1.0 / scale
        m_crop = jnp.stack([
            jnp.stack([inv_s, z, -tx * inv_s], axis=-1),
            jnp.stack([z, inv_s, -ty * inv_s], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ], axis=-2)
        m_total = jnp.einsum("bij,bjk->bik", m_aug, m_crop,
                             precision=jax.lax.Precision.HIGHEST)
        return warp_affine_shear(v, m_total, border="replicate")
    res["c1_warp_only"] = timeit("C1 warp only (no mask pass)", jax.jit(c1), args)

    out_p = _REPO / "reports" / "exp_subset_r5.json"
    out_p.write_text(json.dumps({k: round(v, 2) for k, v in res.items()},
                                indent=2))
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
