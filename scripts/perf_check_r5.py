#!/usr/bin/env python3
"""Round-5 full-attribution perf harness (VERDICT r4 next-round #1).

The round-4 harness timed four stages STANDALONE (at b32) next to a b128
chain total, leaving ~19.5 ms of the 43.5 ms chain unattributed — part
units mismatch, part genuinely untimed glue (deskew, subset-compaction
scatters, the crop-warp mask pass, inter-stage fusion boundaries).

This harness uses PREFIX-MARGINAL timing instead: jit the production
chain truncated after each stage, all at the SAME batch size;
marginal(stage k) = t(prefix_k) − t(prefix_{k−1}). The marginals sum to
the chain total BY CONSTRUCTION (each prefix is literally the first k
stages of the same program), so nothing can hide. XLA may fuse work
across a stage boundary — that work is then attributed to the later
stage, which is the honest place for it (it is the marginal cost of
adding that stage).

Sub-splits (standalone, diagnostic only — not part of the sum):
- deskew: estimate_skew_angle alone (the warp marginal is deskew − est);
- legacy_photometrics internals: fused pointwise pass, then each
  subset_apply (CLAHE-sub p≈1/6, motion blur p=.1, elastic p=.1) as
  prefix-marginals WITHIN the stage;
- the per-dispatch floor (trivial program) so small numbers are read
  against the tunnel's ~2.6 ms/program dispatch cost.

Run on the TPU (ambient env):  python scripts/perf_check_r5.py [batch]
Writes reports/perf_attribution_r5.json.
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
    """Warm-compile, then time `it` async dispatches over rotating distinct
    inputs, fetching ONE reduced scalar at the end (block_until_ready is
    unreliable through the axon tunnel — see verify skill)."""
    t0 = time.perf_counter()
    _fetch_scalar(fn(*arg_sets[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(it)]
    _fetch_scalar(outs[-1])
    dt = (time.perf_counter() - t0) / it * 1000
    print(f"{name:44s} {dt:8.2f} ms/batch   [compile {compile_s:.0f}s]", flush=True)
    return dt


def main() -> int:
    from bench import synth_batch
    from mmtrs_tpu.models.segmenter import SaliencySegmenter
    from mmtrs_tpu.ops.augment import legacy_geo_mats, legacy_photometrics
    from mmtrs_tpu.ops.deskew import estimate_skew_angle
    from mmtrs_tpu.utils.rng import keys_for_batch

    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = 512
    x0 = jnp.asarray(synth_batch(B))
    variants = [
        jnp.clip(x0.astype(jnp.int32) + i, 0, 255).astype(jnp.uint8)
        for i in range(4)
    ]
    keys = keys_for_batch(42, np.arange(B), np.ones(B))
    seg = SaliencySegmenter()

    # ---- the chain, truncated after stage k (k=1..6); k=6 == bench chain --
    # (round 5: the production TPU chain is PLANAR — stages exchange
    # (r, g, b) u8 plane tuples; the one interleave is its own stage)
    from mmtrs_tpu.ops.deskew import deskew_batch_planes
    from mmtrs_tpu.ops.pallas.lab_kernels import clahe_lab_fused
    from mmtrs_tpu.ops.resize import crop_warp_fused_planes

    def make_prefix(k: int):
        def fn(v):
            planes = clahe_lab_fused(v, clip=3.0, tiles=(8, 8),
                                     planar_out=True)            # 1 LAB+CLAHE
            if k == 1:
                return planes
            planes, angle = deskew_batch_planes(planes)           # 2 deskew
            if k == 2:
                return planes
            boxes, valid = seg.propose_boxes_planes(planes)       # 3 segmenter
            if k == 3:
                return planes[0], boxes
            mats = legacy_geo_mats(keys, S, S)                    # 4 crop∘warp
            planes = crop_warp_fused_planes(planes, boxes, mats, S,
                                            margin=15.0)
            if k == 4:
                return planes
            out = jnp.stack(planes, axis=-1)                      # 5 interleave
            if k == 5:
                return out
            return legacy_photometrics(out, keys, S)              # 6 photometrics
        return jax.jit(fn)

    args = [(v,) for v in variants]
    floor = timeit("dispatch floor (trivial program)",
                   jax.jit(lambda v: v[0, :2, :2].astype(jnp.float32).sum() + 0.0),
                   args)

    names = ["LAB+CLAHE fused", "deskew", "segmenter", "crop_warp_fused",
             "interleave", "legacy_photometrics"]
    prefix_t = []
    for k in range(1, 7):
        prefix_t.append(timeit(f"prefix k={k} (…{names[k-1]})", make_prefix(k), args))
    total = prefix_t[-1]
    marginals = [prefix_t[0]] + [
        prefix_t[i] - prefix_t[i - 1] for i in range(1, len(prefix_t))
    ]

    print("\n--- prefix-marginal attribution (sums to total by construction) ---")
    for n, m in zip(names, marginals):
        print(f"  {n:28s} {m:7.2f} ms  ({100*m/total:4.1f}%)")
    print(f"  {'TOTAL (bench chain)':28s} {total:7.2f} ms  "
          f"= {B/(total/1000):.1f} imgs/s/chip @b{B}")
    print(f"  (dispatch floor {floor:.2f} ms; marginals are in-context — "
          f"cross-boundary fusion lands on the later stage)")

    # ---- sub-splits (standalone; diagnostic) -------------------------------
    print("\n--- sub-splits ---")
    est = timeit("  deskew: estimate_skew_angle only",
                 jax.jit(lambda v: estimate_skew_angle(v)), args)
    sub = {"deskew_estimate_standalone": est}

    # photometrics internals on a crop-stage-like uint8 input
    from mmtrs_tpu.ops import augment as A

    def make_photo_prefix(j: int):
        def fn(v):
            hole = max(1, S // 24)
            params, nk, use_clahe = A.photometric_params_legacy(keys, S, S, hole)
            from mmtrs_tpu.ops.pallas.photometric_kernel import (
                photometrics_fused_pallas,
            )
            seeds = jax.vmap(
                lambda k: jax.random.bits(k, (), jnp.uint32).astype(jnp.int32)
            )(nk)
            out = photometrics_fused_pallas(v, params, seeds, hole)
            if j == 1:
                return out
            cap16 = A._subset_cap(B, 0.5 / 3.0)

            def _clahe_sub(s):
                from mmtrs_tpu.ops.pallas.lab_kernels import clahe_lab_fused
                return clahe_lab_fused(s, clip=2.0, tiles=(8, 8))

            out = A.subset_apply(_clahe_sub, out, use_clahe, cap16)
            if j == 2:
                return out
            bk = jax.vmap(lambda k: jax.random.fold_in(k, 3))(keys)
            blur_on = jax.vmap(lambda k: A._gate(jax.random.fold_in(k, 0), 0.1))(bk)
            out = A.subset_apply(
                lambda s, k: A._q8(A.motion_blur(s.astype(jnp.float32), k, ksize=5)),
                out, blur_on, A._subset_cap(B, 0.1), bk,
            )
            if j == 3:
                return out
            ek = jax.vmap(lambda k: jax.random.fold_in(k, 4))(keys)
            el_on = jax.vmap(lambda k: A._gate(jax.random.fold_in(k, 0), 0.1))(ek)
            out = A.subset_apply(
                lambda s, k: A._q8(A.elastic(s, k, alpha=10.0, sigma=5.0)),
                out, el_on, A._subset_cap(B, 0.1), ek,
            )
            return out
        return jax.jit(fn)

    photo_names = ["fused pointwise", "+clahe subset", "+blur subset",
                   "+elastic subset"]
    pt = []
    for j in range(1, 5):
        pt.append(timeit(f"  photometrics prefix {photo_names[j-1]}",
                         make_photo_prefix(j), args))
    photo_marg = [pt[0]] + [pt[i] - pt[i - 1] for i in range(1, 4)]
    print("\n--- photometrics internal attribution ---")
    for n, m in zip(photo_names, photo_marg):
        print(f"  {n:28s} {m:7.2f} ms")
    sub["photometrics_internal"] = dict(zip(photo_names, [round(m, 2) for m in photo_marg]))

    rep = {
        "batch": B,
        "dispatch_floor_ms": round(floor, 2),
        "prefix_ms": dict(zip(names, [round(t, 2) for t in prefix_t])),
        "marginal_ms": dict(zip(names, [round(m, 2) for m in marginals])),
        "total_ms": round(total, 2),
        "imgs_per_sec": round(B / (total / 1000), 1),
        "sub": sub,
        "note": "prefix-marginal attribution: marginals sum to total by "
                "construction; cross-stage fusion lands on the later stage",
    }
    out_p = _REPO / "reports" / "perf_attribution_r5.json"
    out_p.write_text(json.dumps(rep, indent=2))
    print(f"\nwrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
