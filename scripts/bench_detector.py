#!/usr/bin/env python3
"""On-chip throughput of the learned Mask R-CNN segmenter (VERDICT r2 #4).

Random weights suffice for a perf number: the compiled program is
identical to the converted-COCO path (same static shapes, same NMS/RoI
budgets). Measures ``MaskRCNNSegmenter.propose_boxes`` — the per-image
Mask R-CNN forward that dominates the reference pipeline
(src/preprocessing/segment.py:30) — on [B,512,512,3] batches, and the
full preprocess chain with the learned segmenter plugged in, next to the
saliency-segmenter chain bench.py reports.

Run on the TPU (ambient env): python scripts/bench_detector.py [--batch 8]
Writes reports/detector_bench.json.
"""

from __future__ import annotations

import argparse
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


def timeit(fn, variants, iters=8):
    out = fn(variants[0])
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jnp.sum(leaf[:1].astype(jnp.float32))))
    t0 = time.perf_counter()
    outs = [fn(variants[i % len(variants)]) for i in range(iters)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(jnp.sum(leaf[:1].astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters


def _bench_config(cfg, B, iters, variants_512):
    """Throughput of propose_boxes for one DetectorConfig at batch B."""
    from mmtrs_tpu.models.detection.modules import MaskRCNN
    from mmtrs_tpu.models.detection.segmenter import MaskRCNNSegmenter

    model = MaskRCNN(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    )
    seg = MaskRCNNSegmenter(variables, cfg)
    variants = [v[:B] for v in variants_512]
    dt = timeit(lambda v: seg.propose_boxes(v), variants, iters)
    return seg, B / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sweep", action="store_true",
                    help="bf16/batch/resolution sweep (round-4 item 2a)")
    args = ap.parse_args()
    B = args.batch

    from bench import synth_batch
    from mmtrs_tpu.models.detection.modules import DetectorConfig
    from mmtrs_tpu.preprocess import preprocess_batch

    platform = jax.devices()[0].platform
    print(f"platform={platform} batch={B}", flush=True)

    max_b = max(B, 32) if args.sweep else B
    x = jnp.asarray(synth_batch(max_b)).astype(jnp.float32)
    variants_512 = [jnp.clip(x + i, 0, 255) for i in range(4)]

    # baseline config (f32, detector input 512 — the r3-measured point)
    cfg = DetectorConfig()
    t0 = time.perf_counter()
    seg, base_rate = _bench_config(cfg, B, args.iters, variants_512)
    print(f"f32@512 b{B}: {base_rate:.1f} imgs/s "
          f"[incl compile {time.perf_counter()-t0:.0f}s]", flush=True)

    fn = jax.jit(
        lambda v: preprocess_batch(v, out_size=512, use_pallas=platform == "tpu",
                                   segmenter=seg)
    )
    dt_chain = timeit(fn, [v[:B] for v in variants_512], args.iters)
    print(f"preprocess chain + learned segmenter: {B/dt_chain:.1f} imgs/s",
          flush=True)

    rec = {
        "batch": B,
        "platform": platform,
        "maskrcnn_segment_imgs_per_sec": round(base_rate, 2),
        "preproc_with_maskrcnn_imgs_per_sec": round(B / dt_chain, 2),
        "note": (
            "random weights (no COCO ckpt reachable in this env); program "
            "identical to converted-weight path. Reference pays a per-image "
            "Mask R-CNN forward (segment.py:30) at ~tens of imgs/s on GPU."
        ),
    }

    if args.sweep:
        # bf16 backbone/FPN/heads × batch × detector input resolution.
        # The reference feeds torchvision full-res images (min-size-800
        # transform, segment.py:24-30); the TPU port resizes to
        # cfg.img_size first — the consumer is ONE crop box, so lower
        # detector resolution trades box granularity, not crop contract.
        # Explicit 7-point set rather than the full 2×3×3 grid: every point
        # is a FRESH Mask R-CNN compile and the remote compile server runs
        # 2–8 min per program on this rig — the full grid costs hours of
        # compile for little extra information. Points: f32@512 batch
        # scaling (is it batch-amortizable at all?), bf16@512 batch scaling
        # (the dtype lever), bf16 resolution ladder at the best batch.
        # b32 compiles crash this rig's remote compile helper (HTTP 500,
        # reports/detector_bench.json r4 sweep) — the resolution ladder
        # therefore rides b16, the best batch that compiles.
        points = [
            ("float32", 512, 16),
            ("bfloat16", 512, 8),
            ("bfloat16", 512, 16),
            ("bfloat16", 384, 16),
            ("bfloat16", 256, 16),
        ]
        sweep = {}
        for dtype, size, b in points:
            c = DetectorConfig(img_size=size, compute_dtype=dtype)
            t0 = time.perf_counter()
            try:
                _, rate = _bench_config(c, b, args.iters, variants_512)
            except Exception as e:  # OOM etc. — record STRUCTURED and move on
                # no raw tracebacks/ANSI escapes as artifact values
                # (VERDICT r4 weak #6): first line of the message, stripped
                msg = str(e).splitlines()[0] if str(e) else type(e).__name__
                msg = "".join(ch for ch in msg if ch.isprintable())[:100]
                sweep[f"{dtype}@{size} b{b}"] = {
                    "error": type(e).__name__, "detail": msg,
                }
                continue
            sweep[f"{dtype}@{size} b{b}"] = round(rate, 2)
            print(f"{dtype}@{size} b{b}: {rate:.1f} imgs/s "
                  f"[{time.perf_counter()-t0:.0f}s]", flush=True)
        sweep[f"float32@512 b{B}"] = round(base_rate, 2)  # baseline point
        rec["sweep_imgs_per_sec"] = sweep
        best = max(
            (v, k) for k, v in sweep.items() if isinstance(v, (int, float))
        )
        rec["best"] = {"config": best[1], "imgs_per_sec": best[0]}
        rec["sweep_note"] = (
            "detections come from the same heads; bf16 runs body/FPN/RPN/"
            "head matmuls in bfloat16 (box decode/NMS stay f32). Input "
            "resolution is the detector's internal resize (propose_boxes "
            "resizes to cfg.img_size; boxes are rescaled to the input "
            "frame)."
        )

    out = _REPO / "reports" / "detector_bench.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
