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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    B = args.batch

    from bench import synth_batch
    from mmtrs_tpu.models.detection.modules import DetectorConfig, MaskRCNN
    from mmtrs_tpu.models.detection.segmenter import MaskRCNNSegmenter
    from mmtrs_tpu.preprocess import preprocess_batch

    platform = jax.devices()[0].platform
    print(f"platform={platform} batch={B}", flush=True)

    cfg = DetectorConfig()
    model = MaskRCNN(cfg)
    t0 = time.perf_counter()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    )
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)
    seg = MaskRCNNSegmenter(variables, cfg)

    x = jnp.asarray(synth_batch(B)).astype(jnp.float32)
    variants = [jnp.clip(x + i, 0, 255) for i in range(4)]

    t0 = time.perf_counter()
    dt_seg = timeit(lambda v: seg.propose_boxes(v), variants, args.iters)
    print(f"segmenter-only: {dt_seg*1000:.1f} ms/batch "
          f"({B/dt_seg:.1f} imgs/s) [first call incl compile "
          f"{time.perf_counter()-t0:.0f}s]", flush=True)

    fn = jax.jit(
        lambda v: preprocess_batch(v, out_size=512, use_pallas=platform == "tpu",
                                   segmenter=seg)
    )
    dt_chain = timeit(fn, variants, args.iters)
    print(f"preprocess chain + learned segmenter: {dt_chain*1000:.1f} ms/batch "
          f"({B/dt_chain:.1f} imgs/s)", flush=True)

    rec = {
        "batch": B,
        "platform": platform,
        "maskrcnn_segment_imgs_per_sec": round(B / dt_seg, 2),
        "preproc_with_maskrcnn_imgs_per_sec": round(B / dt_chain, 2),
        "note": (
            "random weights (no COCO ckpt reachable in this env); program "
            "identical to converted-weight path. Reference pays a per-image "
            "Mask R-CNN forward (segment.py:30) at ~tens of imgs/s on GPU."
        ),
    }
    out = _REPO / "reports" / "detector_bench.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
