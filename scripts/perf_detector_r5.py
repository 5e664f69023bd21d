#!/usr/bin/env python3
"""Detector stage attribution (VERDICT r4 next-round #2: "≥250 imgs/s or a
stage-level timing breakdown showing what bounds it").

Prefix-marginal timing over the Mask R-CNN forward + segmenter selection,
all at one batch size — marginals sum to the full propose_boxes total by
construction:

  1 features        (ResNet body + FPN — the MXU part)
  2 rpn_head        (per-level conv heads)
  3 rpn_proposals   (per-level top-k → decode → level-grouped NMS)
  4 detection_heads (RoIAlign ×2 + box/mask heads + class-aware NMS)
  5 select          (paste_mask + saturation gate + box choice)

Run on the TPU:  python scripts/perf_detector_r5.py [batch] [dtype]
Writes reports/detector_attribution_r5.json.
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


def timeit(name, fn, arg_sets, it=8):
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
    from mmtrs_tpu.models.detection.modules import DetectorConfig, MaskRCNN
    from mmtrs_tpu.models.detection.segmenter import MaskRCNNSegmenter

    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    S = 512

    cfg = DetectorConfig(img_size=S, compute_dtype=dtype)
    model = MaskRCNN(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, S, S, 3)))
    seg = MaskRCNNSegmenter(variables, cfg)

    x = jnp.asarray(synth_batch(B)).astype(jnp.float32)
    variants = [jnp.clip(x + i, 0, 255) for i in range(4)]
    args = [(v,) for v in variants]

    def apply(method, *a):
        return model.apply(variables, *a, method=method)

    def make_prefix(k: int):
        def fn(v):
            imgs01 = v / 255.0
            feats = apply(lambda m, u: m.features(u), imgs01)       # 1
            if k == 1:
                return feats
            logits, deltas = apply(lambda m, f: m.rpn_head(f), feats)  # 2
            if k == 2:
                return logits
            props, pvalid = apply(
                lambda m, f, l, d: m.rpn_proposals(f, l, d, S), feats, logits, deltas
            )                                                        # 3
            if k == 3:
                return props
            det = apply(
                lambda m, f, p, pv: m.detection_heads(f, p, pv, S),
                feats, props, pvalid,
            )                                                        # 4
            if k == 4:
                return det
            return seg.propose_boxes(v)                              # 5 (full)
        return jax.jit(fn)

    names = ["features (body+FPN)", "rpn_head", "rpn_proposals",
             "detection_heads", "select (paste+gate)"]
    prefix_t = []
    for k in range(1, 6):
        prefix_t.append(timeit(f"prefix k={k} (…{names[k-1]})", make_prefix(k), args))
    total = prefix_t[-1]
    marginals = [prefix_t[0]] + [prefix_t[i] - prefix_t[i - 1] for i in range(1, 5)]

    print("\n--- detector prefix-marginal attribution ---")
    for n, m in zip(names, marginals):
        print(f"  {n:28s} {m:7.2f} ms  ({100*m/total:4.1f}%)")
    print(f"  {'TOTAL (propose_boxes)':28s} {total:7.2f} ms  "
          f"= {B/(total/1000):.1f} imgs/s @b{B} {dtype}@{S}")
    print("  (note: prefix 5 re-runs the full model inside propose_boxes — "
          "its marginal is paste_mask+gating only because stages 1-4 are "
          "identical programs XLA dedups within the jit)")

    rep = {
        "batch": B,
        "dtype": dtype,
        "img_size": S,
        "prefix_ms": dict(zip(names, [round(t, 2) for t in prefix_t])),
        "marginal_ms": dict(zip(names, [round(m, 2) for m in marginals])),
        "total_ms": round(total, 2),
        "imgs_per_sec": round(B / (total / 1000), 1),
        "box_pre_nms_topk": cfg.box_pre_nms_topk,
    }
    out_p = _REPO / "reports" / "detector_attribution_r5.json"
    out_p.write_text(json.dumps(rep, indent=2))
    print(f"\nwrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
