#!/usr/bin/env python3
"""Serving-latency benchmark (VERDICT round-3 item 5).

Builds a full PredictService from freshly trained tiny fold ensembles
(MM + MIL + Tab + stacker — the same weights layout the UI loads), primes
the jit caches, then measures steady-state `predict_one` wall time over N
distinct 512px uploads and reports p50/p95 next to the reference's
published 2–10 s/prediction (/root/reference/README.md:853 — whose hot
spot is a per-request `run_pipeline.py` subprocess that reloads Mask R-CNN
every time, ui/gradio_app/utils.py:149-233).

Writes reports/serve_bench.json.

Run: python scripts/bench_serve.py  (TPU via the ambient platform)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np


def build_tiny_service(root: Path):
    """Train minimal MM/MIL/Tab fold models (the test-suite recipe) and
    assemble the service exactly the way the UI does."""
    from mmtrs_tpu.config import GBDTConfig, MILConfig, MMJointConfig
    from mmtrs_tpu.serve.ensembles import build_service_from_weights
    from mmtrs_tpu.train.mil import run_mil_kfold
    from mmtrs_tpu.train.mm import run_mm_kfold
    from mmtrs_tpu.train.tabular import train_tab_kfold
    from tests.synth import synth_images, synth_standardized

    n = 60
    df = synth_standardized(n, seed=41)
    df["split"] = ["test" if i >= 48 else "train" for i in range(n)]
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 32, seed=42, labels=y)

    mm_cfg = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=12,
                           lr=1e-3, n_folds=2, epochs=2)
    run_mm_kfold(imgs, df, mm_cfg, outdir=root / "mm_dualtask_v1",
                 epochs=2, save_ckpts=True, log=lambda *a: None)
    mil_cfg = MILConfig(model_name="test_cnn", bag_size=2, img_size=32,
                        attn_dim=8, epochs=2, batch_size=12, lr=1e-3,
                        n_folds=2)
    run_mil_kfold(imgs, df, mil_cfg, outdir=root / "mil_v1",
                  epochs=2, save_ckpts=True, log=lambda *a: None)
    train_tab_kfold(
        df, outdir=root / "tab_v1", n_folds=2,
        cfg=GBDTConfig(**{**GBDTConfig.stack_tab_like().__dict__,
                          "n_estimators": 80}),
    )
    return build_service_from_weights(root)


def build_flagship_service(root: Path, rehearsal_dir: Path):
    """Assemble the service from REAL rehearsal fold checkpoints (MM
    B4@380 + MIL b0@320, --save_ckpts layout) — the like-for-like latency
    point vs the reference's 2-10 s (VERDICT r4 #3 closed: the r4 number
    measured the architecture with test_cnn@32 stand-ins). The tabular
    stream is re-trained here (seconds; forests are not checkpointed by
    the rehearsal) — tab latency is microseconds either way."""
    from mmtrs_tpu.config import GBDTConfig
    from mmtrs_tpu.serve.ensembles import build_service_from_weights
    from mmtrs_tpu.train.tabular import train_tab_kfold
    from tests.synth import synth_standardized

    (root / "mm_dualtask_v1").symlink_to((rehearsal_dir / "mm").resolve())
    (root / "mil_v1").symlink_to((rehearsal_dir / "mil").resolve())
    df = synth_standardized(120, seed=41)
    train_tab_kfold(df, outdir=root / "tab_v1", n_folds=5,
                    cfg=GBDTConfig.stack_tab_like())
    return build_service_from_weights(root)


def main() -> int:
    import argparse

    from mmtrs_tpu.serve.choices import CHOICES_MAP, FIELD_ORDER
    from tests.synth import synth_images

    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", default="",
                    help="rehearsal dir with --save_ckpts fold checkpoints "
                         "(e.g. results/rehearsal_r5); empty = tiny "
                         "architecture-only ensembles")
    args = ap.parse_args()

    t_setup = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        if args.flagship:
            svc = build_flagship_service(Path(td), Path(args.flagship))
        else:
            svc = build_tiny_service(Path(td))
        setup_s = time.perf_counter() - t_setup

        n_warm, n_meas = 3, 30
        uploads = synth_images(n_warm + n_meas, 520, seed=7)
        fields = {k: list(CHOICES_MAP[k])[0] for k in FIELD_ORDER}

        # prime every jit path (preprocess chain, MM TTA, MIL bag, stack)
        t_prime = time.perf_counter()
        for i in range(n_warm):
            out = svc.predict_one(uploads[i], fields)
            assert "error" not in out, out
        prime_s = time.perf_counter() - t_prime

        lat_full, lat_imgonly = [], []
        for i in range(n_warm, n_warm + n_meas):
            t0 = time.perf_counter()
            out = svc.predict_one(uploads[i], fields)
            lat_full.append(time.perf_counter() - t0)
            assert "error" not in out, out
        for i in range(n_warm, n_warm + n_meas):
            t0 = time.perf_counter()
            out = svc.predict_one(uploads[i])
            lat_imgonly.append(time.perf_counter() - t0)
            assert "error" not in out, out

    import jax

    pct = lambda a, q: float(np.percentile(np.asarray(a), q))
    rep = {
        "platform": jax.devices()[0].platform,
        "n_measured": n_meas,
        "upload_px": 520,
        "predict_one_full_p50_s": round(pct(lat_full, 50), 4),
        "predict_one_full_p95_s": round(pct(lat_full, 95), 4),
        "predict_one_imgonly_p50_s": round(pct(lat_imgonly, 50), 4),
        "predict_one_imgonly_p95_s": round(pct(lat_imgonly, 95), 4),
        "setup_s": round(setup_s, 1),
        "prime_jit_s": round(prime_s, 1),
        "flagship": bool(args.flagship),
        "reference_latency_s": "2-10 per prediction (README.md:853; "
                               "per-request subprocess + Mask R-CNN reload)",
        "note": (
            "steady-state in-process jit path loading the REAL rehearsal "
            f"fold checkpoints from {args.flagship} (MM efficientnet_b4@380 "
            "folds + MIL b0@320 bag-12 folds + tab forests) — like-for-like "
            "model FLOPs vs the reference's published latency."
            if args.flagship else
            "steady-state in-process jit path; ensembles are tiny "
            "(test_cnn@32) so this measures the serving architecture — "
            "preprocess chain at 512px + TTA ensembles + stacker — not "
            "B4-scale model FLOPs."
        ) + " Wall time includes the remote-TPU tunnel D2H fetch of the "
            "512² processed image (~0.8 MB at 12-20 MB/s on this rig).",
    }
    out = REPO / "reports" / (
        "serve_bench_flagship.json" if args.flagship else "serve_bench.json"
    )
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rep, indent=2))
    print(json.dumps(rep, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
