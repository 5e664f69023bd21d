#!/usr/bin/env python3
"""Vision evaluation CLI — reference parity (models/vision/eval_models.py +
experiments/vision_v2/eval_hard_ckpt.py): test-split inference for a saved
hard/soft checkpoint with optional hflip TTA and val-tuned threshold,
prediction CSV export + metric JSON.

  python scripts/eval_vision.py --ckpt weights/vision_hard_best \
      --data data_dl_augmented.csv --image_dir processed/ --outdir results/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="checkpoint path prefix")
    p.add_argument("--data", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--no_tta", action="store_true")
    p.add_argument("--tune_on", default=None,
                   help="split to tune the F1 threshold on (e.g. val)")
    p.add_argument("--outdir", default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import pandas as pd

    from mmtrs_tpu.config import VisionTrainConfig
    from mmtrs_tpu.metrics import binary_report
    from mmtrs_tpu.train.common import TrainState
    from mmtrs_tpu.train.vision import VisionTrainer
    from mmtrs_tpu.utils.checkpoint import load_checkpoint
    from mmtrs_tpu.utils.io import read_table, save_json
    from run_train_images import load_vision_dataset

    variables, recipe = load_checkpoint(Path(args.ckpt))
    if recipe is None:
        print("[error] checkpoint has no recipe sidecar")
        return 1
    cfg = VisionTrainConfig(
        model_name=recipe["model_name"], img_size=int(recipe["img_size"]),
        task=recipe.get("task", "hard"), bf16=False,
    )
    trainer = VisionTrainer(cfg)
    trainer.init_state(total_steps=1)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=(), step=jnp.zeros((), jnp.int32),
    )

    df = read_table(args.data)
    df["split"] = df["split"].astype(str).str.lower()
    data, sub = load_vision_dataset(
        df[df["split"] == args.split].reset_index(drop=True),
        args.image_dir, cfg.img_size,
    )
    thr = float(recipe.get("thr", 0.5))
    if args.tune_on:
        val_data, _ = load_vision_dataset(
            df[df["split"] == args.tune_on].reset_index(drop=True),
            args.image_dir, cfg.img_size,
        )
        thr = trainer.tune_threshold_f1(state, val_data)

    probs = trainer.predict_proba(state, data, tta=not args.no_tta)
    rep = binary_report(data.y, probs, thr)
    print({k: round(rep[k], 4) for k in ("auc", "acc", "prec", "rec", "f1")},
          f"thr={thr:.3f}")
    if args.outdir:
        outdir = Path(args.outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(
            {"image_name": sub["image_name"], "y": data.y, "prob": probs}
        ).to_csv(outdir / f"vision_{cfg.task}_{args.split}_predictions.csv",
                 index=False)
        save_json(
            {k: rep[k] for k in ("auc", "acc", "prec", "rec", "f1", "brier")},
            outdir / f"metrics_vision_{cfg.task}.json",
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
