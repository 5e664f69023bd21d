"""Progressive multi-seed hard trainer (train_hard_v2.py parity).

Stages 384→512 with per-stage epochs/batch-size/lr, stage N+1 resuming from
stage N's best state (:229-232), head-bias init to the class prior
(:93-117), class-balanced CE + label smoothing .10, linear warmup
(:120-129), multi-seed loop (:212) whose members feed the logit-mean
TTA ensemble (ensemble_hard.py).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from mmtrs_tpu.config import ProgressiveConfig, VisionTrainConfig
from mmtrs_tpu.train.vision import VisionData, VisionTrainer, ensemble_predict


def train_progressive(
    cfg: ProgressiveConfig,
    train: VisionData,
    val: VisionData,
    aug_preset: str = "none",
    mesh=None,
    log=print,
) -> list:
    """Returns one best-state per seed (each trained through all stages)."""
    states = []
    prior = float(np.clip(train.y.mean(), 1e-3, 1 - 1e-3))
    head_bias = float(np.log(prior / (1 - prior)))
    for seed in cfg.seeds:
        state = None
        trainer = None
        for si, stage in enumerate(cfg.stages):
            vcfg = VisionTrainConfig(
                model_name=cfg.model_name,
                img_size=stage.img_size,
                task="hard",
                epochs=stage.epochs,
                batch_size=stage.batch_size,
                lr=stage.lr,
                label_smoothing=cfg.label_smoothing,
                warmup_steps=cfg.warmup_steps if si == 0 else 0,
                seed=seed,
            )
            trainer = VisionTrainer(vcfg, mesh=mesh, aug_preset=aug_preset)
            steps = max(len(train) // stage.batch_size, 1) * stage.epochs
            if state is None:
                state = trainer.init_state(steps, head_bias=head_bias)
            else:
                # resume: keep params/batch_stats, fresh optimizer for the stage
                fresh = trainer.init_state(steps)
                from mmtrs_tpu.train.common import TrainState

                state = TrainState(
                    params=state.params,
                    batch_stats=state.batch_stats,
                    opt_state=fresh.opt_state,
                    step=fresh.step,
                )
            log(f"[seed {seed} stage {si}] {stage.img_size}px ×{stage.epochs}ep")
            state, _ = trainer.fit(train, val, epochs=stage.epochs, state=state, log=log)
        states.append((trainer, state))
    return states


def progressive_ensemble_probs(states: list, data: VisionData) -> np.ndarray:
    """Seed-ensemble prediction (logit mean + TTA)."""
    trainer = states[0][0]
    return ensemble_predict(trainer, [s for _, s in states], data, tta=True)
