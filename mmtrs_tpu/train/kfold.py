"""K-fold vision trainers (the experiments/vision_v2 layer).

Covers two reference trainers:
- train_hard_kfold_v2.py: StratifiedGroupKFold (:249-252), single-logit BCE
  with pos_weight = neg/pos or weighted sampler (:267-314), gradient
  accumulation (:169-172), head-only warm-up freeze (:319-334), debug tools
  (--overfit-n :224, quick train-probe AUC :103-121, grad-norm :142-147,
  logit-std, imgs/s :175-187);
- train_hard_groupcv_v3.py: pre-exported fold CSVs (:322-334), binary-safe
  MixUp/CutMix (:38-82), freeze→unfreeze two-phase schedule (:226-293),
  parameter EMA (:219), patience early stopping (:285-293), constrained
  threshold objective recall≥0.90|max_f1 (:157-194).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from mmtrs_tpu.metrics import roc_auc, sweep_thresholds, threshold_grid
from mmtrs_tpu.models.backbones.factory import create_model
from mmtrs_tpu.ops.resize import resize_bilinear
from mmtrs_tpu.train.common import (
    TrainState,
    Throughput,
    epoch_batches,
    make_optimizer,
    normalize_imagenet,
    weighted_sampler_indices,
)


# ---------------------------------------------------------------------------
# Binary-safe MixUp / CutMix (train_hard_groupcv_v3.py:38-82)
# ---------------------------------------------------------------------------


def apply_mixup_cutmix(
    imgs: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
    p: float = 0.5,
):
    """Mix each batch with a permuted copy; soft targets mixed by λ.
    Chooses mixup vs cutmix 50/50 when the gate fires."""
    B, H, W, C = imgs.shape
    kg, kl, kp, kc, kxy = jax.random.split(key, 5)
    perm = jax.random.permutation(kp, B)
    lam_mix = jax.random.beta(kl, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(kc, cutmix_alpha, cutmix_alpha)

    mixed = lam_mix * imgs + (1 - lam_mix) * imgs[perm]

    # cutmix: rectangle of area (1-λ) pasted from the permuted image
    rh = jnp.sqrt(1 - lam_cut) * H
    rw = jnp.sqrt(1 - lam_cut) * W
    ky, kx = jax.random.split(kxy)
    cy = jax.random.uniform(ky, ()) * H
    cx = jax.random.uniform(kx, ()) * W
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    box = (
        (yy >= cy - rh / 2) & (yy < cy + rh / 2)
        & (xx >= cx - rw / 2) & (xx < cx + rw / 2)
    )
    cut = jnp.where(box, imgs[perm], imgs)
    lam_cut_eff = 1.0 - jnp.mean(box.astype(jnp.float32))

    use_cut = jax.random.bernoulli(jax.random.fold_in(kg, 1))
    out = jnp.where(use_cut, cut, mixed)
    lam = jnp.where(use_cut, lam_cut_eff, lam_mix)
    t = lam * targets + (1 - lam) * targets[perm]
    gate = jax.random.bernoulli(kg, p)
    return (
        jnp.where(gate, out, imgs),
        jnp.where(gate, t, targets),
    )


def tune_threshold_constrained(
    y, p, objective: str = "max_f1", min_recall: float = 0.0,
    grid: np.ndarray | None = None,
) -> float:
    """Constrained objective: among thresholds with recall ≥ min_recall,
    maximize f1/acc (groupcv_v3 tune_threshold :157-194); falls back to the
    unconstrained optimum when no threshold satisfies the constraint."""
    ts = grid if grid is not None else threshold_grid("fusion")
    s = sweep_thresholds(y, p, ts)
    key = {"max_f1": "f1", "max_acc": "acc"}[objective]
    vals = np.where(s["rec"] >= min_recall, s[key], -np.inf)
    if np.all(np.isinf(vals) & (vals < 0)):
        vals = s[key]
    return float(ts[int(np.argmax(vals))])


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KFoldConfig:
    model_name: str = "convnextv2_base"
    img_size: int = 512
    epochs: int = 20
    batch_size: int = 8
    grad_accum: int = 1
    lr: float = 3e-4
    weight_decay: float = 1e-4
    n_folds: int = 5
    seed: int = 42
    use_pos_weight: bool = True  # else weighted sampler
    freeze_epochs: int = 0  # head-only warm-up
    use_mixup: bool = False
    ema_decay: float = 0.0  # 0 = off
    patience: int = 0  # 0 = no early stopping
    overfit_n: int = 0  # debug: train on first N samples only
    thr_objective: str = "max_f1"
    thr_min_recall: float = 0.0
    bf16: bool = False


class KFoldHardTrainer:
    """Single-logit BCE k-fold trainer with the v2/v3 training tricks."""

    def __init__(self, cfg: KFoldConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None and cfg.batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh size {mesh.size}"
            )
        self.model = create_model(
            cfg.model_name, num_classes=1,
            dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        )

    def _build_steps(self, total_steps: int, pos_weight: float, freeze_backbone: bool):
        cfg = self.cfg
        tx = make_optimizer(cfg.lr, cfg.weight_decay, total_steps)
        if freeze_backbone:
            # zero updates for everything but the classifier head (:319-334)
            def head_mask(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: any(
                        getattr(k, "key", None) == "classifier" for k in path
                    ),
                    params,
                )

            tx = optax.chain(optax.masked(tx, head_mask))
        if cfg.grad_accum > 1:
            tx = optax.MultiSteps(tx, cfg.grad_accum)
        self.tx = tx

        model = self.model
        pw = float(pos_weight)

        def loss_fn(logit, y):
            # BCEWithLogits(pos_weight) (:267-314)
            l = jnp.maximum(logit, 0) - logit * y + jnp.log1p(jnp.exp(-jnp.abs(logit)))
            w = jnp.where(y > 0.5, pw, 1.0)
            return jnp.sum(l * w) / jnp.sum(w)

        def step(state: TrainState, batch):
            def compute(params):
                variables = {"params": params, "batch_stats": state.batch_stats}
                out, mut = model.apply(
                    variables, batch["x"], train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(jax.random.key(3), state.step)},
                )
                logit = out[..., 0]
                return loss_fn(logit, batch["y"]), (mut, logit)

            (loss, (mut, logit)), grads = jax.value_and_grad(
                compute, has_aux=True
            )(state.params)
            gnorm = optax.global_norm(grads)  # debug stat (:142-147)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, batch_stats=mut["batch_stats"],
                           opt_state=opt_state, step=state.step + 1),
                {"loss": loss, "grad_norm": gnorm, "logit_std": jnp.std(logit)},
            )

        def eval_fn(st, x):
            return model.apply(
                {"params": st.params, "batch_stats": st.batch_stats}, x, train=False
            )[..., 0]

        if self.mesh is None:
            self._train_step = jax.jit(step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_fn)
        else:
            from mmtrs_tpu.parallel.mesh import data_parallel_eval_jit, data_parallel_jit

            self._train_step = data_parallel_jit(step, self.mesh)
            self._eval_step = data_parallel_eval_jit(eval_fn, self.mesh)

    def _prep(self, imgs):
        # u8 stays u8 into the resize matmuls (widen fuses into the read)
        x = jnp.asarray(imgs)
        if x.shape[1] != self.cfg.img_size:
            x = resize_bilinear(x, (self.cfg.img_size, self.cfg.img_size))
        return normalize_imagenet(x.astype(jnp.float32))

    def predict_proba(self, state, images, tta: bool = True) -> np.ndarray:
        bs = self.cfg.batch_size
        out = []
        for s in range(0, len(images), bs):
            imgs = images[s : s + bs]
            pad = bs - len(imgs) if len(imgs) < bs else 0
            if pad:
                # jnp concat: images may be device-resident (run_hard_kfold)
                imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad, 0)])
            x = self._prep(imgs)
            l = self._eval_step(state, x)  # async, stays on device
            if tta:
                l = 0.5 * (l + self._eval_step(state, x[:, :, ::-1, :]))
            out.append((l, pad))
        # single device→host fetch after all batches are dispatched
        host = np.asarray(jnp.concatenate([l for l, _ in out]))
        chunks, ofs = [], 0
        for _, pad in out:
            p = 1 / (1 + np.exp(-host[ofs : ofs + bs]))
            chunks.append(p[: bs - pad])
            ofs += bs
        return np.concatenate(chunks)

    def fit_fold(self, images, y, train_idx, val_idx, epochs=None, log=print) -> dict:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        if cfg.overfit_n:
            train_idx = train_idx[: cfg.overfit_n]
        n = len(train_idx)
        ytr = y[train_idx].astype(np.float32)
        pos = max(ytr.sum(), 1.0)
        pos_weight = (len(ytr) - pos) / pos if cfg.use_pos_weight else 1.0
        steps = max(n // cfg.batch_size, 1) * epochs

        self._build_steps(steps, pos_weight, freeze_backbone=cfg.freeze_epochs > 0)
        variables = self.model.init(
            jax.random.key(cfg.seed),
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
            train=False,
        )
        state = TrainState.create(variables, self.tx)
        # EMA must own copies: variables["params"] aliases state.params,
        # which the first (donating) train step deletes
        from mmtrs_tpu.train.common import snapshot

        ema_params = snapshot(variables["params"]) if cfg.ema_decay > 0 else None

        rng = np.random.default_rng(cfg.seed)
        best = {"auc": -np.inf, "state": state, "since": 0}
        tp = Throughput()
        for ep in range(epochs):
            if cfg.freeze_epochs and ep == cfg.freeze_epochs:
                # unfreeze: rebuild optimizer over all params, keep weights
                self._build_steps(steps, pos_weight, freeze_backbone=False)
                state = TrainState(
                    params=state.params, batch_stats=state.batch_stats,
                    opt_state=self.tx.init(state.params), step=state.step,
                )
            sampler = (
                None if cfg.use_pos_weight
                else weighted_sampler_indices(ytr, (n // cfg.batch_size) * cfg.batch_size, rng)
            )
            stats = []
            for bidx in epoch_batches(n, cfg.batch_size, rng, indices=sampler):
                sel = train_idx[bidx]
                x = self._prep(images[sel])
                t = jnp.asarray(y[sel].astype(np.float32))
                if cfg.use_mixup:
                    x, t = apply_mixup_cutmix(
                        x, t, jax.random.fold_in(jax.random.key(cfg.seed), int(state.step))
                    )
                tp.start()
                state, m = self._train_step(state, {"x": x, "y": t})
                jax.block_until_ready(m["loss"])  # one sync: honest imgs/s
                tp.stop(len(bidx))
                stats.append(m)  # device scalars; fetched once per epoch
                if ema_params is not None:
                    ema_params = jax.tree.map(
                        lambda e, p: cfg.ema_decay * e + (1 - cfg.ema_decay) * p,
                        ema_params, state.params,
                    )
            eval_state = (
                TrainState(params=ema_params, batch_stats=state.batch_stats,
                           opt_state=state.opt_state, step=state.step)
                if ema_params is not None else state
            )
            stats = jax.device_get(stats)
            p_val = self.predict_proba(eval_state, images[val_idx], tta=False)
            auc = roc_auc(y[val_idx], p_val)
            log(
                f"[kfold ep {ep}] loss {np.mean([s['loss'] for s in stats]):.4f} "
                f"gnorm {np.mean([s['grad_norm'] for s in stats]):.3f} "
                f"logit_std {np.mean([s['logit_std'] for s in stats]):.3f} "
                f"val_auc {auc:.4f} ({tp.imgs_per_sec:.1f} imgs/s)"
            )
            if auc > best["auc"]:
                from mmtrs_tpu.train.common import snapshot

                best = {"auc": auc, "state": snapshot(eval_state), "since": 0}
            else:
                best["since"] += 1
                if cfg.patience and best["since"] >= cfg.patience:
                    log(f"[kfold] early stop at epoch {ep}")
                    break
        # threshold on val with the constrained objective
        p_val = self.predict_proba(best["state"], images[val_idx])
        best["thr"] = tune_threshold_constrained(
            y[val_idx], p_val, cfg.thr_objective, cfg.thr_min_recall
        )
        best["imgs_per_sec"] = tp.imgs_per_sec
        return best

    def quick_train_probe(self, state, images, y, n: int = 64) -> float:
        """Train-probe AUC on a sample (quick_train_sample_metrics :103-121)."""
        sel = np.arange(min(n, len(images)))
        p = self.predict_proba(state, images[sel], tta=False)
        return roc_auc(y[sel], p)


def run_hard_kfold(
    images: np.ndarray,
    df: pd.DataFrame,
    cfg: KFoldConfig,
    outdir=None,
    epochs: int | None = None,
    via_folds: pd.DataFrame | None = None,
    mesh=None,
    log=print,
) -> dict:
    """StratifiedGroupKFold driver (or pre-exported fold table via
    ``via_folds`` with a `fold` column — groupcv_v3 --via-folds-dir mode);
    exports per-fold summaries + OOF/test prediction CSVs for stacking
    (predict_hard.py:92-103)."""
    from pathlib import Path

    from mmtrs_tpu.data.splits import stratified_group_kfold
    from mmtrs_tpu.utils.io import save_json

    y = df["y_majority"].astype(int).to_numpy()
    is_test = (df["split"] == "test").to_numpy()
    tv = np.nonzero(~is_test)[0]
    te = np.nonzero(is_test)[0]
    trainer = KFoldHardTrainer(cfg, mesh=mesh)
    # HBM-resident dataset (see run_mm_kfold): per-step device gather
    from mmtrs_tpu.train.common import device_put_dataset

    images = device_put_dataset(images)

    if via_folds is not None:
        folds = via_folds["fold"].to_numpy()
        splits = [
            (np.nonzero(folds[tv] != k)[0], np.nonzero(folds[tv] == k)[0])
            for k in range(cfg.n_folds)
        ]
    else:
        splits = list(
            stratified_group_kfold(
                y[tv], df.iloc[tv]["origin_id"].to_numpy(), cfg.n_folds, cfg.seed
            )
        )

    oof = np.full(len(tv), np.nan)
    test_probs, summaries = [], []
    for fold, (tr_rel, va_rel) in enumerate(splits):
        tr, va = tv[tr_rel], tv[va_rel]
        best = trainer.fit_fold(images, y, tr, va, epochs=epochs, log=log)
        oof[va_rel] = trainer.predict_proba(best["state"], images[va])
        if len(te):
            test_probs.append(trainer.predict_proba(best["state"], images[te]))
        summaries.append(
            {"fold": fold, "val_auc": float(best["auc"]), "thr": best["thr"],
             "imgs_per_sec": best["imgs_per_sec"]}
        )
    p_test = np.mean(test_probs, axis=0) if test_probs else np.zeros(0)
    result = {
        "folds": summaries,
        "mean_val_auc": float(np.mean([s["val_auc"] for s in summaries])),
        "test_auc": roc_auc(y[te], p_test) if len(te) else None,
    }
    if outdir is not None:
        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(
            {"image_name": df.iloc[tv]["image_name"], "y": y[tv], "prob_vis_hard": oof}
        ).to_csv(outdir / "oof_val.csv", index=False)
        pd.DataFrame(
            {"image_name": df.iloc[te]["image_name"], "y": y[te], "prob_vis_hard": p_test}
        ).to_csv(outdir / "pred_test.csv", index=False)
        save_json(result, outdir / "summary.json")
    return result
