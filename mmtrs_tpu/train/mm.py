"""MM dual-task trainer (train_mm_joint_dualtask.py parity).

GroupKFold(5) on origin_id over train+val rows, per-fold StandardScaler on
the 9 tabular features, loss = α·BCE(hard) + β·BCE(soft) (α=1, β=0.3),
AdamW + per-iteration cosine + grad-clip 1.0, per-epoch temperature scaling
(LBFGS) on val logits, F1 threshold sweep 0.2-0.8×61, best-val-AUC
checkpoint carrying {thr, T, scaler_mean, scaler_scale}, 3-way TTA predict
(none/h/v flip) with sigmoid(logit/T) — then oof_val.csv / pred_test.csv /
summary.json.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from mmtrs_tpu.config import MMJointConfig
from mmtrs_tpu.data.features import BASE_FEATURES
from mmtrs_tpu.metrics import roc_auc
from mmtrs_tpu.metrics.thresholds import sweep_thresholds
from mmtrs_tpu.models.linear import TemperatureScaler
from mmtrs_tpu.models.mm_joint import MMJointDualHead
from mmtrs_tpu.ops.resize import resize_bilinear
from mmtrs_tpu.train.common import (
    TrainState,
    bce_logits,
    epoch_batches,
    make_optimizer,
    normalize_imagenet,
)


@dataclass
class StandardScaler:
    mean: np.ndarray
    scale: np.ndarray

    @staticmethod
    def fit(X: np.ndarray) -> "StandardScaler":
        m = X.mean(axis=0)
        s = X.std(axis=0)
        return StandardScaler(m, np.where(s > 0, s, 1.0))

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (X - self.mean) / self.scale


def mm_fold_splits(df_tv: pd.DataFrame, n_folds: int):
    """The exact fold generator used by training AND finalize — identical
    seeds/order so finalize reproduces the same folds
    (finalize_mm_dualtask_from_ckpts.py:122-129 contract)."""
    from mmtrs_tpu.data.splits import group_kfold

    yield from group_kfold(df_tv, n_folds)


class MMTrainer:
    def __init__(self, cfg: MMJointConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None and cfg.batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh size {mesh.size}"
            )
        self.model = MMJointDualHead(
            model_name=cfg.model_name,
            tab_hidden=cfg.tab_hidden,
            tab_dropout=cfg.tab_dropout,
            head_dropout=cfg.head_dropout,
        )

    def init_state(self, total_steps: int, pretrained: dict | None = None) -> TrainState:
        """``pretrained``: converted backbone weights (timm pretrained=True
        parity, train_mm_joint_dualtask.py:375) merged into the image
        backbone submodule; tab MLP + heads keep their fresh init."""
        cfg = self.cfg
        variables = self.model.init(
            jax.random.key(cfg.seed),
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
            jnp.zeros((1, cfg.tab_dim), jnp.float32),
            train=False,
        )
        if pretrained is not None:
            from mmtrs_tpu.models.backbones.convert import merge_pretrained

            variables = merge_pretrained(variables, pretrained)
        self.tx = make_optimizer(
            cfg.lr, cfg.weight_decay, total_steps, grad_clip=cfg.grad_clip
        )
        state = TrainState.create(variables, self.tx)
        # structure templates for checkpoint restoration (finalize flow)
        self._template_params = jax.tree.map(np.asarray, variables["params"])
        self._template_batch_stats = jax.tree.map(
            np.asarray, variables.get("batch_stats", {})
        )

        def step(state: TrainState, batch):
            def compute(params):
                variables = {"params": params, "batch_stats": state.batch_stats}
                (lc, lr_), mut = self.model.apply(
                    variables, batch["img"], batch["tab"], train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(jax.random.key(2), state.step)},
                )
                loss = self.cfg.alpha_hard * bce_logits(lc, batch["y"]) + \
                    self.cfg.beta_soft * bce_logits(lr_, batch["p"])
                return loss, mut

            (loss, mut), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, batch_stats=mut["batch_stats"],
                           opt_state=opt_state, step=state.step + 1),
                loss,
            )

        def eval_fn(st, img, tab):
            return self.model.apply(
                {"params": st.params, "batch_stats": st.batch_stats}, img, tab,
                train=False,
            )[0]

        if self.mesh is None:
            self._train_step = jax.jit(step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_fn)
        else:
            from mmtrs_tpu.parallel.mesh import data_parallel_eval_jit, data_parallel_jit

            self._train_step = data_parallel_jit(step, self.mesh)
            self._eval_step = data_parallel_eval_jit(eval_fn, self.mesh, n_sharded_args=2)
        return state

    def _prep(self, imgs: np.ndarray) -> jnp.ndarray:
        # u8 stays u8 into the resize matmuls (widen fuses into the read)
        x = jnp.asarray(imgs)
        if x.shape[1] != self.cfg.img_size:
            x = resize_bilinear(x, (self.cfg.img_size, self.cfg.img_size))
        return normalize_imagenet(x.astype(jnp.float32))

    def _prep_train(self, imgs, sel: np.ndarray, epoch: int) -> jnp.ndarray:
        """Train-batch prep: per-step on-device augmentation (cfg.train_aug,
        reference timm create_transform parity — train_mm_joint_dualtask.py
        :72-93) before resize+normalize. Eval batches go through ``_prep``
        and are never augmented. Keys derive from (seed, dataset row, epoch)
        so runs are deterministic and epochs see different draws."""
        # keep uint8 INTO the augmenter: the fused Pallas augment paths read
        # 1-byte pixels (resize/normalize below promote to f32 regardless)
        x = jnp.asarray(imgs)
        if self.cfg.train_aug != "none":
            from mmtrs_tpu.ops.augment import augment_batch
            from mmtrs_tpu.utils.rng import keys_for_batch

            keys = keys_for_batch(
                self.cfg.seed, np.asarray(sel), np.full(len(sel), epoch)
            )
            x = augment_batch(x, keys, self.cfg.train_aug,
                              img_size=int(x.shape[1]))
        x = x.astype(jnp.float32)
        if x.shape[1] != self.cfg.img_size:
            x = resize_bilinear(x, (self.cfg.img_size, self.cfg.img_size))
        return normalize_imagenet(x)

    def logits(self, state, images, tab, tta: bool = True) -> np.ndarray:
        """3-way TTA (none/hflip/vflip) mean logit (trainer _predict :321-345).

        All batch dispatches are issued asynchronously (view-mean stays on
        device); ONE fetch at the end — per-batch np.asarray would pay a
        host sync per view per batch (3·⌈N/bs⌉ round-trips)."""
        bs = self.cfg.batch_size
        out, pads = [], []
        for s in range(0, len(images), bs):
            imgs = images[s : s + bs]
            t = jnp.asarray(tab[s : s + bs], jnp.float32)
            pad = bs - len(imgs) if len(imgs) < bs else 0
            if pad:
                # jnp (not np) concat: images may be device-resident — np.*
                # would silently pull the batch back to host
                imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad, 0)])
                t = jnp.concatenate([t, jnp.repeat(t[-1:], pad, 0)])
            x = self._prep(imgs)
            views = [x, x[:, :, ::-1, :], x[:, ::-1, :, :]] if tta else [x]
            l = sum(self._eval_step(state, v, t) for v in views) / len(views)
            out.append(l)
            pads.append(pad)
        host = np.asarray(jnp.concatenate(out))  # single device→host fetch
        chunks, ofs = [], 0
        for pad in pads:
            chunks.append(host[ofs : ofs + bs - pad])
            ofs += bs
        return np.concatenate(chunks)

    def fit_fold(self, images, tab_raw, y, p_soft, train_idx, val_idx,
                 epochs=None, log=print) -> dict:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        scaler = StandardScaler.fit(tab_raw[train_idx])
        tab = scaler.transform(tab_raw)
        steps = max(len(train_idx) // cfg.batch_size, 1) * epochs
        state = self.init_state(steps)
        rng = np.random.default_rng(cfg.seed)
        best = {"auc": -np.inf}
        for ep in range(epochs):
            losses = []
            for bidx in epoch_batches(len(train_idx), cfg.batch_size, rng):
                sel = train_idx[bidx]
                batch = {
                    "img": self._prep_train(images[sel], sel, ep),
                    "tab": jnp.asarray(tab[sel], jnp.float32),
                    "y": jnp.asarray(y[sel].astype(np.float32)),
                    "p": jnp.asarray(p_soft[sel].astype(np.float32)),
                }
                state, loss = self._train_step(state, batch)
                losses.append(loss)  # device scalar: no per-step host sync
            # ONE device→host sync per epoch (per-step float() costs a
            # full tunnel round-trip on remote TPUs)
            losses = np.asarray(jnp.stack(losses))
            # per-epoch temperature scaling on val logits (:270-287)
            lv = self.logits(state, images[val_idx], tab[val_idx], tta=False)
            ts = TemperatureScaler().fit(lv, y[val_idx])
            pv = 1 / (1 + np.exp(-lv / ts.temperature))
            auc = roc_auc(y[val_idx], pv)
            # F1 threshold sweep 0.2-0.8 × 61 (:290-295)
            grid = np.linspace(0.2, 0.8, 61)
            sw = sweep_thresholds(y[val_idx], pv, grid)
            thr = float(grid[int(np.argmax(sw["f1"]))])
            log(f"[mm ep {ep}] loss {np.mean(losses):.4f} val_auc {auc:.4f} "
                f"T {ts.temperature:.3f} thr {thr:.3f}")
            if auc > best["auc"]:
                from mmtrs_tpu.train.common import snapshot

                best = {"auc": auc, "state": snapshot(state), "T": ts.temperature,
                        "thr": thr, "scaler": scaler}
        return best

    def predict_proba(self, fold: dict, images, tab_raw) -> np.ndarray:
        tab = fold["scaler"].transform(tab_raw)
        l = self.logits(fold["state"], images, tab, tta=True)
        return 1 / (1 + np.exp(-l / fold["T"]))


def run_mm_kfold(
    images: np.ndarray,
    df: pd.DataFrame,
    cfg: MMJointConfig = MMJointConfig(),
    outdir=None,
    epochs: int | None = None,
    save_ckpts: bool = False,
    mesh=None,
    log=print,
) -> dict:
    """5-fold GroupKFold driver → oof_val.csv / pred_test.csv / summary.json
    (train_mm_joint_dualtask.py:362-437). With ``save_ckpts``, each fold's
    best state is persisted with its full inference recipe
    (scaler mean/scale, temperature, threshold — ckpt payload parity with
    :302-313) so :func:`finalize_mm_from_ckpts` can regenerate artifacts."""
    from pathlib import Path

    from mmtrs_tpu.utils.io import save_json

    y = df["y_majority"].astype(int).to_numpy()
    p_soft = df["p_indirect"].to_numpy().astype(np.float32)
    tab_raw = df[list(BASE_FEATURES)].to_numpy().astype(np.float32)
    is_test = (df["split"] == "test").to_numpy()
    tv = np.nonzero(~is_test)[0]
    te = np.nonzero(is_test)[0]

    trainer = MMTrainer(cfg, mesh=mesh)
    # dataset lives in HBM for the whole run: per-step images[sel] becomes a
    # device gather instead of a host fancy-index + 100 MB host→device copy
    # (uint8, so a 422-case 10×-augmented cohort at 512px is ~3.6 GB)
    from mmtrs_tpu.train.common import device_put_dataset

    images = device_put_dataset(images)
    df_tv = df.iloc[tv].reset_index(drop=True)
    oof = np.full(len(tv), np.nan)
    test_probs, fold_summaries = [], []
    mlog = None
    if outdir is not None:  # structured observability (SURVEY §5)
        from mmtrs_tpu.utils.profiling import StructuredLogger

        mlog = StructuredLogger(Path(outdir) / "metrics.jsonl")
    for fold, (tr_rel, va_rel) in enumerate(mm_fold_splits(df_tv, cfg.n_folds)):
        tr, va = tv[tr_rel], tv[va_rel]
        best = trainer.fit_fold(images, tab_raw, y, p_soft, tr, va, epochs, log)
        if mlog is not None:
            mlog.log("fold_done", fold=fold, val_auc=float(best["auc"]),
                     thr=float(best["thr"]), T=float(best["T"]))
        oof[va_rel] = trainer.predict_proba(best, images[va], tab_raw[va])
        if len(te):
            test_probs.append(trainer.predict_proba(best, images[te], tab_raw[te]))
        fold_summaries.append(
            {"fold": fold, "val_auc": float(best["auc"]), "thr": best["thr"],
             "T": best["T"]}
        )
        if save_ckpts and outdir is not None:
            from mmtrs_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                Path(outdir) / f"mm_dualtask_fold{fold}",
                {"params": best["state"].params,
                 "batch_stats": best["state"].batch_stats},
                recipe={
                    "model_name": cfg.model_name,
                    "img_size": cfg.img_size,
                    "thr": best["thr"],
                    "T": best["T"],
                    "scaler_mean": best["scaler"].mean.tolist(),
                    "scaler_scale": best["scaler"].scale.tolist(),
                    "fold": fold,
                },
            )
        log(f"[mm fold {fold}] val_auc {best['auc']:.4f}")

    p_test = np.mean(test_probs, axis=0) if test_probs else np.zeros(0)
    summary = {
        "folds": fold_summaries,
        "mean_val_auc": float(np.mean([f["val_auc"] for f in fold_summaries])),
        "test_auc": roc_auc(y[te], p_test) if len(te) else None,
    }
    oof_df = pd.DataFrame(
        {"image_name": df.iloc[tv]["image_name"].values, "y": y[tv].astype(float), "prob": oof}
    )
    test_df = pd.DataFrame(
        {"image_name": df.iloc[te]["image_name"].values, "y": y[te].astype(float), "prob": p_test}
    )
    if outdir is not None:
        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        oof_df.to_csv(outdir / "oof_val.csv", index=False)
        test_df.to_csv(outdir / "pred_test.csv", index=False)
        save_json(summary, outdir / "summary.json")
    return {"summary": summary, "oof": oof_df, "test": test_df}


def finalize_mm_from_ckpts(
    images: np.ndarray,
    df: pd.DataFrame,
    ckpt_dir,
    cfg: MMJointConfig = MMJointConfig(),
    outdir=None,
    log=print,
) -> dict:
    """Regenerate finalized OOF/test artifacts from saved fold checkpoints
    WITHOUT retraining (finalize_mm_dualtask_from_ckpts.py parity): re-run
    the identical GroupKFold, reload each fold's state + recipe (scaler
    stats, temperature), TTA-predict, write finalized/ artifacts."""
    from pathlib import Path

    from mmtrs_tpu.utils.checkpoint import load_checkpoint
    from mmtrs_tpu.utils.io import save_json

    ckpt_dir = Path(ckpt_dir)
    y = df["y_majority"].astype(int).to_numpy()
    tab_raw = df[list(BASE_FEATURES)].to_numpy().astype(np.float32)
    is_test = (df["split"] == "test").to_numpy()
    tv = np.nonzero(~is_test)[0]
    te = np.nonzero(is_test)[0]

    trainer = MMTrainer(cfg)
    trainer.init_state(total_steps=1)  # builds eval step + module
    df_tv = df.iloc[tv].reset_index(drop=True)
    oof = np.full(len(tv), np.nan)
    test_probs = []
    from mmtrs_tpu.train.common import TrainState

    for fold, (tr_rel, va_rel) in enumerate(mm_fold_splits(df_tv, cfg.n_folds)):
        va = tv[va_rel]
        variables, recipe = load_checkpoint(
            ckpt_dir / f"mm_dualtask_fold{fold}",
            target={"params": trainer._template_params,
                    "batch_stats": trainer._template_batch_stats},
        )
        scaler = StandardScaler(
            mean=np.asarray(recipe["scaler_mean"]),
            scale=np.asarray(recipe["scaler_scale"]),
        )
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=(), step=jnp.zeros((), jnp.int32),
        )
        fold_bundle = {"state": state, "T": recipe["T"], "scaler": scaler}
        oof[va_rel] = trainer.predict_proba(fold_bundle, images[va], tab_raw[va])
        if len(te):
            test_probs.append(
                trainer.predict_proba(fold_bundle, images[te], tab_raw[te])
            )
        log(f"[finalize fold {fold}] T={recipe['T']:.3f}")

    p_test = np.mean(test_probs, axis=0) if test_probs else np.zeros(0)
    from mmtrs_tpu.metrics import roc_auc

    summary = {
        "oof_auc": roc_auc(y[tv], oof),
        "test_auc": roc_auc(y[te], p_test) if len(te) else None,
        "finalized_from": str(ckpt_dir),
    }
    oof_df = pd.DataFrame(
        {"image_name": df.iloc[tv]["image_name"].values,
         "y": y[tv].astype(float), "prob": oof}
    )
    test_df = pd.DataFrame(
        {"image_name": df.iloc[te]["image_name"].values,
         "y": y[te].astype(float), "prob": p_test}
    )
    if outdir is not None:
        outdir = Path(outdir) / "finalized"
        outdir.mkdir(parents=True, exist_ok=True)
        oof_df.to_csv(outdir / "oof_val.csv", index=False)
        test_df.to_csv(outdir / "pred_test.csv", index=False)
        save_json(summary, outdir / "summary.json")
    return {"summary": summary, "oof": oof_df, "test": test_df}
