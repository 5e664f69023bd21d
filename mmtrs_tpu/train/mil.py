"""MIL attention trainer (train_mil_attention_v1.py parity).

GroupKFold(5) on origin_id, bags of K RandomResizedCrop instances built on
device per step, BCE on the bag logit, best-val-AUC checkpointing per fold,
hflip TTA at predict time, OOF/test CSVs + summary.json.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from mmtrs_tpu.config import MILConfig
from mmtrs_tpu.metrics import roc_auc
from mmtrs_tpu.models.mil import MILNet, make_bags
from mmtrs_tpu.train.common import (
    TrainState,
    bce_logits,
    epoch_batches,
    make_optimizer,
    normalize_imagenet,
)
from mmtrs_tpu.utils.rng import keys_for_batch


class MILTrainer:
    def __init__(self, cfg: MILConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None and cfg.batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by mesh size {mesh.size}"
            )
        self.model = MILNet(model_name=cfg.model_name, attn_dim=cfg.attn_dim)

    def init_state(self, total_steps: int) -> TrainState:
        cfg = self.cfg
        variables = self.model.init(
            jax.random.key(cfg.seed),
            jnp.zeros((1, cfg.bag_size, cfg.img_size, cfg.img_size, 3), jnp.float32),
            train=False,
        )
        self.tx = make_optimizer(cfg.lr, cfg.weight_decay, total_steps)
        state = TrainState.create(variables, self.tx)

        def loss_fn(outputs, batch):
            logit, _ = outputs
            return bce_logits(logit, batch["y"])

        import optax

        def step(state: TrainState, batch):
            def compute(params):
                variables = {"params": params, "batch_stats": state.batch_stats}
                outputs, mut = self.model.apply(
                    variables, batch["bags"], train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(jax.random.key(1), state.step)},
                )
                return loss_fn(outputs, batch), mut

            (loss, mut), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, batch_stats=mut["batch_stats"],
                           opt_state=opt_state, step=state.step + 1),
                loss,
            )

        def eval_fn(st, bags):
            return self.model.apply(
                {"params": st.params, "batch_stats": st.batch_stats}, bags, train=False
            )[0]

        if self.mesh is None:
            self._train_step = jax.jit(step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_fn)
        else:
            from mmtrs_tpu.parallel.mesh import data_parallel_eval_jit, data_parallel_jit

            self._train_step = data_parallel_jit(step, self.mesh)
            self._eval_step = data_parallel_eval_jit(eval_fn, self.mesh)
        return state

    def _make_train_bags(self, imgs: np.ndarray, seed: int, origin_ids) -> jnp.ndarray:
        cfg = self.cfg
        keys = keys_for_batch(seed, origin_ids, np.zeros(len(imgs)))
        # u8 source stays u8 into the crop einsums (the widen fuses into
        # the MXU read — 1 byte/px from HBM instead of 4)
        bags = make_bags(
            jnp.asarray(imgs), keys, cfg.bag_size, cfg.img_size,
            cfg.crop_scale,
        )
        return normalize_imagenet(bags)

    def _make_eval_bags(self, imgs: np.ndarray, origin_ids) -> jnp.ndarray:
        # deterministic bag (fixed key stream) for eval
        cfg = self.cfg
        keys = keys_for_batch(999, origin_ids, np.zeros(len(imgs)))
        bags = make_bags(
            jnp.asarray(imgs), keys, cfg.bag_size, cfg.img_size,
            cfg.crop_scale, hflip_p=0.0,
        )
        return normalize_imagenet(bags)

    def fit(self, images, y, origin_ids, train_idx, val_idx, epochs=None, log=print):
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        steps = max(len(train_idx) // cfg.batch_size, 1) * epochs
        state = self.init_state(steps)
        rng = np.random.default_rng(cfg.seed)
        best = {"auc": -np.inf, "state": state}
        for ep in range(epochs):
            losses = []
            for bidx in epoch_batches(len(train_idx), cfg.batch_size, rng):
                sel = train_idx[bidx]
                bags = self._make_train_bags(images[sel], cfg.seed + ep, origin_ids[sel])
                state, loss = self._train_step(
                    state, {"bags": bags, "y": jnp.asarray(y[sel].astype(np.float32))}
                )
                losses.append(loss)  # device scalar: no per-step host sync
            losses = np.asarray(jnp.stack(losses))  # ONE sync per epoch
            p_val = self.predict_proba(state, images[val_idx], origin_ids[val_idx])
            auc = roc_auc(y[val_idx], p_val)
            log(f"[mil ep {ep}] loss {np.mean(losses):.4f} val_auc {auc:.4f}")
            if auc > best["auc"]:
                from mmtrs_tpu.train.common import snapshot

                best = {"auc": auc, "state": snapshot(state)}
        return best["state"], best["auc"]

    def predict_proba(self, state, images, origin_ids, tta: bool | None = None) -> np.ndarray:
        cfg = self.cfg
        tta = cfg.tta_hflip if tta is None else tta
        bs = cfg.batch_size
        out = []
        for s in range(0, len(images), bs):
            imgs = images[s : s + bs]
            pad = bs - len(imgs) if len(imgs) < bs else 0
            if pad:
                # jnp concat: images may be device-resident (run_mil_kfold)
                imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad, 0)])
                oid = np.concatenate([origin_ids[s:], np.repeat(origin_ids[-1:], pad)])
            else:
                oid = origin_ids[s : s + bs]
            bags = self._make_eval_bags(imgs, oid)
            logit = self._eval_step(state, bags)  # async, stays on device
            if tta:
                logit = 0.5 * (
                    logit + self._eval_step(state, bags[:, :, :, ::-1, :])
                )
            out.append((logit, pad))
        # single device→host fetch after all batches are dispatched
        host = np.asarray(jnp.concatenate([l for l, _ in out]))
        chunks, ofs = [], 0
        for _, pad in out:
            p = 1 / (1 + np.exp(-host[ofs : ofs + bs]))
            chunks.append(p[: bs - pad])
            ofs += bs
        return np.concatenate(chunks)


def run_mil_kfold(
    images: np.ndarray,
    df: pd.DataFrame,
    cfg: MILConfig = MILConfig(),
    outdir=None,
    epochs: int | None = None,
    save_ckpts: bool = False,
    mesh=None,
    log=print,
) -> dict:
    """5-fold GroupKFold driver → oof_val.csv / pred_test.csv / summary.json
    (train_mil_attention_v1.py:152-295)."""
    from pathlib import Path

    from mmtrs_tpu.data.splits import group_kfold
    from mmtrs_tpu.utils.io import save_json

    y = df["y_majority"].astype(int).to_numpy()
    origin = df["origin_id"].to_numpy()
    is_test = (df["split"] == "test").to_numpy()
    tv = np.nonzero(~is_test)[0]
    te = np.nonzero(is_test)[0]

    # dataset lives in HBM for the whole run (see run_mm_kfold): per-step
    # images[sel] is a device gather, not a host copy + transfer
    from mmtrs_tpu.train.common import device_put_dataset

    images = device_put_dataset(images)
    oof = np.full(len(tv), np.nan)
    test_probs = []
    fold_aucs = []
    trainer = MILTrainer(cfg, mesh=mesh)
    df_tv = df.iloc[tv].reset_index(drop=True)
    for fold, (tr_rel, va_rel) in enumerate(group_kfold(df_tv, cfg.n_folds)):
        tr, va = tv[tr_rel], tv[va_rel]
        state, val_auc = trainer.fit(images, y, origin, tr, va, epochs=epochs, log=log)
        oof[va_rel] = trainer.predict_proba(state, images[va], origin[va])
        test_probs.append(trainer.predict_proba(state, images[te], origin[te]))
        fold_aucs.append(val_auc)
        if save_ckpts and outdir is not None:
            from pathlib import Path as _P

            from mmtrs_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                _P(outdir) / f"mil_v1_fold{fold}",
                {"params": state.params, "batch_stats": state.batch_stats},
                recipe={"model_name": cfg.model_name, "attn_dim": cfg.attn_dim,
                        "img_size": cfg.img_size, "bag_size": cfg.bag_size,
                        "fold": fold},
            )
        log(f"[mil fold {fold}] val_auc {val_auc:.4f}")

    p_test = np.mean(test_probs, axis=0)
    summary = {
        "folds": [{"fold": i, "val_auc": float(a)} for i, a in enumerate(fold_aucs)],
        "mean_val_auc": float(np.mean(fold_aucs)),
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
