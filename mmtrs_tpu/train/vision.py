"""Vision trainers: hard (2-class CE) and soft (weighted BCE on p_indirect).

Parity targets:
- models/vision/train_hard.py — grouped/stratified val split, weighted
  sampler, CE + label smoothing .05, AdamW+cosine, best-val-loss ckpt,
  hflip TTA, F1 threshold grid;
- models/vision/train_soft.py — single-logit weighted BCE on p_indirect,
  acc@0.5/auc/brier/mae metrics;
- experiments/vision_v2/train_hard_v2.py — progressive 384→512 staging,
  head-bias init to class prior, class-balanced CE weights + smoothing .10,
  warmup, multi-seed ensembling (ensemble_hard.py logit-mean + TTA).

TPU-first: images live on device, augmentation is the jit-compiled batch
suite from mmtrs_tpu.ops.augment, and the train step runs data-parallel on
the 1-D mesh.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from mmtrs_tpu.config import VisionTrainConfig
from mmtrs_tpu.metrics import binary_report, sweep_thresholds, threshold_grid
from mmtrs_tpu.models.backbones.factory import create_model
from mmtrs_tpu.ops.resize import resize_bilinear
from mmtrs_tpu.train.common import (
    TrainState,
    Throughput,
    bce_logits,
    build_eval_step,
    build_train_step,
    ce_two_class,
    epoch_batches,
    make_optimizer,
    normalize_imagenet,
    weighted_sampler_indices,
)
from mmtrs_tpu.utils.rng import keys_for_batch


@dataclass
class VisionData:
    """In-memory dataset: images uint8 [N,H,W,3] + per-row metadata."""

    images: np.ndarray
    y: np.ndarray  # hard labels
    p: np.ndarray | None = None  # soft targets
    w: np.ndarray | None = None  # consensus weights
    origin_id: np.ndarray | None = None
    aug_idx: np.ndarray | None = None

    def __len__(self):
        return len(self.images)


class VisionTrainer:
    def __init__(self, cfg: VisionTrainConfig, mesh=None, aug_preset: str = "none"):
        self.cfg = cfg
        self.mesh = mesh
        self.aug_preset = aug_preset
        self.model = create_model(
            cfg.model_name,
            num_classes=2 if cfg.task == "hard" else 1,
            drop_rate=cfg.drop_rate,
            drop_path=cfg.drop_path,
            dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        )

    # -- setup -------------------------------------------------------------

    def init_state(self, total_steps: int, head_bias: float = 0.0,
                   pretrained: dict | None = None):
        """``pretrained``: converted backbone weights from
        models.backbones.convert (the reference's timm pretrained=True,
        train_hard.py:155-157) — merged over the fresh init, head kept."""
        cfg = self.cfg
        if head_bias:
            self.model = replace(self.model, head_bias_init=head_bias)
        variables = self.model.init(
            jax.random.key(cfg.seed),
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
            train=False,
        )
        if pretrained is not None:
            from mmtrs_tpu.models.backbones.convert import merge_pretrained

            variables = merge_pretrained(variables, pretrained)
        self.tx = make_optimizer(
            cfg.lr, cfg.weight_decay, total_steps, cfg.warmup_steps
        )
        state = TrainState.create(variables, self.tx)
        if cfg.task == "hard":
            def loss_fn(outputs, batch):
                return ce_two_class(
                    outputs, batch["y"], self.cfg.label_smoothing, batch.get("cw")
                )
        else:
            def loss_fn(outputs, batch):
                return bce_logits(outputs[..., 0], batch["p"], batch.get("w"))

        self._train_step = build_train_step(self.model, self.tx, loss_fn, self.mesh)
        self._eval_step = build_eval_step(self.model, self.mesh)
        return state

    # -- batch prep ----------------------------------------------------------

    def _prep_images(self, imgs: np.ndarray, train: bool, seed: int,
                     origin_ids=None, aug_idxs=None):
        # keep uint8 INTO the augmenter (fused u8 Pallas paths); resize/
        # normalize below promote to f32 regardless
        x = jnp.asarray(imgs)
        if train and self.aug_preset != "none":
            from mmtrs_tpu.ops.augment import augment_batch

            keys = keys_for_batch(
                seed,
                origin_ids if origin_ids is not None else np.arange(len(imgs)),
                aug_idxs if aug_idxs is not None else np.zeros(len(imgs)),
            )
            x = augment_batch(x, keys, self.aug_preset,
                              aug_idx=aug_idxs, img_size=x.shape[1])
        x = x.astype(jnp.float32)
        if x.shape[1] != self.cfg.img_size:
            x = resize_bilinear(x, (self.cfg.img_size, self.cfg.img_size))
        return normalize_imagenet(x)

    # -- training ------------------------------------------------------------

    def fit(self, train: VisionData, val: VisionData, epochs: int | None = None,
            state: TrainState | None = None, log=print):
        from mmtrs_tpu.train.common import device_put_dataset

        cfg = self.cfg
        epochs = epochs or cfg.epochs
        # HBM-resident datasets: per-step images[bidx] is a device gather,
        # not a host fancy-index + per-step host→device transfer
        train.images = device_put_dataset(train.images)
        val.images = device_put_dataset(val.images)
        n = len(train)
        steps_per_epoch = max(n // cfg.batch_size, 1)
        if state is None:
            # head-bias init to the class prior (train_hard_v2.py:93-117)
            prior = float(np.clip(train.y.mean(), 1e-3, 1 - 1e-3))
            head_bias = float(np.log(prior / (1 - prior))) if cfg.task == "hard" else 0.0
            state = self.init_state(steps_per_epoch * epochs, head_bias=head_bias)

        rng = np.random.default_rng(cfg.seed)
        class_weights = None
        if cfg.task == "hard":
            counts = np.bincount(train.y.astype(int), minlength=2)
            cw = counts.sum() / (2.0 * np.maximum(counts, 1))
            class_weights = jnp.asarray(cw, jnp.float32)

        best = {"val_loss": np.inf, "val_auc": -np.inf, "state": state, "epoch": -1}
        tp = Throughput()
        history = []
        for ep in range(epochs):
            idx_stream = weighted_sampler_indices(
                train.y, steps_per_epoch * cfg.batch_size, rng
            ) if cfg.task == "hard" else None
            losses = []
            for bidx in epoch_batches(
                n, cfg.batch_size, rng,
                indices=idx_stream, drop_last=True,
            ):
                x = self._prep_images(
                    train.images[bidx], True, cfg.seed + ep,
                    None if train.origin_id is None else train.origin_id[bidx],
                    None if train.aug_idx is None else train.aug_idx[bidx],
                )
                batch = {"inputs": (x,), "y": jnp.asarray(train.y[bidx].astype(np.int32))}
                if class_weights is not None:
                    batch["cw"] = class_weights
                if train.p is not None:
                    batch["p"] = jnp.asarray(train.p[bidx].astype(np.float32))
                if train.w is not None:
                    batch["w"] = jnp.asarray(train.w[bidx].astype(np.float32))
                tp.start()
                state, m = self._train_step(state, batch)
                jax.block_until_ready(m["loss"])  # one sync: honest imgs/s
                tp.stop(len(bidx))
                losses.append(m["loss"])  # device scalar; fetched per epoch

            losses = jax.device_get(losses)
            val_metrics = self.evaluate(state, val, tta=False)
            history.append(
                {"epoch": ep, "train_loss": float(np.mean(losses)), **val_metrics,
                 "imgs_per_sec": tp.imgs_per_sec}
            )
            log(f"[ep {ep}] loss {np.mean(losses):.4f} "
                f"val_loss {val_metrics['loss']:.4f} val_auc {val_metrics['auc']:.4f} "
                f"({tp.imgs_per_sec:.1f} imgs/s)")
            if val_metrics["loss"] < best["val_loss"]:
                from mmtrs_tpu.train.common import snapshot

                best = {"val_loss": val_metrics["loss"], "val_auc": val_metrics["auc"],
                        "state": snapshot(state), "epoch": ep}
        return best["state"], history

    # -- inference -----------------------------------------------------------

    def predict_proba(self, state: TrainState, data: VisionData, tta: bool = None,
                      batch_size: int = 0) -> np.ndarray:
        cfg = self.cfg
        tta = cfg.tta_hflip if tta is None else tta
        bs = batch_size or cfg.batch_size
        probs = []
        for s in range(0, len(data), bs):
            imgs = data.images[s : s + bs]
            pad = bs - len(imgs) if len(imgs) < bs else 0
            if pad:
                # jnp concat: images may be device-resident (fit())
                imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad, 0)])
            x = self._prep_images(imgs, False, 0)
            views = [x, x[:, :, ::-1, :]] if tta else [x]
            # async dispatch; raw logits stay on device, ONE fetch at the end
            probs.append(
                (jnp.stack([self._eval_step(state, {"inputs": (v,)})
                            for v in views]), pad)
            )
        host = np.asarray(jnp.concatenate([ls for ls, _ in probs], axis=1))
        out, ofs = [], 0
        for _, pad in probs:
            ls = host[:, ofs : ofs + bs]
            p = np.mean([self._to_prob(l) for l in ls], axis=0)
            out.append(p[: bs - pad])
            ofs += bs
        return np.concatenate(out)

    def _to_prob(self, out: np.ndarray) -> np.ndarray:
        if self.cfg.task == "hard":
            e = np.exp(out - out.max(axis=-1, keepdims=True))
            return (e / e.sum(-1, keepdims=True))[:, 1]
        return 1.0 / (1.0 + np.exp(-out[..., 0]))

    def _eval_step_logits(self, state, x) -> np.ndarray:
        return self._to_prob(np.asarray(self._eval_step(state, {"inputs": (x,)})))

    def evaluate(self, state: TrainState, data: VisionData, tta: bool = False) -> dict:
        p = self.predict_proba(state, data, tta=tta)
        y = data.y.astype(int)
        rep = binary_report(y, p, 0.5)
        # val loss proxy for checkpoint selection
        eps = 1e-7
        pc = np.clip(p, eps, 1 - eps)
        loss = float(-np.mean(y * np.log(pc) + (1 - y) * np.log(1 - pc)))
        return {"loss": loss, "auc": rep["auc"], "acc": rep["acc"], "f1": rep["f1"]}

    def tune_threshold_f1(self, state, val: VisionData) -> float:
        """F1 grid on val applied to test (train_hard.py:131-139,224-243)."""
        p = self.predict_proba(state, val)
        ts = threshold_grid("fusion")
        s = sweep_thresholds(val.y.astype(int), p, ts)
        return float(ts[int(np.argmax(s["f1"]))])


def ensemble_predict(trainer: VisionTrainer, states: list, data: VisionData,
                     tta: bool = True) -> np.ndarray:
    """Seed-ensemble: logit-mean across models + hflip TTA with NaN repair
    (ensemble_hard.py:68-97,200-205)."""
    logits = []
    for st in states:
        p = trainer.predict_proba(st, data, tta=tta)
        p = np.clip(p, 1e-7, 1 - 1e-7)
        logits.append(np.log(p / (1 - p)))
    m = np.mean(logits, axis=0)
    m = np.nan_to_num(m, nan=0.0)  # NaN repair
    return 1.0 / (1.0 + np.exp(-m))


def per_model_aucs(trainer: VisionTrainer, states: list, data: VisionData,
                   tta: bool = True) -> list[float]:
    """Per-member AUC diagnostics to spot a bad seed before it drags the
    ensemble (ensemble_hard.py:122-137)."""
    from mmtrs_tpu.metrics import roc_auc

    return [
        roc_auc(data.y, trainer.predict_proba(st, data, tta=tta))
        for st in states
    ]
