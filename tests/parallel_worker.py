"""Multi-device worker: runs under a forced-CPU 8-virtual-device env
(spawned by tests/test_parallel.py) and checks, for each trainer family,
that the data-parallel mesh path computes the same training trajectory and
eval outputs as the single-device path.

Prints one JSON line with the collected evidence; the pytest side asserts.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _losses_and_logits_mm(mesh):
    import jax.numpy as jnp

    from mmtrs_tpu.config import MMJointConfig
    from mmtrs_tpu.train.mm import MMTrainer

    cfg = MMJointConfig(
        model_name="test_cnn", img_size=32, batch_size=16, tab_hidden=8,
        train_aug="none",  # parity target is the mesh, not augmentation
    )
    rng = np.random.default_rng(7)
    imgs = rng.uniform(0, 255, (17, 32, 32, 3)).astype(np.float32)
    tab = rng.normal(size=(17, 9)).astype(np.float32)
    y = rng.integers(0, 2, 17).astype(np.float32)

    trainer = MMTrainer(cfg, mesh=mesh)
    state = trainer.init_state(total_steps=3)
    batch = {
        "img": trainer._prep(imgs[:16]),
        "tab": jnp.asarray(tab[:16]),
        "y": jnp.asarray(y[:16]),
        "p": jnp.asarray(np.full(16, 0.5, np.float32)),
    }
    losses = []
    for _ in range(3):
        state, loss = trainer._train_step(state, batch)
        losses.append(float(loss))
    logits = trainer.logits(state, imgs, tab, tta=True)  # ragged → pad path
    return losses, logits, trainer


def _losses_and_logits_mil(mesh):
    import jax.numpy as jnp

    from mmtrs_tpu.config import MILConfig
    from mmtrs_tpu.train.mil import MILTrainer

    cfg = MILConfig(model_name="test_cnn", bag_size=2, img_size=32, batch_size=8)
    rng = np.random.default_rng(8)
    imgs = rng.uniform(0, 255, (9, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 2, 9).astype(np.float32)
    oid = np.arange(9)

    trainer = MILTrainer(cfg, mesh=mesh)
    state = trainer.init_state(total_steps=3)
    bags = trainer._make_train_bags(imgs[:8], seed=1, origin_ids=oid[:8])
    losses = []
    for _ in range(3):
        state, loss = trainer._train_step(
            state, {"bags": bags, "y": jnp.asarray(y[:8])}
        )
        losses.append(float(loss))
    probs = trainer.predict_proba(state, imgs, oid)  # ragged → pad path
    return losses, probs, trainer


def _losses_and_logits_kfold(mesh):
    import jax.numpy as jnp

    from mmtrs_tpu.train.kfold import KFoldConfig, KFoldHardTrainer

    cfg = KFoldConfig(model_name="test_cnn", img_size=32, batch_size=16)
    rng = np.random.default_rng(9)
    imgs = rng.uniform(0, 255, (17, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 2, 17).astype(np.float32)

    trainer = KFoldHardTrainer(cfg, mesh=mesh)
    trainer._build_steps(total_steps=3, pos_weight=1.3, freeze_backbone=False)
    import jax

    variables = trainer.model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
    )
    from mmtrs_tpu.train.common import TrainState

    state = TrainState.create(variables, trainer.tx)
    x = trainer._prep(imgs[:16])
    losses = []
    for _ in range(3):
        state, m = trainer._train_step(state, {"x": x, "y": jnp.asarray(y[:16])})
        losses.append(float(m["loss"]))
    probs = trainer.predict_proba(state, imgs)  # ragged → pad path
    return losses, probs, trainer


def _losses_and_logits_vision(mesh):
    import jax
    import jax.numpy as jnp

    from mmtrs_tpu.config import VisionTrainConfig
    from mmtrs_tpu.train.common import TrainState
    from mmtrs_tpu.train.vision import VisionData, VisionTrainer

    cfg = VisionTrainConfig(model_name="test_cnn", img_size=32, batch_size=16,
                            task="hard", bf16=False)
    rng = np.random.default_rng(10)
    imgs = rng.uniform(0, 255, (17, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 2, 17).astype(np.float32)

    trainer = VisionTrainer(cfg, mesh=mesh)
    state = trainer.init_state(total_steps=3)
    x = trainer._prep_images(imgs[:16], train=False, seed=0)
    losses = []
    cw = jnp.asarray([1.0, 1.3], jnp.float32)  # [2] leaf: must replicate
    for _ in range(3):
        state, m = trainer._train_step(
            state,
            {"inputs": (x,), "y": jnp.asarray(y[:16].astype(np.int32)), "cw": cw},
        )
        losses.append(float(m["loss"]))
    data = VisionData(images=imgs, y=y)
    probs = trainer.predict_proba(state, data)  # ragged → pad path
    return losses, probs, trainer


def _losses_and_logits_progressive(mesh):
    """Full train_progressive driver (2 tiny stages, stage-resume included)
    — single-device vs mesh must produce identical ensemble probabilities
    because batch selection, init, and augmentation are host-deterministic
    and the mesh only shards the already-formed batches."""
    from mmtrs_tpu.config import ProgressiveConfig, ProgressiveStage
    from mmtrs_tpu.train.progressive import (
        progressive_ensemble_probs,
        train_progressive,
    )
    from mmtrs_tpu.train.vision import VisionData

    rng = np.random.default_rng(11)
    imgs = rng.uniform(0, 255, (24, 32, 32, 3)).astype(np.uint8)
    y = rng.integers(0, 2, 24).astype(np.int64)
    data = VisionData(images=imgs[:16], y=y[:16])
    val = VisionData(images=imgs[16:], y=y[16:])
    cfg = ProgressiveConfig(
        model_name="test_cnn",
        stages=(ProgressiveStage(img_size=32, epochs=1, batch_size=8, lr=1e-3),
                ProgressiveStage(img_size=32, epochs=1, batch_size=8, lr=5e-4)),
        seeds=(0,),
    )
    states = train_progressive(cfg, data, val, mesh=mesh, log=lambda *a: None)
    probs = progressive_ensemble_probs(states, val)
    trainer = states[0][0]
    return [float(p) for p in probs], probs, trainer


def main() -> None:
    import jax

    out: dict = {"n_devices": jax.device_count(), "platform": jax.devices()[0].platform}

    from mmtrs_tpu.parallel.mesh import make_mesh, pad_to_multiple

    # pad_to_multiple semantics on a real multi-device count
    arr = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    padded, real = pad_to_multiple(arr, 8)
    out["pad_shape"] = list(padded.shape)
    out["pad_real"] = real
    out["pad_rows_are_row0"] = bool(np.all(padded[10:] == arr[0]))

    mesh = make_mesh(8)
    out["mesh_shape"] = dict(mesh.shape)

    for name, fn in [
        ("mm", _losses_and_logits_mm),
        ("mil", _losses_and_logits_mil),
        ("kfold", _losses_and_logits_kfold),
        ("vision", _losses_and_logits_vision),
        ("progressive", _losses_and_logits_progressive),
    ]:
        losses1, eval1, _ = fn(None)
        losses8, eval8, trainer8 = fn(mesh)
        out[f"{name}_losses_single"] = losses1
        out[f"{name}_losses_mesh"] = losses8
        out[f"{name}_eval_max_diff"] = float(np.max(np.abs(np.asarray(eval1) - np.asarray(eval8))))
        out[f"{name}_eval_n"] = int(len(eval8))
        # the mesh train step must actually communicate: its compiled HLO
        # carries an all-reduce emitted from the sharding annotations
        hlo = trainer8._train_step.lower(
            *_example_args(name, trainer8)
        ).compile().as_text()
        out[f"{name}_has_all_reduce"] = "all-reduce" in hlo

    print("WORKER_JSON:" + json.dumps(out))


def _example_args(name: str, trainer):
    """Abstract (state, batch) matching each trainer's step signature for
    .lower() — reuse the concrete shapes the worker trained with."""
    import jax
    import jax.numpy as jnp

    from mmtrs_tpu.train.common import TrainState

    if name == "mm":
        cfgb = 16
        variables = trainer.model.init(
            jax.random.key(0),
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            jnp.zeros((1, 9), jnp.float32),
            train=False,
        )
        state = TrainState.create(variables, trainer.tx)
        batch = {
            "img": jnp.zeros((cfgb, 32, 32, 3), jnp.float32),
            "tab": jnp.zeros((cfgb, 9), jnp.float32),
            "y": jnp.zeros((cfgb,), jnp.float32),
            "p": jnp.zeros((cfgb,), jnp.float32),
        }
        return state, batch
    if name == "mil":
        variables = trainer.model.init(
            jax.random.key(0), jnp.zeros((1, 2, 32, 32, 3), jnp.float32), train=False
        )
        state = TrainState.create(variables, trainer.tx)
        return state, {
            "bags": jnp.zeros((8, 2, 32, 32, 3), jnp.float32),
            "y": jnp.zeros((8,), jnp.float32),
        }
    if name in ("vision", "progressive"):
        B = 16 if name == "vision" else 8
        variables = trainer.model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
        )
        state = TrainState.create(variables, trainer.tx)
        batch = {
            "inputs": (jnp.zeros((B, 32, 32, 3), jnp.float32),),
            "y": jnp.zeros((B,), jnp.int32),
        }
        if name == "vision":
            batch["cw"] = jnp.asarray([1.0, 1.3], jnp.float32)
        else:
            batch["cw"] = jnp.ones((2,), jnp.float32)
        return state, batch
    variables = trainer.model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
    )
    state = TrainState.create(variables, trainer.tx)
    return state, {
        "x": jnp.zeros((16, 32, 32, 3), jnp.float32),
        "y": jnp.zeros((16,), jnp.float32),
    }


if __name__ == "__main__":
    main()
