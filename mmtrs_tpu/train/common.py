"""Shared training machinery: train state, optimizers, losses, samplers,
TTA evaluation — data-parallel over the 1-D mesh.

Reference recipes covered:
- AdamW + cosine annealing (+ optional linear warmup — train_hard_v2.py:120-129)
- 2-class CE with label smoothing + class-balanced weights
  (train_hard.py:195, train_hard_v2.py:240-246)
- per-sample-weighted BCE on soft targets (train_soft.py:78-106)
- WeightedRandomSampler from inverse class counts (train_hard.py:64-69)
- grad clipping (train_mm_joint_dualtask.py:248-254)
- hflip TTA evaluation (train_hard.py:100-129)
- imgs/s as the first-class perf metric (train_hard_kfold_v2.py:175-187)

Mixed precision: the reference uses CUDA AMP; here activations are bf16
inside the model (backbone dtype) while params/opt state stay f32 — the TPU
analog, no loss-scaling needed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmtrs_tpu.parallel.mesh import make_mesh, pad_to_multiple, replicate, shard_batch

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def device_put_dataset(x) -> jnp.ndarray:
    """Move a whole (uint8) image dataset into HBM once per run.

    Trainers index ``images[sel]`` every step; with a host numpy array that
    is a fancy-index copy + a host→device transfer of the batch through the
    (slow, on tunneled TPUs) PCIe/tunnel hop — per step. Device-resident, it
    is an on-chip row gather. No-op if already a jax.Array."""
    if isinstance(x, jax.Array):
        return x
    return jnp.asarray(np.ascontiguousarray(x))


def normalize_imagenet(imgs: jnp.ndarray) -> jnp.ndarray:
    """uint8/float 0..255 [B,H,W,3] → ImageNet-normalized float32
    (datasets.py:21-22)."""
    x = imgs.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def snapshot(tree):
    """Deep-copy a pytree's device buffers. Required before retaining any
    state across further train steps: the steps donate their input state
    (buffer reuse), which deletes the retained aliases otherwise."""
    return jax.tree.map(jnp.copy, tree)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @staticmethod
    def create(variables, tx):
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-4,
    total_steps: int = 1000,
    warmup_steps: int = 0,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    # warmup must fit inside the run: optax requires decay_steps (total −
    # warmup) > 0, and a tiny smoke run (progressive stage of 2 steps with
    # the recipe's warmup 100) would otherwise crash
    warmup = min(warmup_steps, max(total_steps - 1, 0))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup else lr,
        peak_value=lr,
        warmup_steps=max(warmup, 1) if warmup else 1,
        decay_steps=max(total_steps, 2),
        end_value=lr * 1e-2,
    )
    chain = []
    if grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(sched, weight_decay=weight_decay))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def ce_two_class(logits, y, label_smoothing=0.05, class_weights=None):
    """2-class CE on [B,2] logits (train_hard.py:195 semantics)."""
    oh = jax.nn.one_hot(y, 2)
    oh = oh * (1 - label_smoothing) + label_smoothing / 2
    logp = jax.nn.log_softmax(logits)
    loss = -jnp.sum(oh * logp, axis=-1)
    if class_weights is not None:
        loss = loss * class_weights[y]
    return jnp.mean(loss)


def bce_logits(logit, target, sample_weight=None):
    """Per-sample (optionally weighted) BCE on a single logit."""
    loss = jnp.maximum(logit, 0) - logit * target + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    if sample_weight is not None:
        return jnp.sum(loss * sample_weight) / jnp.maximum(jnp.sum(sample_weight), 1e-8)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Sampling / batching
# ---------------------------------------------------------------------------


def weighted_sampler_indices(y: np.ndarray, n: int, rng: np.random.Generator) -> np.ndarray:
    """WeightedRandomSampler equivalent: inverse-class-count weights with
    replacement (train_hard.py:64-69)."""
    y = np.asarray(y).astype(int)
    counts = np.bincount(y, minlength=2).astype(np.float64)
    w = 1.0 / np.maximum(counts[y], 1.0)
    p = w / w.sum()
    return rng.choice(len(y), size=n, replace=True, p=p)


def epoch_batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator,
    indices: np.ndarray | None = None,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    idx = np.arange(n) if indices is None else np.asarray(indices)
    idx = idx[rng.permutation(len(idx))]
    end = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
    for s in range(0, max(end, 0), batch_size):
        yield idx[s : s + batch_size]


@dataclass
class Throughput:
    """imgs/s tracker (train_hard_kfold_v2.py:175-187 parity)."""

    images: int = 0
    seconds: float = 0.0
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_images: int):
        self.seconds += time.perf_counter() - self._t0
        self.images += n_images

    @property
    def imgs_per_sec(self) -> float:
        return self.images / self.seconds if self.seconds > 0 else 0.0


# ---------------------------------------------------------------------------
# Data-parallel step builders
# ---------------------------------------------------------------------------


def build_train_step(model, tx, loss_fn: Callable, mesh=None):
    """loss_fn(outputs, batch) -> scalar. Model applied with mutable
    batch_stats and dropout rng folded from state.step."""

    def step(state: TrainState, batch):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mut = model.apply(
                variables,
                *batch["inputs"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(jax.random.key(0), state.step)},
            )
            return loss_fn(outputs, batch), (outputs, mut)

        (loss, (_, mut)), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=mut["batch_stats"],
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from mmtrs_tpu.parallel.mesh import data_parallel_jit

    return data_parallel_jit(step, mesh)


def build_eval_step(model, mesh=None):
    def step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, *batch["inputs"], train=False)

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, shard), out_shardings=shard)
