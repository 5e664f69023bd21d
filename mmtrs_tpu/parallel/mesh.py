"""Device mesh + data-parallel sharding.

The reference is strictly single-device (SURVEY.md §2.12: no
torch.distributed anywhere); at these model scales (EfficientNet-B4 ≈ 19M
params) the designed parallelism is pure data parallelism over ICI:

- 1-D ``data`` mesh over all chips (`jax.sharding.Mesh`);
- batches sharded on axis 0 (`NamedSharding(P("data"))`);
- parameters/optimizer state replicated (`NamedSharding(P())`);
- gradient all-reduce emitted by XLA automatically from the sharding
  annotations on the jitted train step — the role NCCL would play is
  entirely XLA collectives over ICI.

TP/PP/SP/EP are intentionally out of scope for these CNN/tree workloads;
the axis layout leaves room to add a ``model`` axis later.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis 0 to a device-count multiple; returns (padded, real_count).
    Static shapes for jit: the pad rows replicate row 0 and are masked out
    downstream by the caller using real_count."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_idx = np.zeros(rem, dtype=np.int64)
    pad = np.take(arr, pad_idx, axis=axis)
    return np.concatenate([arr, pad], axis=axis), n


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = "data") -> Any:
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(step_fn, mesh: Mesh, axis_name: str = "data", donate_state: bool = True):
    """jit a train step ``(state, batch, ...) -> (state, metrics)`` with
    replicated state and data-sharded batch. XLA inserts the psum for the
    gradient all-reduce from these shardings.

    Batch leaves are sharded per-leaf: only leaves whose axis 0 is a
    device-count multiple ride the ``data`` axis — small side inputs (class
    weights [2], scalars) are replicated instead of erroring (a [2] leaf
    cannot be split 8 ways)."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    n = mesh.size

    def put_leaf(x):
        x = jax.numpy.asarray(x)
        batchy = x.ndim >= 1 and x.shape[0] >= n and x.shape[0] % n == 0
        return jax.device_put(x, shard if batchy else repl)

    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, None),  # batch: taken from operand shardings
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )

    def call(state, batch):
        return jitted(state, jax.tree.map(put_leaf, batch))

    # the parity worker inspects compiled HLO for the gradient all-reduce
    call.lower = lambda state, batch: jitted.lower(
        state, jax.tree.map(put_leaf, batch)
    )
    return call


def data_parallel_eval_jit(eval_fn, mesh: Mesh, n_sharded_args: int = 1, axis_name: str = "data"):
    """jit an eval step ``(state, *batch_args) -> outputs`` with replicated
    state, the trailing ``n_sharded_args`` positional args batch-sharded, and
    batch-sharded outputs (no collective needed; each chip scores its shard)."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        eval_fn,
        in_shardings=(repl,) + (shard,) * n_sharded_args,
        out_shardings=shard,
    )
