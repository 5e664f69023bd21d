"""Multi-device data-parallel coverage (SURVEY §2.12, VERDICT round-1 items
1 & 5).

The certifying suite may run on a single real TPU (ambient axon platform),
so the multi-device checks execute in a forced-CPU subprocess with 8
virtual devices (the same mechanism `__graft_entry__.dryrun_multichip`
uses). The worker (tests/parallel_worker.py) trains each trainer family —
MM, MIL, KFold, Vision, and the full progressive driver — single-device
AND on an 8-device mesh with
identical data, then evals a ragged batch through the pad path; this test
asserts trajectory and eval parity plus the presence of an all-reduce in
the compiled mesh step.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from mmtrs_tpu.parallel.dryrun import forced_cpu_env

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def worker_result():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "parallel_worker.py")],
        env=forced_cpu_env(8),
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, f"worker failed:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("WORKER_JSON:")][-1]
    return json.loads(line[len("WORKER_JSON:"):])


def test_worker_env(worker_result):
    assert worker_result["n_devices"] == 8
    assert worker_result["platform"] == "cpu"
    assert worker_result["mesh_shape"] == {"data": 8}


def test_pad_to_multiple_semantics(worker_result):
    assert worker_result["pad_shape"] == [16, 3]
    assert worker_result["pad_real"] == 10
    assert worker_result["pad_rows_are_row0"]


@pytest.mark.parametrize("name", ["mm", "mil", "kfold", "vision", "progressive"])
def test_mesh_matches_single_device(worker_result, name):
    l1 = np.array(worker_result[f"{name}_losses_single"])
    l8 = np.array(worker_result[f"{name}_losses_mesh"])
    # identical data + identical rng folding → the 8-way mesh reduction may
    # reassociate float sums, nothing more (drift compounds over the 3
    # steps; measured ≤3e-4 relative)
    np.testing.assert_allclose(l8, l1, rtol=1e-3, atol=5e-5)
    assert worker_result[f"{name}_eval_max_diff"] < 2e-3
    # ragged eval exercised the pad path (n not divisible by batch size);
    # the progressive driver evals its 8-row val split (full train loop)
    assert worker_result[f"{name}_eval_n"] in (8, 9, 17)


@pytest.mark.parametrize("name", ["mm", "mil", "kfold", "vision", "progressive"])
def test_mesh_step_contains_all_reduce(worker_result, name):
    assert worker_result[f"{name}_has_all_reduce"], (
        f"{name} mesh train step compiled without an all-reduce — "
        "gradients are not being aggregated across devices"
    )


def test_dryrun_spawn_smoke():
    """dryrun_multichip's spawn path with a 2-device mesh and the tiny
    backbone (cheap): the driver-checked gate must work from an arbitrary
    caller environment."""
    from mmtrs_tpu.parallel.dryrun import spawn

    spawn(2, model_name="test_cnn")


def test_single_device_mesh_paths():
    """mesh helpers work in-process on whatever platform the suite runs on
    (1-device mesh): shard_batch/replicate/data_parallel_jit round-trip."""
    import jax
    import jax.numpy as jnp

    from mmtrs_tpu.parallel.mesh import (
        data_parallel_jit,
        make_mesh,
        replicate,
        shard_batch,
    )

    mesh = make_mesh(1)
    batch = shard_batch(mesh, {"x": np.arange(8.0, dtype=np.float32)})
    w = replicate(mesh, jnp.ones(()))

    def step(state, b):
        g = jnp.mean(b["x"]) * state
        return state - 0.1 * g, {"loss": g}

    f = data_parallel_jit(step, mesh, donate_state=False)
    new_w, m = f(w, batch)
    assert np.isfinite(float(m["loss"]))
    assert new_w.shape == ()
