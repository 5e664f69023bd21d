"""Test harness configuration.

Platform policy: `setdefault` — when the ambient environment pins a platform
(this machine exports JAX_PLATFORMS=axon → the real TPU), the suite runs
there, which additionally activates the TPU-only Pallas bit-exactness tests
(test_pallas_tpu.py). With no ambient platform the suite is hermetic
CPU-only with 8 virtual devices for the multi-chip sharding paths. Env
mutation happens at import time, before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon sitecustomize (keyed on PALLAS_AXON_POOL_IPS) force-initializes
# the TPU platform EVEN when JAX_PLATFORMS=cpu — verified round 3:
# `JAX_PLATFORMS=cpu python -c "print(jax.devices())"` reports tpu on this
# box. A cpu pin is only honest if the pool var is gone too.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache — XLA CPU compiles dominate test wall-time on
# this 1-vCPU machine; the cache makes re-runs near-instant
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mmtrs_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    import pathlib

    p = pathlib.Path(REFERENCE_ROOT)
    if not p.exists():
        pytest.skip("reference artifacts not mounted")
    return p


@pytest.fixture
def rng():
    return np.random.default_rng(0)
