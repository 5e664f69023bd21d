"""Test harness configuration.

Platform policy (round 4): the suite is hermetic CPU by DEFAULT — 8 virtual
devices for the multi-chip sharding paths — regardless of the ambient
JAX_PLATFORMS. Opt into the real TPU with MMTRS_TEST_TPU=1 (what
scripts/tpu_return_runbook.sh does for tests/test_pallas_tpu.py); that
activates the TPU-only Pallas bit-exactness tests and the platform-aware
tolerances in the shared tests.

Why forcing is needed: the axon sitecustomize calls axon.register()
at interpreter startup whenever PALLAS_AXON_POOL_IPS is set, and after
that registration the env-var route (JAX_PLATFORMS=cpu, popping the pool
var — the round-3 mechanism) no longer reaches CPU: `JAX_PLATFORMS=cpu
python -c "print(jax.devices())"` reports tpu on this box (re-verified
round 4). `jax.config.update("jax_platforms", "cpu")` after import DOES
win, so that is the pin. Without it the ambient suite lands on the remote
TPU where every fresh program is a multi-minute remote compile — a full
suite run would take hours and once triggered a 12 h tunnel outage
(NOTES_ROUND4.md).
"""

import os

_WANT_TPU = os.environ.get("MMTRS_TEST_TPU", "") == "1"
if not _WANT_TPU:
    _ambient = os.environ.get("JAX_PLATFORMS", "")
    if _ambient and _ambient != "cpu":
        import sys

        print(
            f"[mmtrs conftest] overriding JAX_PLATFORMS={_ambient!r} -> cpu "
            "(suite is hermetic-CPU by default; set MMTRS_TEST_TPU=1 to run "
            "on the real device)",
            file=sys.stderr,
        )
    os.environ["JAX_PLATFORMS"] = "cpu"
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

import jax  # noqa: E402

if not _WANT_TPU:
    # the env route is dead once sitecustomize's register() has run (see
    # module docstring); the config route wins even after registration
    jax.config.update("jax_platforms", "cpu")

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
