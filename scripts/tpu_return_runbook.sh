#!/bin/bash
# One-shot measurement runbook for when the axon tunnel returns after an
# outage (round 4: the tunnel refused device claims for hours after a
# mid-compile kill — see .claude/skills/verify/SKILL.md).
#
# Runs the pending TPU measurements SEQUENTIALLY (1 vCPU; never two JAX
# processes compiling at once), letting every compile run to completion.
# Each step appends to reports/tpu_runbook_r4.log; partial progress is
# preserved if the tunnel drops mid-way.
#
# Usage:  bash scripts/tpu_return_runbook.sh          # all steps
#         bash scripts/tpu_return_runbook.sh bench    # single step
set -u -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
LOG=reports/tpu_runbook_r4.log
mkdir -p reports
ONLY="${1:-}"

run() {
  local name="$1"; shift
  echo "=== [$name] start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  # pipefail is on, but capture the command's own status explicitly so a
  # tee hiccup can never mask a step failure (round-4 bug: rc was tee's).
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] rc=$rc end $(date -u +%FT%TZ) ===" | tee -a "$LOG"
  return $rc
}

want() { [ -z "$ONLY" ] || [ "$ONLY" = "$1" ]; }

# 0. recovery probe — cheap, fails fast if the tunnel is still dead
if want probe; then
  run probe timeout 300 python -c "import jax,numpy,jax.numpy as jnp; print(float(numpy.asarray(jnp.sum(jnp.ones((4,4))))))" || exit 1
fi

# 1. exactness + stage timings for every round-4 fused kernel (the
#    interpret-mode parity tests do not enforce Mosaic lowering rules)
want perf && run perf_check_r4 timeout 3600 python scripts/perf_check_r4.py

# 2. on-chip Pallas bit-exactness suite (MMTRS_TEST_TPU=1 opts the conftest
#    out of its hermetic-CPU pin — round 4 made CPU the pytest default)
want pallas && run pytest_pallas env MMTRS_TEST_TPU=1 timeout 5400 python -m pytest tests/test_pallas_tpu.py tests/test_cv2_goldens.py -q

# 3. headline bench (b128 default, then larger batches — the fused warp
#    no longer materializes [B,512,512] interp matrices, so the r3 b256
#    OOM cause is gone)
want bench && run bench timeout 3600 python bench.py
want bench && run bench_b256 env MMTRS_BENCH_BATCH=256 timeout 3600 python bench.py
want bench && run bench_b512 env MMTRS_BENCH_BATCH=512 timeout 3600 python bench.py

# 4. learned-detector sweep: bf16 x resolution x batch
want detector && run detector timeout 5400 python scripts/bench_detector.py --sweep

# 5. serving latency p50/p95 on-chip
want serve && run serve timeout 3600 python scripts/bench_serve.py

echo "runbook done $(date -u +%FT%TZ)" | tee -a "$LOG"
