#!/bin/bash
# Round-5 TPU measurement runbook. Same sequential one-JAX-process-at-a-time
# discipline as scripts/tpu_return_runbook.sh (see that file + the verify
# skill for the outage history); rc capture fixed round 5 — each step logs
# ITS OWN exit status (PIPESTATUS[0] + pipefail), closing the r4 bug where
# every step logged tee's rc=0.
#
# Usage:  bash scripts/tpu_runbook_r5.sh                # all steps
#         bash scripts/tpu_runbook_r5.sh bench          # single step
#         bash scripts/tpu_runbook_r5.sh probe pallas … # any subset
set -u -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
LOG=reports/tpu_runbook_r5.log
mkdir -p reports
ONLY="$*"

run() {
  local name="$1"; shift
  echo "=== [$name] start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] rc=$rc end $(date -u +%FT%TZ) ===" | tee -a "$LOG"
  return $rc
}

want() {
  [ -z "$ONLY" ] && return 0
  case " $ONLY " in *" $1 "*) return 0 ;; esac
  return 1
}

# 0. recovery probe — cheap, fails fast if the tunnel is dead
if want probe; then
  run probe timeout 300 python -c "import jax,numpy,jax.numpy as jnp; print(float(numpy.asarray(jnp.sum(jnp.ones((4,4))))))" || exit 1
fi

# 1. on-chip Pallas exactness suite (incl. the round-5 planar-chain parity
#    tests) — the durable green record the r4 log lacked
want pallas && run pytest_pallas env MMTRS_TEST_TPU=1 timeout 7200 python -m pytest tests/test_pallas_tpu.py tests/test_cv2_goldens.py -q

# 2. full-attribution perf harness (prefix-marginal; sums == chain total)
want perf && run perf_check_r5 timeout 7200 python scripts/perf_check_r5.py

# 3. headline bench
want bench && run bench_b512 env MMTRS_BENCH_BATCH=512 timeout 3600 python bench.py
want bench && run bench_b128 env MMTRS_BENCH_BATCH=128 timeout 3600 python bench.py

# 4. detector: stage attribution, then the b16 resolution ladder
want detector && run detector_attr timeout 7200 python scripts/perf_detector_r5.py 16
want detector && run detector_sweep timeout 10800 python scripts/bench_detector.py --sweep

# 5. serving latency: flagship fold checkpoints when the rehearsal saved
#    them, architecture-only otherwise
if want serve; then
  if [ -d results/rehearsal_r5/mm ] && ls results/rehearsal_r5/mm/mm_dualtask_fold*.recipe.json >/dev/null 2>&1; then
    run serve_flagship timeout 7200 python scripts/bench_serve.py --flagship results/rehearsal_r5
  else
    run serve timeout 3600 python scripts/bench_serve.py
  fi
fi

echo "runbook done $(date -u +%FT%TZ)" | tee -a "$LOG"
