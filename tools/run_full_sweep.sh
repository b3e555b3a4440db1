#!/usr/bin/env bash
# FULL conformance sweep: every registered env id, jitted, plus the
# FULL-gated heavy suites (Bimanual/TableTennis compiles, myodm playback,
# slow tutorials). Mirrors the reference's whole-registry sweep
# (/root/reference/myosuite/tests/test_myo.py:19-48).
#
# Writes docs/FULL_SWEEP_<tag>.md with the outcome. Run in the
# background; hours of wall-clock on a CPU box are expected (every env's
# reset/step graph is XLA-compiled).
#
# Usage: tools/run_full_sweep.sh [tag]
set -u
TAG="${1:-r5}"
cd "$(dirname "$0")/.."
LOG="/tmp/full_sweep_${TAG}.log"
START=$(date -u +"%Y-%m-%dT%H:%M:%SZ")
T0=$(date +%s)
MTX_TEST=FULL timeout 28800 python -m pytest tests/ -q --durations=40 \
  -p no:cacheprovider > "$LOG" 2>&1
CODE=$?
T1=$(date +%s)
SUMMARY=$(grep -E "^[0-9]+ (passed|failed)|passed|failed|error" "$LOG" | tail -1)
N_ENVS=$(python -c "
import os
os.environ['JAX_PLATFORMS']='cpu'
from myosuite_tpu.envs import registry
print(len(registry.registered_envs()))" 2>/dev/null)
{
  echo "# FULL conformance sweep record (${TAG})"
  echo
  echo "- started: ${START}"
  echo "- wall clock: $(( (T1 - T0) / 60 )) min"
  echo "- exit code: ${CODE} (0 = all green; 124 = 8 h timeout)"
  echo "- registered env ids swept: ${N_ENVS}"
  echo "- host: $(nproc) CPUs, MTX_TEST=FULL (jitted paths everywhere)"
  echo "- result: ${SUMMARY}"
  echo
  echo "## Slowest tests"
  echo
  echo '```'
  grep -A 45 "slowest .* durations" "$LOG" | head -45
  echo '```'
  echo
  echo "## Tail of the log"
  echo
  echo '```'
  tail -25 "$LOG"
  echo '```'
} > "docs/FULL_SWEEP_${TAG}.md"
echo "record: docs/FULL_SWEEP_${TAG}.md (exit ${CODE})"
