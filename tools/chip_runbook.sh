#!/usr/bin/env bash
# One-command on-chip validation + measurement sequence, for when the
# axon TPU tunnel comes back after an outage. Runs, in order:
#   1. tools/tpu_numerics_probe.py  — bit-exactness of the MXU paths
#   2. the chip-gated perf smoke    — per-kernel ms budgets
#   3. BENCH_PROFILE=1 bench.py     — per-stage breakdown (stderr)
#   4. bench.py                     — the headline fps JSON line
# Each stage logs to $OUT (default /tmp/chip_runbook.<ts>).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/chip_runbook.$(date +%s)}
mkdir -p "$OUT"
echo "logging to $OUT"

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout "${STAGE_TIMEOUT:-1200}" "$@" >"$OUT/$name.log" 2>&1
    rc=$?
    tail -20 "$OUT/$name.log"
    echo "=== $name: exit $rc ==="
    return $rc
}

# quick tunnel probe first (fail fast if still wedged)
timeout 90 python -c "import jax; print(jax.devices())" || {
    echo "tunnel still wedged"; exit 1; }

run numerics python tools/tpu_numerics_probe.py || exit 1
run perfsmoke env X264_TEST_ON_TPU=1 python -m pytest -q -n 0 \
    tests/test_perf_smoke.py
run profile env BENCH_PROFILE=1 BENCH_STREAMS=4 python bench.py
run bench python bench.py
echo "runbook complete — logs in $OUT"
