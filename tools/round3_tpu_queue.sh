#!/bin/bash
# Round-3 TPU work queue: run every hardware-gated artifact in priority
# order once the axon tunnel is reachable.  Each step is independently
# timeout-guarded and appends to /tmp/r3_queue.log; artifacts land in the
# repo root (BENCH preview, BIGREF_r03.json, DENOVO_r03.json, GENERIC
# sample) for commit.
#
# Usage: bash tools/round3_tpu_queue.sh [step...]   (default: all steps)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
LOG=/tmp/r3_queue.log
steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(smoke bench generic scatter rec8ab bigref01 bigref denovo bigref_w3 ktune)

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  return $rc
}

for s in "${steps[@]}"; do
  case $s in
    smoke)
      # log loudly but keep going on failure: bench.py re-runs the smoke
      # gate itself (and emits smoke:fail), so a harness bug in the
      # higher-level smoke checks must not starve every other artifact
      run smoke 3600 python "$REPO/tools/tpu_smoke.py" \
          || echo "WARNING: smoke failed; continuing" | tee -a "$LOG" ;;
    bench)
      run bench 3600 python "$REPO/bench.py" ;;
    generic)
      # generic-scoring (open > extend) sample on the Pallas path
      run generic 3600 python "$REPO/tools/bench_generic.py" ;;
    scatter)
      # csr-build op throughput (scatter-add/set, big cumsum): tells us
      # early whether bigref_w3's build will be bound by a slow scatter
      run scatter 1800 python "$REPO/tools/scatter_probe.py" ;;
    rec8ab)
      # record-packing width A/B: the e2e effect of shrinking the
      # extension loop's result fetch 2x/4x (the steady-state tunnel bound)
      run rec16 3600 env DARWIN_TPU_RECBITS=16 python "$REPO/tools/bench_e2e.py"
      run rec8  3600 env DARWIN_TPU_RECBITS=8  python "$REPO/tools/bench_e2e.py"
      run rec4  3600 env DARWIN_TPU_RECBITS=4  python "$REPO/tools/bench_e2e.py" ;;
    bigref01)
      # small-genome reference point on the same hardware: per-base build
      # rate + per-read stage profile to compare the 3.2 Gbp run against
      # (VERDICT #2/#3 done criteria); also warms the compile cache
      run bigref01 7000 python "$REPO/tools/bigref_e2e.py" --allow-small \
          --gbp 0.1 --reads 128 --batch 128 \
          --out "$REPO/BIGREF01_r03.json" ;;
    bigref)
      run bigref 14000 python "$REPO/tools/bigref_e2e.py" ;;
    denovo)
      run denovo 14000 python "$REPO/tools/denovo_e2e.py" \
          --check-subsample 500 ;;
    bigref_w3)
      # the DEFAULT minimizer window (w=3) at 3.2 Gbp on ONE chip — the
      # csr layout halves table HBM (~6.4 GB positions + 1 GB offsets
      # beside the 3.2 GB genome); round 2 had no single-chip story here
      run bigref_w3 18000 python "$REPO/tools/bigref_e2e.py" \
          --window 3 --layout csr --out "$REPO/BIGREF_W3_r03.json" ;;
    ktune)
      # optional: with 8-bit records the fetch per K halves, so the
      # optimal speculative chain depth may sit above 12
      run k16 3600 env DARWIN_TPU_SPEC_K=16 python "$REPO/tools/bench_e2e.py"
      run k24 3600 env DARWIN_TPU_SPEC_K=24 python "$REPO/tools/bench_e2e.py" ;;
  esac
done
echo "QUEUE DONE" | tee -a "$LOG"
