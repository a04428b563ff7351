#!/bin/bash
# Round-3 session-2 battery: runs after the first chain's bench/online/batch10.
#   1. few-shot TPU validation rerun (memory-lean, per-phase error capture —
#      the first run OOMed Igen with 3 param sets live) -> docs/fewshot_tpu_run.json
#   2. bench.py            -> docs/bench_r3_headline.log (boolean fill_mouth landed)
#   3. bench_extra online  -> docs/BENCH_EXTRA.json (anchor raster binning landed)
#   4. fidelity v2         -> docs/fidelity_flagship.json (MS-SSIM, N=16)
#   5. raster profile      -> docs/raster_profile.json (anchor vs sort binning)
# Usage: nohup bash scripts/r3_chain2.sh <pid-to-wait-for> > /tmp/r3_chain2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting on pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
  echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
fi

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] start $(date +%H:%M:%S) (timeout ${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] done rc=$rc $(date +%H:%M:%S)"
  tail -3 "/tmp/r3_${name}.log" | sed 's/^/    /'
  return $rc
}

step fewshot_tpu2 4200 python scripts/validate_fewshot_tpu.py
step bench2 2400 python bench.py && cp /tmp/r3_bench2.log docs/bench_r3_headline.log
step bench_online2 2400 python bench_extra.py online
step fidelity 9000 python scripts/fidelity_flagship.py
step raster2 2400 python scripts/profile_raster.py
echo "=== chain2 complete $(date +%H:%M:%S)"
