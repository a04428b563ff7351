#!/bin/bash
# Round-3 follow-on battery: waits for the few-shot TPU validation process to
# release the chip, then refreshes every artifact invalidated by adopting the
# 128x4 rectangular kernel tiles (flagship.py tile_shape), in priority order:
#   1. bench.py            -> docs/bench_r3_headline.log (was measured pre-adoption)
#   2. bench_extra online  -> docs/BENCH_EXTRA.json (28.59 fps figure pre-adoption)
#   3. bench_extra batch10 -> docs/BENCH_EXTRA.json
#   4. fidelity v2         -> docs/fidelity_flagship.json (MS-SSIM, N=16, rect_128x4)
# Usage: nohup bash scripts/r3_chain.sh <pid-to-wait-for> > /tmp/r3_chain.log 2>&1 &
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

step bench 2400 python bench.py && cp /tmp/r3_bench.log docs/bench_r3_headline.log
step bench_online 2400 python bench_extra.py online
step bench_batch10 2400 python bench_extra.py batch10
step fidelity 10800 python scripts/fidelity_flagship.py
step rect_tiles 3600 python scripts/profile_rect_tiles.py
echo "=== chain complete $(date +%H:%M:%S)"
