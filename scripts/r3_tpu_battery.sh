#!/bin/bash
# Round-3 TPU evidence battery. Runs every measurement that needs the real
# chip, in VERDICT-priority order, each step time-boxed and logged. Safe to
# re-run: every step overwrites its own artifact. Intended to be launched in
# the background the moment the axon relay comes back up:
#   nohup bash scripts/r3_tpu_battery.sh > /tmp/r3_battery.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p docs

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] start $(date +%H:%M:%S) (timeout ${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] done rc=$rc $(date +%H:%M:%S)"
  tail -5 "/tmp/r3_${name}.log" | sed 's/^/    /'
  return $rc
}

# 0. relay sanity — bail early if the TPU is still down
step probe 180 python -c "import jax; print(jax.devices())" || { echo "TPU DOWN — aborting battery"; exit 1; }

# 1. VERDICT #1/#8: recorded few-shot training step on the real chip
#    (writes docs/fewshot_tpu_run.json)
step fewshot_tpu 5400 python scripts/validate_fewshot_tpu.py

# 2. headline bench — confirm the 32.7 fps figure still stands
step bench 3000 python bench.py
cp /tmp/r3_bench.log docs/bench_r3_headline.log

# 3. VERDICT #3: the four remaining BASELINE configs
#    (writes docs/BENCH_EXTRA.json)
step bench_extra 7200 python bench_extra.py all

# 3b. VERDICT #4 candidate: rectangular kernel tiles (lane-width lever)
#     (writes docs/rect_tiles.json)
step rect_tiles 5400 python scripts/profile_rect_tiles.py

# 4. VERDICT #5: fidelity harness v2 (MS-SSIM gate, N=16 FaceVerse-driven
#    frames; torch oracle on CPU + shipped kernels on TPU)
#    (writes docs/fidelity_flagship.json)
step fidelity 10800 python scripts/fidelity_flagship.py

echo "=== battery complete $(date +%H:%M:%S)"
