#!/bin/bash
# Round-4 TPU battery, part 6: literal-formulation inversion steps under the
# HBM plan. Battery-5's per-program XLA memory plans said the literal grad
# programs want ~11-12 GB temp + 1.1-1.9 GB full-tree grad out; the plan is
# (a) grads over the trainable subtree only (kills the full-param-size live
# buffer between the two grad programs), then (b) staged remat ONLY IF the
# subtree split alone still exhausts — remat costs a recompute, so the
# cheaper fix is preferred evidence.
cd /root/repo

has_err () {  # has_err <config_key> — 1 if the config recorded any error
  python - "$1" <<'EOF'
import json, sys
try:
    cfg = json.load(open("docs/train_tpu_run.json"))["configs"].get(sys.argv[1], {})
except Exception:
    sys.exit(0)
err = any(k.endswith("error") or k == "error" for k in cfg)
ok = cfg.get("finite_losses") and cfg.get("losses") and not err
sys.exit(0 if not ok else 1)
EOF
}

echo "=== e4e literal (encoder-subtree grads, no remat) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_e4el timeout 4800 python scripts/validate_train_tpu.py e4e-subtree > /tmp/r4g_e4e.log 2>&1; echo "e4e RC=$?"
if has_err e4e_B1_subtree; then
  echo "=== e4e literal + staged remat (subtree split insufficient) ==="
  JAX_COMPILATION_CACHE_DIR=/tmp/jc_e4er timeout 4800 python scripts/validate_train_tpu.py e4e-remat > /tmp/r4g_e4eremat.log 2>&1; echo "e4eremat RC=$?"
else
  echo "e4e literal fits with subtree grads alone; skipping remat run"
fi

echo "=== oneshot literal (unet-subtree grads, no remat) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_osl timeout 4800 python scripts/validate_train_tpu.py oneshot-subtree > /tmp/r4g_oneshot.log 2>&1; echo "oneshot RC=$?"
if has_err oneshot_B1_subtree; then
  echo "=== oneshot literal + staged remat ==="
  JAX_COMPILATION_CACHE_DIR=/tmp/jc_osr timeout 4800 python scripts/validate_train_tpu.py oneshot-remat > /tmp/r4g_oneshotremat.log 2>&1; echo "oneshotremat RC=$?"
else
  echo "oneshot literal fits with subtree grads alone; skipping remat run"
fi

echo "=== headline bench (mxu_util ledger) ==="
timeout 2400 python bench.py > /tmp/r4g_bench.log 2>&1; echo "bench RC=$?"
echo "=== online frame anatomy ==="
timeout 3600 python scripts/profile_online.py > /tmp/r4g_online.log 2>&1; echo "online RC=$?"
echo "battery6 done"
