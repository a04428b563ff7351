#!/bin/bash
# Round-4 TPU battery, part 7: the literal one-shot step under the
# prefix-split HBM plan. Battery-6 showed subtree grads AND staged remat both
# leave the literal grad_igen plan at ~17 GB (> 16 GB v5e HBM): the 12 GB
# temp is the stop-grad e4e PREFIX render's forward working set — not a grad
# buffer (subtree can't touch it), not a residual (remat can't either). The
# prefix-split runs that prefix as its own program (InversionNet.prefix),
# removing its working set AND the 0.78 GB encoder param set from the grad
# program. CPU parity: test_oneshot_grad_programs_prefix_split_parity.
cd /root/repo

echo "=== oneshot literal (prefix split + unet-subtree grads) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_osp timeout 4800 python scripts/validate_train_tpu.py oneshot-prefix > /tmp/r4h_oneshot_prefix.log 2>&1; echo "oneshot-prefix RC=$?"
echo "battery7 done"
