#!/bin/bash
# Round-4 TPU evidence battery (serialized; one TPU + 1-core host).
cd /root/repo
echo "=== e4e (split programs) ===" 
timeout 4800 python scripts/validate_train_tpu.py e4e > /tmp/r4c_e4e.log 2>&1; echo "e4e RC=$?"
echo "=== oneshot (retry) ==="
timeout 4800 python scripts/validate_train_tpu.py oneshot > /tmp/r4c_oneshot.log 2>&1; echo "oneshot RC=$?"
echo "=== fewshot multiT T=12 (lazy targets) ==="
timeout 5400 python scripts/validate_fewshot_tpu.py --multiT-only > /tmp/r4c_multiT.log 2>&1; echo "multiT RC=$?"
echo "=== GAN step ==="
timeout 5400 python scripts/validate_gan_tpu.py all > /tmp/r4c_gan.log 2>&1; echo "gan RC=$?"
echo "=== train grad profile ==="
timeout 3600 python scripts/profile_train_grad.py > /tmp/r4c_gradprof.log 2>&1; echo "gradprof RC=$?"
echo "battery done"
