#!/bin/bash
# Round-4 TPU evidence battery, part 3 (serialized; one TPU + 1-core host).
# Order: train-step evidence first (VERDICT #1/#6), then the bench_extra
# latency reruns (#5), then the profilers behind the batch-10/online
# analyses (#3/#4).
cd /root/repo
echo "=== e4e (incremental loss recording) ==="
timeout 4800 python scripts/validate_train_tpu.py e4e > /tmp/r4d_e4e.log 2>&1; echo "e4e RC=$?"
echo "=== oneshot (retry after compile-helper 500) ==="
timeout 4800 python scripts/validate_train_tpu.py oneshot > /tmp/r4d_oneshot.log 2>&1; echo "oneshot RC=$?"
echo "=== fewshot multiT T=12 (lazy Igen targets) ==="
timeout 5400 python scripts/validate_fewshot_tpu.py --multiT-only > /tmp/r4d_multiT.log 2>&1; echo "multiT RC=$?"
echo "=== GAN step ==="
timeout 5400 python scripts/validate_gan_tpu.py all > /tmp/r4d_gan.log 2>&1; echo "gan RC=$?"
echo "=== bench_extra fewshot+oneshot (vs_baseline fill) ==="
timeout 2400 python bench_extra.py fewshot > /tmp/r4d_bx_fewshot.log 2>&1; echo "bx_fewshot RC=$?"
timeout 2400 python bench_extra.py oneshot > /tmp/r4d_bx_oneshot.log 2>&1; echo "bx_oneshot RC=$?"
echo "=== batch scaling profile ==="
timeout 3600 python scripts/profile_batch_scaling.py > /tmp/r4d_batchscale.log 2>&1; echo "batchscale RC=$?"
echo "=== raster variants profile ==="
timeout 3600 python scripts/profile_raster_r4.py > /tmp/r4d_raster.log 2>&1; echo "raster RC=$?"
echo "battery3 done"
echo "=== train grad profile ==="
timeout 3600 python scripts/profile_train_grad.py > /tmp/r4d_gradprof.log 2>&1; echo "gradprof RC=$?"
echo "battery3+gradprof done"
