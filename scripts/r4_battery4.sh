#!/bin/bash
# Round-4 TPU evidence battery, part 4: retries with the structural fixes.
#  * e4e: fresh compile-cache dir — the r4d run died on RESOURCE_EXHAUSTED
#    the moment the persistent cache HIT (same failure signature as the r3
#    "died reading the compile cache" run); a fresh dir forces a clean
#    compile, which is the configuration that succeeded (385 s).
#  * oneshot: per-phase split programs (the monolith killed the compile
#    helper twice).
#  * GAN: training-formulation rendering kwargs (eval Pallas options caused
#    NotImplementedError under grad).
#  * fewshot fast configs: measure the structured fast-path step.
cd /root/repo
echo "=== HBM probe ==="
timeout 600 python -c "
import jax
d = jax.devices()[0]
print('backend', d.platform, d.device_kind)
print('memory_stats:', d.memory_stats())
" > /tmp/r4e_probe.log 2>&1; echo "probe RC=$?"
echo "=== e4e (fresh cache dir) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_e4e timeout 4800 python scripts/validate_train_tpu.py e4e > /tmp/r4e_e4e.log 2>&1; echo "e4e RC=$?"
echo "=== oneshot (split programs, fresh cache dir) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_oneshot timeout 4800 python scripts/validate_train_tpu.py oneshot > /tmp/r4e_oneshot.log 2>&1; echo "oneshot RC=$?"
echo "=== GAN (training formulation) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_gan timeout 5400 python scripts/validate_gan_tpu.py all > /tmp/r4e_gan.log 2>&1; echo "gan RC=$?"
echo "=== fewshot fast T=4 ==="
timeout 5400 python scripts/validate_fewshot_tpu.py --fast-only > /tmp/r4e_fast.log 2>&1; echo "fast RC=$?"
echo "=== fewshot fast multiT T=12 ==="
timeout 5400 python scripts/validate_fewshot_tpu.py --multiT-fast > /tmp/r4e_multiTfast.log 2>&1; echo "multiTfast RC=$?"
echo "battery4 done"
