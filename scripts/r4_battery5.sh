#!/bin/bash
# Round-4 TPU battery, part 5: instrumented e4e reruns + perf profilers.
#  * e4e: per-program AOT compile with XLA memory analysis — r4e's fresh-dir
#    rerun still RESOURCE_EXHAUSTED, so the cache theory is dead; this run
#    records WHICH program OOMs and what its compile-time memory plan says.
#  * e4e-fast: the structured fast-path config as the documented-deviation
#    fallback if the literal formulation is HBM-marginal.
#  * raster_visibility: are the sub-oracle raster variants' dropped faces
#    visible in the 256^2 uvcoords driving signal? (gates anchor_fpt512 for
#    the online loop)
#  * rect tiles: measure the 128x8 / 256x4 candidates added after the r3 run.
cd /root/repo
echo "=== e4e (per-program AOT + memory analysis) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_e4e2 timeout 4800 python scripts/validate_train_tpu.py e4e > /tmp/r4f_e4e.log 2>&1; echo "e4e RC=$?"
echo "=== e4e structured fast paths ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_e4ef timeout 4800 python scripts/validate_train_tpu.py e4e-fast > /tmp/r4f_e4efast.log 2>&1; echo "e4efast RC=$?"
echo "=== oneshot (per-program AOT + memory analysis) ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_os2 timeout 4800 python scripts/validate_train_tpu.py oneshot > /tmp/r4f_oneshot.log 2>&1; echo "oneshot RC=$?"
echo "=== oneshot structured fast paths ==="
JAX_COMPILATION_CACHE_DIR=/tmp/jc_osf timeout 4800 python scripts/validate_train_tpu.py oneshot-fast > /tmp/r4f_oneshotfast.log 2>&1; echo "oneshotfast RC=$?"
echo "=== raster visibility ==="
timeout 2400 python scripts/raster_visibility.py > /tmp/r4f_rastervis.log 2>&1; echo "rastervis RC=$?"
echo "=== rect tiles (adds 128x8, 256x4) ==="
timeout 3600 python scripts/profile_rect_tiles.py > /tmp/r4f_recttiles.log 2>&1; echo "recttiles RC=$?"
echo "battery5 done"
