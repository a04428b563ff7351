"""invertavatar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) animatable 3D head-avatar
framework with the capabilities of XChenZ/invertAvatar.

Layer map (mirrors SURVEY.md):
  ops/      — XLA/Pallas compute primitives (upfirdn2d, bias_act, grid_sample, ...)
  models/   — StyleGAN2 module library, tri-plane generator, inversion encoders
  render/   — ray sampling, importance volume rendering, mouth fill
  faceverse/— FaceVerse 3DMM motion driver + TPU mesh rasterizer
  data/     — dataset readers for the preprocessed-dataset contract
  train/    — GAN + inversion training loops (pjit data-parallel)
  parallel/ — mesh / sharding helpers
  utils/    — config tree, checkpoint import, stats, misc
"""

__version__ = "0.1.0"

# Persistent XLA compile cache: the axon sitecustomize imports jax at
# interpreter start, BEFORE any user code can export JAX_COMPILATION_CACHE_DIR
# — so the env var alone is silently ignored (jax reads it at import time) and
# every bench/test/validation was paying full recompiles. Apply it explicitly;
# callers opt in by setting the env var (bench.py, tests/conftest.py, scripts).
import os as _os  # noqa: E402

_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir:
    import jax as _jax  # noqa: E402

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
