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
