#!/bin/bash
# Counterpart of the reference's infer.sh: the three inference entry points.
set -e

NETWORK_GAN=${NETWORK_GAN:-pretrained/ani3dgan512.pkl}
NETWORK_FS=${NETWORK_FS:-pretrained/FSInvertAvatar.pkl}
NETWORK_OS=${NETWORK_OS:-pretrained/updatedOSInvertAvatar.pkl}
DRIVE=${DRIVE:-data/obama}
SOURCE=${SOURCE:-data/source}

# seed-avatar reenactment grid (reenact_avatar_next3d equivalent)
python -m invertavatar_tpu.cli.reenact \
  --network "$NETWORK_GAN" --drive_root "$DRIVE" --seeds 100-108 --grid 5x2 --outdir out

# few-shot incremental inversion + reenactment (eval_seq equivalent)
python -m invertavatar_tpu.cli.eval_seq \
  --network "$NETWORK_FS" --source_root "$SOURCE" --drive_root "$DRIVE" --outdir out

# one-shot inversion + reenactment (+ orbit) (eval_updated_os equivalent)
python -m invertavatar_tpu.cli.eval_os \
  --network "$NETWORK_OS" \
  --source_image "$SOURCE/images512x512/vid/00000000.png" \
  --source_camera "$SOURCE/cam0.npy" \
  --source_uv "$SOURCE/uvRender256x256/vid/00000000" \
  --source_uvcoords "$SOURCE/orthRender256x256_face_eye/vid/00000000.npy" \
  --drive_root "$DRIVE" --orbit_frames 120 --outdir out
