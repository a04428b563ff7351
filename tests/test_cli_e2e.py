"""End-to-end CLI smoke: reference-pickled generator + synthetic drive data
-> reenact CLI -> mp4 on disk."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from tests.oracle_utils import stub_reference_modules

stub_reference_modules()

import torch  # noqa: E402

from tests.test_triplane_parity import CFG, RENDER_KWARGS, SMALL, _camera, _uvcoords  # noqa: E402


def test_reenact_cli(tmp_path):
    pytest.importorskip("imageio")
    torch.manual_seed(0)
    from training_avatar_texture.triplane_v20 import TriPlaneGenerator as RefG

    g_t = RefG(**CFG, sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
               rendering_kwargs=dict(RENDER_KWARGS), **SMALL)
    g_t.neural_rendering_resolution = 64
    pkl = tmp_path / "gan.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"G_ema": g_t}, f)

    # synthetic drive data layout
    drive = tmp_path / "drive"
    img_dir = drive / "images512x512"
    mesh_dir = drive / "orthRender256x256_face_eye"
    img_dir.mkdir(parents=True)
    mesh_dir.mkdir(parents=True)
    labels = {}
    uvc = _uvcoords(1)[0]
    for i in range(3):
        fname = f"{i:08d}.png"
        labels[fname] = _camera(1)[0].tolist()
        np.save(mesh_dir / f"{i:08d}.npy", uvc.astype(np.float16))
    with open(img_dir / "dataset_realcam.json", "w") as f:
        json.dump({"labels": labels}, f)

    from invertavatar_tpu.cli.reenact import main

    main([
        "--network", str(pkl),
        "--drive_root", str(drive),
        "--seeds", "1,2",
        "--outdir", str(tmp_path / "out"),
        "--max_frames", "2",
    ])
    vids = [f for f in os.listdir(tmp_path / "out") if f.endswith(".mp4")]
    assert vids, "reenact CLI produced no video"
    assert os.path.getsize(tmp_path / "out" / vids[0]) > 1000


def test_train_gan_cli_dry_run(capsys):
    from invertavatar_tpu.cli.train_gan import main

    main(["--outdir", "/tmp/x", "--data", "/tmp/y", "--dry-run", "--gen_pose_cond"])
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert cfg["rendering_kwargs"]["c_gen_conditioning_zero"] is False
    assert float(cfg["rendering_kwargs"]["gpc_reg_prob"]) == 0.5
