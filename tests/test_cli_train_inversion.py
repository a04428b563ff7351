"""Driver-launched few-shot training through the CLI path (VERDICT r2 #7).

The reference's Igen phase (video_loss.py:373-425) runs whenever training is
launched — the TPU counterpart gates it on `z` in the batch, so this test
asserts the CLI's clip iterator supplies it end-to-end: a tiny ref-pickled
generator + synthetic video-dataset layout → `cli/train_inversion.py
--training_state fewshot` for 2 steps → Igen/* AND Ireal/* losses appear in
stats.jsonl (the reference's `G_Loss/gen/*` vs `G_Loss/real/*` split).
"""

import json
import os
import pickle
import sys

import numpy as np
import PIL.Image
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted"),
]

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from tests.oracle_utils import stub_reference_modules  # noqa: E402

stub_reference_modules()

from tests.test_triplane_parity import CFG, RENDER_KWARGS, SMALL, _camera, _uvcoords  # noqa: E402


def _make_layout(tmp_path, n_vids=2, n_frames=3):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images512x512"
    mesh_dir = tmp_path / "orthRender256x256_face_eye"
    uv_dir = tmp_path / "uvRender256x256"
    labels = {}
    uvc = _uvcoords(1)[0]
    for vid in [f"vid{k}" for k in range(n_vids)]:
        for d in (img_dir, mesh_dir, uv_dir):
            (d / vid).mkdir(parents=True, exist_ok=True)
        for i in range(n_frames):
            fname = f"{vid}/{i:08d}.png"
            PIL.Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(img_dir / fname)
            np.save(mesh_dir / f"{vid}/{i:08d}.npy", uvc.astype(np.float16))
            np.save(uv_dir / f"{vid}/{i:08d}.npy", rng.rand(256, 256, 3).astype(np.float32))
            PIL.Image.fromarray(rng.randint(0, 255, (256, 256, 3), np.uint8)).save(
                uv_dir / f"{vid}/{i:08d}_uvgttex.png"
            )
            labels[fname] = _camera(1)[0].tolist()
    with open(img_dir / "dataset_realcam.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(img_dir)


def _ref_pkl(tmp_path):
    import torch

    torch.manual_seed(0)
    from training_avatar_texture.triplane_v20 import TriPlaneGenerator as RefG

    g_t = RefG(**CFG, sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
               rendering_kwargs=dict(RENDER_KWARGS), **SMALL)
    g_t.neural_rendering_resolution = 32
    pkl = tmp_path / "gan.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"G_ema": g_t}, f)
    return pkl


def _stats_names(outdir):
    names = set()
    with open(outdir / "stats.jsonl") as f:
        for line in f:
            names.update(json.loads(line).keys())
    return names


def test_fewshot_cli_runs_igen(tmp_path):
    pkl = _ref_pkl(tmp_path)

    data = _make_layout(tmp_path)
    outdir = tmp_path / "run"

    from invertavatar_tpu.cli.train_inversion import main

    main([
        "--outdir", str(outdir),
        "--data", data,
        "--gen_pkl", str(pkl),
        "--training_state", "fewshot",
        "--batch", "1",
        "--frm_per_vid", "2",
        "--res", "64",
        "--max-steps", "2",
    ])

    assert (outdir / "stats.jsonl").exists(), "driver wrote no stats.jsonl"
    names = _stats_names(outdir)
    assert any(n.startswith("Ireal/") for n in names), names
    # the Igen phase ran from the CLI path (video_loss.py:373-425 parity)
    assert any(n.startswith("Igen/") for n in names), names


def test_oneshot_cli_runs_igen(tmp_path):
    """Driver-launched one-shot stage: 3 steps cover the Ireal (idx 0-1) and
    Igen (idx 2) phases of oneshot_phase_schedule; the CLI's collate supplies
    the z / gen_uv the Igen phase consumes (training_loop_unet_interval.py
    :356-368 parity)."""
    pkl = _ref_pkl(tmp_path)
    data = _make_layout(tmp_path)
    outdir = tmp_path / "run_os"

    from invertavatar_tpu.cli.train_inversion import main

    main([
        "--outdir", str(outdir),
        "--data", data,
        "--gen_pkl", str(pkl),
        "--training_state", "oneshot",
        "--batch", "1",
        "--res", "64",
        "--max-steps", "3",
    ])
    names = _stats_names(outdir)
    assert any(n.startswith("Ireal/") for n in names), names
    assert any(n.startswith("Igen/") for n in names), names


def test_e4e_cli_runs(tmp_path):
    """Driver-launched e4e stage: one step does both Ireal and Igen
    (encoder_inversion/training_loop.py via w_loss.py); losses land in
    stats.jsonl from the CLI path."""
    pkl = _ref_pkl(tmp_path)
    data = _make_layout(tmp_path)
    outdir = tmp_path / "run_e4e"

    from invertavatar_tpu.cli.train_inversion import main

    main([
        "--outdir", str(outdir),
        "--data", data,
        "--gen_pkl", str(pkl),
        "--training_state", "e4e",
        "--batch", "1",
        "--res", "64",
        "--max-steps", "1",
    ])
    names = _stats_names(outdir)
    assert any(n.startswith("Ireal/") for n in names), names
    assert any(n.startswith("Igen/") for n in names), names
