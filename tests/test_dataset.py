"""Dataset contract tests against a synthetic preprocessed layout."""

import json
import os

import numpy as np
import PIL.Image
import pytest

from invertavatar_tpu.data import AvatarDataset, InfiniteSampler, VideoDataset, prefetch_batches

pytestmark = pytest.mark.smoke


@pytest.fixture()
def layout(tmp_path):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images512x512"
    mesh_dir = tmp_path / "orthRender256x256_face_eye"
    uv_dir = tmp_path / "uvRender256x256"
    coeff_dir = tmp_path / "coeffs"
    cams, labels = {}, {}
    for vid in ("vidA", "vidB"):
        for i in range(3):
            fname = f"{vid}/{i:08d}.png"
            for d in (img_dir, mesh_dir, uv_dir, coeff_dir):
                (d / vid).mkdir(parents=True, exist_ok=True)
            PIL.Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(img_dir / fname)
            np.save(mesh_dir / f"{vid}/{i:08d}.npy", rng.rand(256, 256, 4).astype(np.float16))
            np.save(uv_dir / f"{vid}/{i:08d}.npy", rng.rand(256, 256, 3).astype(np.float32))
            PIL.Image.fromarray(rng.randint(0, 255, (256, 256, 3), np.uint8)).save(
                uv_dir / f"{vid}/{i:08d}_uvgttex.png"
            )
            np.save(coeff_dir / f"{vid}/{i:08d}.npy", rng.randn(491).astype(np.float32))
            cams[fname] = rng.randn(25).tolist()
            labels[fname] = rng.randn(25).tolist()
    with open(img_dir / "dataset_realcam.json", "w") as f:
        json.dump({"labels": cams}, f)
    with open(img_dir / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(img_dir), str(mesh_dir), str(coeff_dir)


def test_avatar_dataset(layout):
    img_dir, mesh_dir, coeff_dir = layout
    ds = AvatarDataset(img_dir, mesh_path=mesh_dir, resolution=64, load_uv=True, coeffs_path=coeff_dir)
    assert len(ds) == 6
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["c"].shape == (50,)
    assert item["uvcoords_image"].shape == (256, 256, 3)
    assert set(np.unique(item["uvcoords_image"][..., 2])).issubset({0.0, 1.0})
    assert item["uv"].shape == (256, 256, 6)
    assert item["coeff"].shape == (491,)


def test_video_dataset(layout):
    img_dir, mesh_dir, _ = layout
    ds = VideoDataset(img_dir, mesh_path=mesh_dir, resolution=64, frm_per_vid=2)
    assert ds.num_videos == 2
    clip = ds.sample_clip(0, np.random.RandomState(0))
    assert clip["image"].shape == (2, 64, 64, 3)
    assert clip["uv"].shape == (2, 256, 256, 6)
    assert clip["c"].shape == (2, 50)


def test_infinite_sampler_rank_sharding():
    s0 = InfiniteSampler(10, rank=0, num_replicas=2, seed=1)
    s1 = InfiniteSampler(10, rank=1, num_replicas=2, seed=1)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= i < 10 for i in a + b)
    # deterministic given seed
    assert a == [next(iter(InfiniteSampler(10, 0, 2, seed=1))) for _ in range(1)] + a[1:]


def test_prefetch_batches(layout):
    img_dir, mesh_dir, _ = layout
    ds = AvatarDataset(img_dir, mesh_path=mesh_dir, resolution=64)
    gen = prefetch_batches(ds, InfiniteSampler(len(ds), seed=0), batch_size=2)
    batch = next(gen)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["c"].shape == (2, 50)


def test_preprocess_alignment():
    import PIL.Image
    from invertavatar_tpu.data.preprocess import (
        align_image,
        align_quad,
        smooth_landmark_sequence,
        write_dataset_json,
    )

    rng = np.random.RandomState(0)
    img = PIL.Image.fromarray(rng.randint(0, 255, (256, 256, 3), np.uint8))
    lm5p = np.array([[90, 110], [160, 110], [128, 150], [100, 190], [155, 190]], np.float64)
    quad = align_quad(lm5p)
    assert quad.shape == (4, 2)
    out = align_image(img, lm5p, output_size=64, transform_size=256)
    assert out.size == (64, 64)

    seq = rng.randn(20, 5, 2).cumsum(0)
    sm = smooth_landmark_sequence(seq, sigma=2.0)
    assert sm.shape == seq.shape
    # smoothing reduces frame-to-frame jitter
    assert np.abs(np.diff(sm, axis=0)).mean() < np.abs(np.diff(seq, axis=0)).mean()


def test_write_dataset_json(tmp_path):
    from invertavatar_tpu.data.preprocess import write_dataset_json

    labels = {"vid/0.png": list(range(25))}
    write_dataset_json(str(tmp_path), labels)
    import json as _json

    with open(tmp_path / "dataset_realcam.json") as f:
        assert _json.load(f)["labels"]["vid/0.png"][24] == 24.0
