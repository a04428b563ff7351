"""Native C++ loader: PNG decode + npy parse parity vs PIL/numpy."""

import numpy as np
import PIL.Image
import pytest

from invertavatar_tpu.data import native_loader

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def built():
    if not native_loader.available():
        pytest.skip("native loader could not be built")
    return True


def test_png_batch_decode(built, tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    refs = []
    for i in range(6):
        arr = rng.randint(0, 255, (32, 24, 3), np.uint8)
        p = tmp_path / f"{i}.png"
        PIL.Image.fromarray(arr).save(p)
        paths.append(str(p))
        refs.append(arr)
    out = native_loader.decode_png_batch(paths, 32, 24, 3, threads=4)
    np.testing.assert_array_equal(out, np.stack(refs))


def test_npy_f32_and_f16(built, tmp_path):
    rng = np.random.RandomState(1)
    a32 = rng.randn(7, 5, 3).astype(np.float32)
    a16 = rng.randn(4, 6).astype(np.float16)
    au8 = rng.randint(0, 255, (3, 3), np.uint8)
    np.save(tmp_path / "a32.npy", a32)
    np.save(tmp_path / "a16.npy", a16)
    np.save(tmp_path / "au8.npy", au8)
    np.testing.assert_allclose(native_loader.load_npy_f32(str(tmp_path / "a32.npy")), a32)
    np.testing.assert_allclose(
        native_loader.load_npy_f32(str(tmp_path / "a16.npy")), a16.astype(np.float32)
    )
    np.testing.assert_allclose(native_loader.load_npy_f32(str(tmp_path / "au8.npy")), au8)


def test_npy_batch(built, tmp_path):
    rng = np.random.RandomState(2)
    refs, paths = [], []
    for i in range(5):
        a = rng.randn(8, 8, 4).astype(np.float16)
        np.save(tmp_path / f"b{i}.npy", a)
        refs.append(a.astype(np.float32))
        paths.append(str(tmp_path / f"b{i}.npy"))
    out = native_loader.load_npy_f32_batch(paths, (8, 8, 4), threads=3)
    np.testing.assert_allclose(out, np.stack(refs))
