"""Native loader tests: libpng decode parity with PIL + prefetcher order."""
import numpy as np
import pytest

from ygz_tpu import native


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def pngs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"
        _write_png(str(p), arr)
        paths.append(str(p))
    return paths


def test_native_builds_and_decodes(pngs):
    assert native.available(), "native module failed to build"
    from PIL import Image

    for p in pngs[:3]:
        got = native.decode_gray(p)
        ref = np.asarray(Image.open(p).convert("L"), np.float32)
        np.testing.assert_array_equal(got, ref)


def test_native_decodes_rgb_png(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    _write_png(p, arr)
    got = native.decode_gray(p)
    assert got.shape == (16, 20)
    # libpng uses ITU-R 709 weights (PIL uses 601) — compare against 709
    ref709 = (0.2126 * arr[..., 0] + 0.7152 * arr[..., 1]
              + 0.0722 * arr[..., 2]).astype(np.float32)
    assert np.abs(got - ref709).mean() < 2.0


def test_prefetcher_sequential_and_random(pngs):
    pf = native.FramePrefetcher(pngs, ahead=3, threads=2)
    from PIL import Image

    for i in range(len(pngs)):
        got = pf.get(i)
        ref = np.asarray(Image.open(pngs[i]).convert("L"), np.float32)
        np.testing.assert_array_equal(got, ref)
