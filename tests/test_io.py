"""IO tests: YAML settings parsing + dataset loaders on fabricated trees."""
import os

import numpy as np
import pytest

from ygz_tpu.io.config import load_settings
from ygz_tpu.io.datasets import EurocDataset, TumRgbdDataset
from ygz_tpu.eval.ate import ate_rmse, associate_timestamps

EUROC_YAML = """%YAML:1.0

Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375

Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 1.76187114e-05

Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.RGB: 1

ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 2.0
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7

Tracking.CacheFeatures: 150

bUseIMU: 1
test.VINSInitTime: 15.0
LocalMapping.LocalWindowSize: 10
Camera.Tbc: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
"""


class TestConfig:
    def test_parse_reference_style_yaml(self):
        s = load_settings(EUROC_YAML)
        assert abs(s.camera.fx - 458.654) < 1e-6
        assert s.camera.width == 752
        assert s.tracker.n_features == 1000
        assert s.tracker.n_levels == 4
        assert s.tracker.fast_th == 20
        assert s.vio.use_imu
        assert s.vio.local_window_size == 10
        assert s.vio.Tbc.shape == (4, 4)
        np.testing.assert_allclose(s.vio.Tbc[3], [0, 0, 0, 1])
        assert abs(s.fps - 20.0) < 1e-9


def _make_png(path, w=8, h=6):
    from PIL import Image

    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (h, w), dtype=np.uint8), "L").save(path)


class TestDatasets:
    def test_euroc_layout(self, tmp_path):
        mav = tmp_path / "mav0"
        (mav / "cam0" / "data").mkdir(parents=True)
        (mav / "imu0").mkdir(parents=True)
        ts = [1403636579763555584, 1403636579813555456]
        with open(mav / "cam0" / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for t in ts:
                f.write(f"{t},{t}.png\n")
                _make_png(mav / "cam0" / "data" / f"{t}.png")
        with open(mav / "imu0" / "data.csv", "w") as f:
            f.write("#timestamp,...\n")
            for i in range(20):
                t = ts[0] - 10 * 5000000 + i * 5000000
                f.write(f"{t},0.1,0.2,0.3,9.8,0.0,0.1\n")

        ds = EurocDataset(str(tmp_path), with_imu=True)
        assert len(ds) == 2
        f0, f1 = ds.frames
        assert abs(f0.t - ts[0] * 1e-9) < 1e-9
        assert len(f0.imu) == 11  # samples with t <= frame0
        assert len(f1.imu) == 9
        img = f0.load()
        assert img.shape == (6, 8) and img.dtype == np.float32

    def test_tum_association(self, tmp_path):
        for name, stamps in [("rgb", [1.00, 1.05, 1.10]),
                             ("depth", [1.004, 1.052, 1.40])]:
            d = tmp_path / name
            d.mkdir()
            with open(tmp_path / f"{name}.txt", "w") as f:
                f.write("# ts path\n")
                for t in stamps:
                    p = f"{name}/{t:.4f}.png"
                    f.write(f"{t} {p}\n")
                    _make_png(tmp_path / p)
        ds = TumRgbdDataset(str(tmp_path))
        assert len(ds) == 2  # third rgb has no depth within 0.02s
        assert ds.frames[0].depth_path.endswith("1.0040.png")


class TestAte:
    def test_associate(self):
        a = [0.0, 0.1, 0.2]
        b = [0.001, 0.099, 0.5]
        pairs = associate_timestamps(a, b)
        assert pairs.tolist() == [[0, 0], [1, 1]]

    def test_ate_scale_alignment(self):
        rng = np.random.default_rng(0)
        gt = rng.standard_normal((50, 3))
        R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        est = (0.5 * (R.T @ (gt - [1, 2, 3]).T)).T
        rmse, _ = ate_rmse(est, gt, with_scale=True)
        assert rmse < 1e-6
