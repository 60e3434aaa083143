"""CLI end-to-end (VERDICT r2 #9): generate an on-disk EuRoC-format tree
(images + IMU csv + GT csv + YAML settings) and drive the example runners'
main() through it — proving the loaders, settings parsing, IMU interleaving
and trajectory export as ONE path, not just their parsers.

Mirrors the reference's only integration surface: the Examples/ mains over a
dataset directory (Examples/Monocular/mono_euroc_vins.cc:48-235)."""
import os
import sys

import numpy as np
import pytest

import test_vio_e2e as vio
from synthetic import SmoothScene

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.fixture(scope="module")
def euroc_tree(tmp_path_factory):
    """Tiny EuRoC MAV tree: 85 frames @20 fps + 200 Hz IMU + GT."""
    root = tmp_path_factory.mktemp("euroc_synth")
    from PIL import Image

    scene = SmoothScene(seed=11)
    cam_dir = root / "mav0" / "cam0" / "data"
    gt_dir = root / "mav0" / "state_groundtruth_estimate0"
    imu_dir = root / "mav0" / "imu0"
    for d in (cam_dir, gt_dir, imu_dir):
        d.mkdir(parents=True)

    n = 85
    cam_rows, gt_rows, imu_rows = [], ["#ts,px,py,pz,qw,qx,qy,qz"], ["#imu"]
    for i in range(n):
        t = i / vio.FPS
        ns = int(round((10.0 + t) * 1e9))
        R, tt = vio.pose_fn(t)
        img = np.clip(np.asarray(scene.render(R, tt)), 0,
                      255).astype(np.uint8)
        fname = f"{ns}.png"
        Image.fromarray(img).save(str(cam_dir / fname))
        cam_rows.append(f"{ns},{fname}")
        c = -R.T @ tt
        gt_rows.append(f"{ns},{c[0]},{c[1]},{c[2]},1,0,0,0")
        if i > 0:
            for (st, g, a) in vio.synth_imu((i - 1) / vio.FPS, t):
                sns = int(round((10.0 + st) * 1e9))
                imu_rows.append(
                    f"{sns},{g[0]},{g[1]},{g[2]},{a[0]},{a[1]},{a[2]}")
    (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(cam_rows))
    (gt_dir / "data.csv").write_text("\n".join(gt_rows))
    (imu_dir / "data.csv").write_text("\n".join(imu_rows))

    yaml = f"""%YAML:1.0
Camera.fx: {scene.f}
Camera.fy: {scene.f}
Camera.cx: {scene.cx}
Camera.cy: {scene.cy}
Camera.width: {scene.w}
Camera.height: {scene.h}
Camera.fps: 20.0
bUseIMU: 1
test.VINSInitTime: 1.2
Camera.Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.0,
          0.0, 1.0, 0.0, 0.0,
          0.0, 0.0, 1.0, 0.0,
          0.0, 0.0, 0.0, 1.0]
"""
    (root / "settings.yaml").write_text(yaml)
    return root


def _run_example(module, argv):
    sys.path.insert(0, EXAMPLES)
    old = sys.argv
    try:
        import importlib
        mod = importlib.import_module(module)
        sys.argv = [module] + argv
        mod.main()
    finally:
        sys.argv = old
        sys.path.remove(EXAMPLES)


@pytest.mark.slow
def test_mono_euroc_vins_cli(euroc_tree, capsys):
    out = str(euroc_tree / "traj_vi.txt")
    _run_example("mono_euroc_vins",
                 [str(euroc_tree), "--settings",
                  str(euroc_tree / "settings.yaml"), "--out", out,
                  "--eval-ate"])
    text = capsys.readouterr().out
    assert "VINS initialized: True" in text, text
    assert os.path.exists(out)
    rows = [l for l in open(out) if l.strip()]
    assert len(rows) > 65, f"only {len(rows)} trajectory rows"
    assert "ATE RMSE" in text


@pytest.mark.slow
def test_mono_euroc_cli_batched(euroc_tree, capsys):
    """The plain mono runner over the same tree with --batch microbatching
    (and the settings camera), exercising the batched product path from the
    CLI."""
    out = str(euroc_tree / "traj_mono.txt")
    _run_example("mono_euroc",
                 [str(euroc_tree), "--settings",
                  str(euroc_tree / "settings.yaml"), "--out", out,
                  "--eval-ate", "--batch", "8"])
    text = capsys.readouterr().out
    assert os.path.exists(out)
    rows = [l for l in open(out) if l.strip()]
    assert len(rows) > 65, f"only {len(rows)} trajectory rows"
    assert "ATE RMSE" in text
