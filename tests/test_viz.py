"""Smoke tests for the offline viewer (FrameDrawer/MapDrawer equivalents)."""
import numpy as np

from ygz_tpu import viz
from ygz_tpu.backend.mapstate import SlamMap


def test_draw_tracked_frame_overlay():
    img = np.random.default_rng(0).uniform(0, 255, (120, 160)).astype(
        np.float32)
    uv = np.array([[20.0, 30.0], [80.0, 60.0], [150.0, 110.0]])
    tracked = np.array([True, False, True])
    rgb = viz.draw_tracked_frame(img, uv, tracked, state="OK")
    assert rgb.shape == (136, 160, 3) and rgb.dtype == np.uint8
    # green square stamped around the first tracked point
    assert (rgb[27, 17:24] == viz.GREEN).all()
    # red square around the untracked one
    assert (rgb[57, 77:84] == viz.RED).all()


def test_draw_map_and_dump_viewer(tmp_path):
    smap = SlamMap(max_kf=4, max_pt=64, max_feat=8)
    feats = {"uv": np.zeros((1, 2), np.float32),
             "level": np.zeros(1, np.int32),
             "angle": np.zeros(1, np.float32),
             "desc": np.zeros((1, 256), np.uint8),
             "valid": np.zeros(1, bool)}
    for k in range(3):
        t = np.array([0.1 * k, 0.0, 0.0], np.float32)
        smap.add_keyframe(np.eye(3, dtype=np.float32), t, feats)
        if k:
            smap.kf_parent[k] = k - 1
    ids = smap.alloc_points(20)
    smap.pt_xyz[ids] = np.random.default_rng(1).normal(
        size=(20, 3)).astype(np.float32) + [0, 0, 5]
    smap.pt_valid[ids] = True

    out = tmp_path / "map.png"
    viz.draw_map(smap, path=str(out))
    assert out.exists() and out.stat().st_size > 1000

    frame_png = tmp_path / "f.png"
    viz.save_png(viz.draw_tracked_frame(
        np.zeros((60, 80), np.float32), np.zeros((0, 2))), str(frame_png))
    assert frame_png.exists()
