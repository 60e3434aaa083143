"""YAML settings compatible with the reference's cv::FileStorage files.

Parses the same keys the reference reads (Tracking ctor
/root/reference/src/Tracking.cc:157-291 and ConfigParam
src/IMU/configparam.cpp:18-86): camera intrinsics/distortion, fps, ORB
extractor parameters, Tracking.CacheFeatures, and the VIO block (bUseIMU,
Camera.Tbc, LocalMapping.LocalWindowSize, test.VINSInitTime). OpenCV-style
"%YAML:1.0" headers and `!!opencv-matrix` tags are tolerated.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..geometry.camera import Camera
from ..frontend.tracker import TrackerConfig


@dataclass
class VioSettings:
    use_imu: bool = False
    Tbc: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    local_window_size: int = 10
    vins_init_time: float = 15.0
    imu_delay_to_image: float = 0.0
    multiply_g: float = 1.0


@dataclass
class Settings:
    camera: Camera
    tracker: TrackerConfig
    vio: VioSettings
    fps: float = 30.0
    rgb_order: int = 1
    th_depth: float = 35.0
    depth_map_factor: float = 1.0
    raw: dict = field(default_factory=dict)


def _clean_yaml(text: str) -> str:
    text = re.sub(r"^%YAML[^\n]*\n", "", text)
    text = text.replace("!!opencv-matrix", "")
    return text


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict) and not {"rows", "cols", "data"} <= set(v):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def load_settings(path_or_text: str) -> Settings:
    import os
    import yaml

    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()
    else:
        text = path_or_text
    data = yaml.safe_load(_clean_yaml(text)) or {}
    flat = _flatten(data)

    def get(key, default=None):
        return flat.get(key, default)

    dist = [get("Camera.k1", 0.0), get("Camera.k2", 0.0),
            get("Camera.p1", 0.0), get("Camera.p2", 0.0),
            get("Camera.k3", 0.0)]
    if get("Camera.bUseDistK6", 0):
        dist += [get("Camera.k4", 0.0), get("Camera.k5", 0.0),
                 get("Camera.k6", 0.0)]
    cam = Camera.make(
        fx=get("Camera.fx", 458.654), fy=get("Camera.fy", 457.296),
        cx=get("Camera.cx", 367.215), cy=get("Camera.cy", 248.375),
        width=int(get("Camera.width", 752)),
        height=int(get("Camera.height", 480)),
        dist=np.array(dist, np.float32),
        bf=get("Camera.bf", 0.0))

    tracker = TrackerConfig(
        n_features=int(get("ORBextractor.nFeatures", 512)),
        n_levels=int(get("ORBextractor.nLevels", 4)),
        scale_factor=float(get("ORBextractor.scaleFactor", 2.0)),
        fast_th=float(get("ORBextractor.iniThFAST", 20)),
        fast_th_min=float(get("ORBextractor.minThFAST", 7)),
        cache_refill_below=int(get("Tracking.CacheFeatures", 150)),
        kf_min_gap=int(get("Tracking.KFMinGap", 3)),
        # reference mMaxFrames = fps: force a keyframe at least once per
        # second of camera time (src/Tracking.cc:257 "mMaxFrames = fps")
        kf_max_gap=int(get("Tracking.KFMaxGap",
                           round(float(get("Camera.fps", 30.0))))),
        keypoint_mode=str(get("ORBextractor.keypointMode", "grid")),
        th_depth=float(get("ThDepth", get("Camera.ThDepth", 35.0))),
    )

    vio = VioSettings(
        use_imu=bool(get("bUseIMU", get("test.bUseIMU", 0))),
        local_window_size=int(get("LocalMapping.LocalWindowSize", 10)),
        vins_init_time=float(get("test.VINSInitTime", 15.0)),
        imu_delay_to_image=float(get("Camera.delaytoimu", 0.0)),
        multiply_g=float(get("IMU.multiplyG", 1.0)),
    )
    tbc = get("Camera.Tbc")
    if isinstance(tbc, dict) and "data" in tbc:
        vio.Tbc = np.array(tbc["data"], np.float32).reshape(4, 4)
    elif isinstance(tbc, (list, tuple)):
        vio.Tbc = np.array(tbc, np.float32).reshape(4, 4)

    return Settings(camera=cam, tracker=tracker, vio=vio,
                    fps=float(get("Camera.fps", 30.0)),
                    rgb_order=int(get("Camera.RGB", 1)),
                    th_depth=float(get("ThDepth", get("Camera.ThDepth", 35.0))),
                    depth_map_factor=float(get("DepthMapFactor", 1.0)),
                    raw=flat)
