"""Native dataset runtime (C++): PNG grayscale decode + threaded prefetch.

Lazily compiled with g++ on first import (no pip/pybind11 dependency — plain
CPython C API + libpng). Falls back to PIL when the toolchain or libpng is
unavailable; `available()` reports which path is active.
"""
from __future__ import annotations

import os
import subprocess
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "ygz_native.so")
_mod = None
_tried = False


def _build():
    src = os.path.join(_HERE, "loader.cpp")
    inc = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{inc}", src, "-lpng", "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(
                    os.path.join(_HERE, "loader.cpp"))):
            _build()
        import importlib.util

        spec = importlib.util.spec_from_file_location("ygz_native", _SO)
        _mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mod)
    except Exception:
        _mod = None
    return _mod


def available() -> bool:
    return _load() is not None


def decode_gray(path: str) -> np.ndarray:
    """[H,W] float32 grayscale; native libpng when possible, PIL otherwise."""
    m = _load()
    if m is not None and path.lower().endswith(".png"):
        buf, h, w = m.decode_png_gray(path)
        return np.frombuffer(buf, np.uint8).reshape(h, w).astype(np.float32)
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


class FramePrefetcher:
    """Decode-ahead frame reader over a list of PNG paths. Uses the native
    worker pool when available; otherwise decodes synchronously."""

    def __init__(self, paths, ahead: int = 8, threads: int = 2):
        self.paths = list(paths)
        m = _load()
        self._native = None
        if m is not None and all(p.lower().endswith(".png")
                                 for p in self.paths):
            self._native = m.Prefetcher(self.paths, ahead, threads)

    def get(self, i: int) -> np.ndarray:
        if self._native is not None:
            buf, h, w = self._native.get(i)
            return np.frombuffer(buf, np.uint8).reshape(h, w).astype(
                np.float32)
        return decode_gray(self.paths[i])
