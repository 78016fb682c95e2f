"""ctypes bindings for the native data-loading core (``native/proben_io.cpp``).

Builds the shared library on first use (g++ + libjpeg, both baked into the
image); falls back gracefully when compilation is impossible — callers check
``native_available()`` and use the cv2 python path otherwise.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libproben_io.so")

FORMAT_CODES = {"BGR": 0, "RGB_FILE": 1, "BGRT": 2, "BGRTTT": 3}
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            text=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        logger.warning("native io build failed: %s", msg)
        return False


def _preload_turbojpeg():
    """Bind to a SIMD libjpeg-turbo if one is bundled in the venv (Pillow
    ships an ABI-62-compatible one): preloading with RTLD_GLOBAL makes the
    dynamic linker resolve our lib's jpeg symbols to the fast implementation
    instead of the system's scalar libjpeg62 (~6x decode speed)."""
    import glob
    import sys

    for sp in sys.path:
        for pat in ("pillow.libs/libjpeg*.so*",):
            hits = glob.glob(os.path.join(sp, pat))
            if hits:
                try:
                    ctypes.CDLL(hits[0], mode=ctypes.RTLD_GLOBAL)
                    logger.info("preloaded turbo jpeg: %s", hits[0])
                    return
                except OSError:
                    pass


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not _build():
            _build_failed = True
            return None
    try:
        _preload_turbojpeg()
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        logger.warning("native io load failed: %s", e)
        _build_failed = True
        return None
    lib.proben_load_batch.restype = ctypes.c_int
    lib.proben_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # thermal paths
        ctypes.POINTER(ctypes.c_char_p),  # rgb paths (or None)
        ctypes.c_int,  # n
        ctypes.c_int,  # format
        ctypes.c_int,  # short_side
        ctypes.c_int,  # max_size
        ctypes.c_int,  # pad_h
        ctypes.c_int,  # pad_w
        ctypes.c_int,  # channels
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,  # threads
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeLoader:
    """Batch image loader: decode + compose + shortest-edge resize + pad into
    a static canvas, threaded in C++."""

    def __init__(
        self,
        input_format: str = "BGR",
        short_side: int = 800,
        max_size: int = 1333,
        pad_shape: Tuple[int, int] = (800, 1024),
        num_threads: int = 8,
    ):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("native io library unavailable")
        self.format = input_format
        self.format_code = FORMAT_CODES["BGR" if input_format in ("BGR", "RGB") else input_format]
        self.channels = {"BGR": 3, "RGB": 3, "BGRT": 4, "BGRTTT": 6}[input_format]
        self.short_side = short_side
        self.max_size = max_size
        self.pad_shape = pad_shape
        self.num_threads = num_threads

    def load_batch(
        self,
        thermal_paths: Sequence[str],
        rgb_paths: Optional[Sequence[str]] = None,
    ):
        """Returns (images (N, H, W, C) float32, sizes (N, 2) int32 resized hw,
        orig (N, 2) int32)."""
        n = len(thermal_paths)
        ph, pw = self.pad_shape
        images = np.zeros((n, ph, pw, self.channels), np.float32)
        sizes = np.zeros((n, 2), np.int32)
        orig = np.zeros((n, 2), np.int32)

        t_arr = (ctypes.c_char_p * n)(*[p.encode() for p in thermal_paths])
        if rgb_paths is not None:
            r_arr = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
        else:
            r_arr = None
        failures = self.lib.proben_load_batch(
            t_arr,
            r_arr,
            n,
            self.format_code,
            self.short_side,
            self.max_size,
            ph,
            pw,
            self.channels,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self.num_threads,
        )
        if failures:
            raise IOError(f"native loader: {failures}/{n} images failed to load")
        return images, sizes, orig
