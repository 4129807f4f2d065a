"""ctypes bindings for the native (C++) ingest library.

Builds ``native/ingest.cpp`` on demand with g++ (cached under
``native/build/``). The library provides PNG decode and the full per-frame
compile pipeline (bbox -> crop -> bicubic 256 -> seg zeroing -> availability
flags -> bilinear 64) with OpenMP parallelism over frames — the host-side
bottleneck of dataset compile.

If no C++ toolchain is available, ``load()`` returns None and callers fall
back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "ingest.cpp"
_BUILD = _REPO / "native" / "build"
_LIB = _BUILD / "libmmdyn_ingest.so"

_lib = None
_lib_failed = False


def build(force=False) -> Optional[Path]:
    """Compile the shared library if needed; returns its path or None."""
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    _BUILD.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-lz", "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"[mmdyn native] build failed, falling back to PIL: {msg}")
        return None
    return _LIB


def load():
    """Load (building if necessary) the ingest library; None on failure."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    path = build()
    if path is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(str(path))
    lib.mmdyn_decode_png.restype = ctypes.c_int
    lib.mmdyn_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.mmdyn_compile_frame.restype = ctypes.c_int
    lib.mmdyn_compile_frames.restype = ctypes.c_int
    lib.mmdyn_compile_final.restype = ctypes.c_int
    _lib = lib
    return lib


def decode_png(path, max_bytes=256 * 1024 * 1024):
    """Decode a PNG via the native library -> (H, W, C) uint8 array.

    Palette PNGs decode to raw indices (1 channel) to match PIL's behaviour
    on P-mode images (the compile-path parity contract)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    buf = np.empty(32 * 1024 * 1024, np.uint8)
    while True:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = lib.mmdyn_decode_png(
            str(path).encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_longlong(buf.nbytes),
            ctypes.byref(w), ctypes.byref(h))
        if c == -1:  # image larger than the buffer: grow and retry
            assert buf.nbytes < max_bytes, f"PNG too large: {path}"
            buf = np.empty(buf.nbytes * 4, np.uint8)
            continue
        assert c > 0, f"native PNG decode failed for {path}"
        return buf[: w.value * h.value * c].reshape(h.value, w.value, c).copy()


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def compile_frames(seg_paths, vis_paths, tac_paths, crop=True):
    """Batch per-frame compile -> (vis, tac, seg) (N,64,64,3) u8 + avail (N,2).

    ``crop=False`` skips the seg-bbox re-crop (the --no-crop compile variant)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    n = len(seg_paths)
    out_vis = np.empty((n, 64, 64, 3), np.uint8)
    out_tac = np.empty((n, 64, 64, 3), np.uint8)
    out_seg = np.empty((n, 64, 64, 3), np.uint8)
    out_avail = np.empty((n, 2), np.float32)
    failures = lib.mmdyn_compile_frames(
        n, _paths_array(seg_paths), _paths_array(vis_paths),
        _paths_array(tac_paths),
        out_vis.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_tac.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_avail.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(1 if crop else 0))
    assert failures == 0, f"native compile failed on {failures}/{n} frames"
    return out_vis, out_tac, out_seg, out_avail


def compile_final(seg_path, vis_path, tac_path, crop=True):
    """Final-frame targets -> (vis, tac) (64,64,3) uint8."""
    lib = load()
    assert lib is not None, "native library unavailable"
    out_vis = np.empty((64, 64, 3), np.uint8)
    out_tac = np.empty((64, 64, 3), np.uint8)
    rc = lib.mmdyn_compile_final(
        str(seg_path).encode(), str(vis_path).encode(), str(tac_path).encode(),
        out_vis.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_tac.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(1 if crop else 0))
    assert rc == 0, f"native final-frame compile failed ({rc})"
    return out_vis, out_tac


def available() -> bool:
    return load() is not None
