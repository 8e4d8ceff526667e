"""ctypes binding for the native image loader (native/imageio.cpp).

`load_image(path, (h, w))` returns float32 RGB HWC in [0, 1]. The C call
releases the GIL, so the SceneLoader's thread pool decodes camera frames on
real cores. Falls back to PIL when the native library can't be built.

Note on numerics: the native resize is plain bilinear; PIL's BILINEAR is an
antialiased triangle filter when downscaling, so resized pixels differ
slightly. The loaders default to PIL for reference-pipeline parity; pass
`backend='native'` (or VFA_TPU_IMAGE_BACKEND=native) for throughput.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "imageio.cpp"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _build():
    _BUILD_DIR.mkdir(exist_ok=True)
    out = _BUILD_DIR / "libvfa_imageio.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    cmd = [os.environ.get("CXX", "g++"), "-O2", "-shared", "-fPIC",
           "-std=c++17", str(_SRC), "-o", str(out), "-ljpeg", "-lpng"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:  # pragma: no cover
        print(f"vfa_tpu.native.imageio: build failed ({e}); using PIL",
              file=sys.stderr)
        return None
    return out


def _get_lib():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        path = _build()
        if path is None:
            _FAILED = True
            return None
        lib = ctypes.CDLL(str(path))
        lib.load_image_resized.restype = ctypes.c_int
        lib.load_image_resized.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.load_image_resized_u8.restype = ctypes.c_int
        lib.load_image_resized_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def load_image_native(path: str, size_hw, out=None) -> np.ndarray:
    """(h, w, 3) float32 in [0,1] (or uint8 [0,255] when `out` is uint8),
    or raises on decode failure.

    `out`: optional preallocated C-contiguous (h, w, 3) slot the decoder
    writes into directly (the SceneLoader batches decode straight into the
    staged batch array — no stack copy). A uint8 `out` selects the
    quantized pipeline: 4x fewer bytes staged host->device, with the [0,1]
    normalization done on-device (also the reference's own semantics —
    PIL resize is uint8 before torchvision's ToTensor divides)."""
    h, w = int(size_hw[0]), int(size_hw[1])
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    if out is None:
        out = np.empty((h, w, 3), np.float32)
    assert out.flags.c_contiguous and out.shape == (h, w, 3)
    if out.dtype == np.uint8:
        rc = lib.load_image_resized_u8(
            path.encode(), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    else:
        assert out.dtype == np.float32
        rc = lib.load_image_resized(
            path.encode(), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"load_image_resized({path}) failed with code {rc}")
    return out


def load_image_pil(path: str, size_hw, out=None) -> np.ndarray:
    from PIL import Image

    h, w = int(size_hw[0]), int(size_hw[1])
    img = Image.open(path).convert("RGB")
    if img.size != (w, h):
        img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, np.uint8)
    if out is None:
        return arr.astype(np.float32) / 255.0
    if out.dtype == np.uint8:  # PIL's resize output IS uint8: plain copy
        out[...] = arr
    else:
        np.multiply(arr, np.float32(1 / 255.0), out=out)
    return out


def load_image(path: str, size_hw, backend: str = "auto", out=None) -> np.ndarray:
    """backend: 'pil' (reference parity), 'native' (fast), or 'auto'
    (VFA_TPU_IMAGE_BACKEND env, default pil)."""
    if backend == "auto":
        backend = os.environ.get("VFA_TPU_IMAGE_BACKEND", "pil")
    if backend == "native" and native_available():
        return load_image_native(path, size_hw, out=out)
    return load_image_pil(path, size_hw, out=out)
