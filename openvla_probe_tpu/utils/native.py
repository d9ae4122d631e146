"""ctypes bindings for the C++ host-runtime kernels (native/ovla_native.cpp).

Auto-builds the shared library on first use when a compiler is present;
every entry point has a pure-numpy fallback so the framework never hard-fails
without the native lib.
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libovla_native.so"
_PIL_PRECISION_BITS = 22


@functools.lru_cache(maxsize=1)
def _load_lib() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.resample_u8_exact.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.pad_stack_i64.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.stack_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int64, ctypes.c_void_p,
    ]
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _quantized_weights(in_size: int, out_size: int, method: str) -> np.ndarray:
    from ..ops.image import resample_weights

    w = resample_weights(in_size, out_size, method, quantize=True)
    q = np.asarray(w, np.float64) * (1 << _PIL_PRECISION_BITS)
    return np.where(q < 0, np.ceil(q - 0.5), np.floor(q + 0.5)).astype(np.int32)


def resample_u8_exact(image: np.ndarray, out_hw, method: str = "bicubic") -> np.ndarray:
    """Pillow-bit-exact uint8 resize via the C++ fixed-point path
    (falls back to ops.image.pil_resize_exact)."""
    lib = _load_lib()
    image = np.ascontiguousarray(image, np.uint8)
    ih, iw, c = image.shape
    oh, ow = out_hw
    if lib is None:
        from ..ops.image import pil_resize_exact

        return pil_resize_exact(image, (oh, ow), method)
    wq_h = np.ascontiguousarray(_quantized_weights(iw, ow, method))
    wq_v = np.ascontiguousarray(_quantized_weights(ih, oh, method))
    dst = np.empty((oh, ow, c), np.uint8)
    tmp = np.empty((ih, ow, c), np.uint8)
    lib.resample_u8_exact(
        image.ctypes.data, ih, iw, c, dst.ctypes.data, oh, ow,
        wq_h.ctypes.data, wq_v.ctypes.data, tmp.ctypes.data, _PIL_PRECISION_BITS,
    )
    return dst


def pad_stack_i64(rows: Sequence[np.ndarray], length: int, fill: int) -> np.ndarray:
    lib = _load_lib()
    rows = [np.ascontiguousarray(r, np.int64) for r in rows]
    if lib is None:
        out = np.full((len(rows), length), fill, np.int64)
        for i, r in enumerate(rows):
            m = min(len(r), length)
            out[i, :m] = r[:m]
        return out
    n = len(rows)
    ptrs = (ctypes.c_void_p * n)(*[r.ctypes.data for r in rows])
    lens = np.asarray([len(r) for r in rows], np.int64)
    out = np.empty((n, length), np.int64)
    lib.pad_stack_i64(ptrs, lens.ctypes.data, n, length, fill, out.ctypes.data)
    return out


def stack_u8(images: Sequence[np.ndarray]) -> np.ndarray:
    lib = _load_lib()
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    if lib is None:
        return np.stack(images)
    n = len(images)
    shape = images[0].shape
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in images])
    out = np.empty((n, *shape), np.uint8)
    lib.stack_u8(ptrs, n, images[0].nbytes, out.ctypes.data)
    return out
